"""3D structured-grid (Q1 hex lattice) fast path.

Matches ``tpufem.mesh.generate.box(nx, ny, nz, cell_type=hexahedron)``:
nodes on an (nz+1, ny+1, nx+1) lattice (x fastest), one trilinear hex
per lattice cell. Axis-aligned boxes make the geometry map affine
(J = diag(hx, hy, hz)), so the physical shape-function gradients at the
2×2×2 Gauss points are compile-time constants; dof movement is shifted
slices and accumulation static slice-adds — zero gathers, the same
design as grid2d.

This is the BASELINE config-3 path (3D elasticity, matrix-free
Chebyshev/Jacobi CG, 10M-DoF-class). ``tpufem.structured.solve.
make_grid_solver`` works unchanged on this grid (it is shape-agnostic).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict

import jax
import jax.numpy as jnp
import numpy as np

from tpufem.elements.lagrange import element as make_element
from tpufem.elements.quadrature import quadrature
from tpufem.mesh.mesh import CellType

# vertex lattice offsets (dz, dy, dx) in tensor dof order (x fastest) —
# matches CELL_INFO[hexahedron] / generate.box
_CORNERS = tuple(
    (dz, dy, dx) for dz in (0, 1) for dy in (0, 1) for dx in (0, 1)
)


@dataclasses.dataclass
class StructuredGrid3D:
    """Gather-free assembly for a Q1 hex lattice.

    ``energy_density(grad_u, coeffs)`` → scalar; fields are 'vertex'
    ((nz+1, ny+1, nx+1)) or 'cell' ((nz, ny, nx)). 2×2×2 Gauss
    quadrature (exact for Q1 stiffness on affine boxes). Displacement is
    (bs, nz+1, ny+1, nx+1), bs = 3.
    """

    nx: int
    ny: int
    nz: int
    hx: float
    hy: float
    hz: float
    bs: int
    energy_density: Callable
    field_kinds: Dict[str, str]

    def __post_init__(self):
        el = make_element(CellType.hexahedron, 1)
        qpts, qwts = quadrature(CellType.hexahedron, 2)  # 2x2x2
        dN_ref = el.tabulate_grad(qpts)  # (8, 8, 3) [q, dof, dim]
        N_ref = el.tabulate(qpts)  # (8, 8)
        Jinv = np.diag([1.0 / self.hx, 1.0 / self.hy, 1.0 / self.hz])
        detJ = self.hx * self.hy * self.hz
        self._dN = (dN_ref @ Jinv).astype(np.float64)  # (q, dof, dim)
        self._N = N_ref.astype(np.float64)
        self._w = (qwts * detJ).astype(np.float64)
        self._nq = len(qwts)

    # -- shape helpers ----------------------------------------------------------

    def flatten(self, u_grid) -> jnp.ndarray:
        """(bs, nz+1, ny+1, nx+1) → byVDIM flat vector (box() numbering)."""
        return jnp.moveaxis(u_grid, 0, -1).reshape(-1)

    def unflatten(self, u_flat) -> jnp.ndarray:
        g = u_flat.reshape(self.nz + 1, self.ny + 1, self.nx + 1, self.bs)
        return jnp.moveaxis(g, -1, 0)

    def vertex_grid(self, v_flat) -> jnp.ndarray:
        return v_flat.reshape(self.nz + 1, self.ny + 1, self.nx + 1)

    # -- data movement ------------------------------------------------------------

    def _slices(self, arr):
        nz, ny, nx = self.nz, self.ny, self.nx
        return [
            arr[..., dz : dz + nz, dy : dy + ny, dx : dx + nx]
            for (dz, dy, dx) in _CORNERS
        ]

    def _cell_energy_with_coeffs(self):
        """energy(u_e (8,bs), coeff_stacks dict) where vertex coefficient
        stacks are (8,) per-cell corner values interpolated at each qp."""
        dN = self._dN
        N = self._N
        w = self._w
        nq = self._nq
        density = self.energy_density
        kinds = self.field_kinds

        def energy(u_e, coeffs):
            total = jnp.zeros((), dtype=u_e.dtype)
            for q in range(nq):
                grad_u = u_e.T @ jnp.asarray(dN[q], dtype=u_e.dtype)
                cq = {}
                for name, val in coeffs.items():
                    if kinds[name] == "vertex":
                        cq[name] = jnp.asarray(N[q], dtype=u_e.dtype) @ val
                    else:
                        cq[name] = val
                total = total + density(grad_u, cq) * jnp.asarray(
                    w[q], dtype=u_e.dtype
                )
            return total

        return energy

    def _gather(self, u, fields):
        u_cells = jnp.stack(self._slices(u))  # (8, bs, nz, ny, nx)
        coeffs = {}
        for name, kind in self.field_kinds.items():
            f = fields[name]
            if kind == "vertex":
                coeffs[name] = jnp.stack(self._slices(f))  # (8, nz, ny, nx)
            else:
                coeffs[name] = f
        return u_cells, coeffs

    def _vmap3(self, fn):
        v = fn
        for _ in range(3):
            v = jax.vmap(v, in_axes=(-1, -1), out_axes=-1)
        return v

    def _scatter_add(self, r, contrib):
        nz, ny, nx = self.nz, self.ny, self.nx
        for k, (dz, dy, dx) in enumerate(_CORNERS):
            r = r.at[
                :, dz : dz + nz, dy : dy + ny, dx : dx + nx
            ].add(contrib[k])
        return r

    # -- assembled quantities --------------------------------------------------

    def residual(self, u, fields):
        energy = self._cell_energy_with_coeffs()
        u_cells, coeffs = self._gather(u, fields)
        g = self._vmap3(jax.grad(energy))
        with jax.default_matmul_precision("float32"):
            ev = g(u_cells, coeffs)  # (8, bs, nz, ny, nx)
        return self._scatter_add(jnp.zeros_like(u), ev)

    def tangent_action(self, u, fields, v):
        return jax.jvp(lambda w: self.residual(w, fields), (u,), (v,))[1]

    def diagonal(self, u, fields):
        """Jacobian diagonal. Computed one element-dof at a time via
        jvp-of-grad: materializing the full (8,bs,8,bs,cells) element
        Hessian needs ~8 GB at 10M DoF and OOMs; each directional column
        is only (8, bs, cells)."""
        energy = self._cell_energy_with_coeffs()
        u_cells, coeffs = self._gather(u, fields)
        g = jax.grad(energy)
        d = jnp.zeros_like(u)
        nz, ny, nx = self.nz, self.ny, self.nx
        for k in range(8):
            dz, dy, dx = _CORNERS[k]
            for c in range(self.bs):
                e_dir = jnp.zeros((8, self.bs), dtype=u.dtype)
                e_dir = e_dir.at[k, c].set(1.0)

                def col(u_e, coeff_e):
                    return jax.jvp(
                        lambda w: g(w, coeff_e), (u_e,),
                        (e_dir.astype(u_e.dtype),),
                    )[1][k, c]

                with jax.default_matmul_precision("float32"):
                    dk = self._vmap3(col)(u_cells, coeffs)  # (nz, ny, nx)
                d = d.at[
                    c, dz : dz + nz, dy : dy + ny, dx : dx + nx
                ].add(dk)
        return d

    def load_residual(self, f):
        """−∫ f·u with f trilinear (vertex field), 2×2×2 rule."""
        N = self._N
        w = self._w
        f_cells = jnp.stack(self._slices(f))  # (8, bs, nz, ny, nx)
        r = jnp.zeros_like(f)
        # ∂/∂u_k of -Σ_q w_q (N_q·f)(N_q·u) = -Σ_q w_q N_q[k] (N_q·f)
        contrib = jnp.zeros_like(f_cells)
        for q in range(self._nq):
            Nq = jnp.asarray(N[q], dtype=f.dtype)
            f_q = jnp.einsum("k,kbzyx->bzyx", Nq, f_cells)
            contrib = contrib + jnp.asarray(w[q], f.dtype) * jnp.einsum(
                "k,bzyx->kbzyx", Nq, f_q
            )
        return self._scatter_add(r, contrib)

    def energy(self, u, fields):
        energy = self._cell_energy_with_coeffs()
        u_cells, coeffs = self._gather(u, fields)
        e = self._vmap3(energy)
        with jax.default_matmul_precision("float32"):
            return jnp.sum(e(u_cells, coeffs))
