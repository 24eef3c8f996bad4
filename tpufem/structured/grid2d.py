"""2D structured-grid (right-diagonal P1 triangulation) fast path.

Matches ``tpufem.mesh.generate.rectangle(nx, ny, diagonal="right")``:
nodes on an (ny+1, nx+1) lattice (row-major, x fastest), each cell split
into lower (v00, v10, v11) and upper (v00, v11, v01) triangles. All
lower cells are congruent and all upper cells are congruent, so the
geometry map is two compile-time constants; dof movement is shifted
slices; accumulation is static slice-adds — zero gathers end to end.

LAYOUT: SoA with the lattice in the two minor axes — displacement is
(bs, ny+1, nx+1), per-cell blocks are (3, bs, ny, nx) — so the large
dimensions occupy the TPU's (sublane, lane) tiling; an
(ny, nx, 3, bs)-style layout wastes 122/128 lanes (see
tpufem.assemble.scatter for the measurement).

The element kernels are jax.grad / jax.hessian / jax.jvp of the same
energy density as the unstructured path; results match it to roundoff.
``flatten``/``unflatten`` convert to/from the unstructured byVDIM dof
vector for cross-validation.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

# vertex lattice offsets (dy, dx) per orientation, in element dof order
_LOWER = ((0, 0), (0, 1), (1, 1))  # v00, v10, v11
_UPPER = ((0, 0), (1, 1), (1, 0))  # v00, v11, v01


def _tri_geometry(hx: float, hy: float, orientation: str) -> np.ndarray:
    if orientation == "lower":
        return np.array([[0.0, 0.0], [hx, 0.0], [hx, hy]])
    return np.array([[0.0, 0.0], [hx, hy], [0.0, hy]])


@dataclasses.dataclass
class StructuredGrid2D:
    """Gather-free assembly for a 2D lattice triangulation.

    ``energy_density(grad_u, coeffs)`` → scalar energy density;
    ``coeffs`` maps declared field names to centroid values. Fields:
    - 'vertex': (ny+1, nx+1) nodal (P1 value at centroid = vertex mean),
    - 'cell': (2, ny, nx) per (orientation, cell).
    1-point (centroid) quadrature — the reference's stiffness-term rule
    (asym_ufl.py:78-79).
    """

    nx: int
    ny: int
    hx: float
    hy: float
    bs: int
    energy_density: Callable
    field_kinds: Dict[str, str]  # name -> 'vertex' | 'cell'

    def __post_init__(self):
        dN_ref = np.array([[-1.0, -1.0], [1.0, 0.0], [0.0, 1.0]])
        for tag, orientation in (("lo", "lower"), ("up", "upper")):
            x_e = _tri_geometry(self.hx, self.hy, orientation)
            J = x_e.T @ dN_ref
            setattr(self, f"_dN_{tag}", dN_ref @ np.linalg.inv(J))
            setattr(self, f"_w_{tag}", 0.5 * abs(np.linalg.det(J)))

    # -- shape helpers ---------------------------------------------------------

    def flatten(self, u_grid) -> jnp.ndarray:
        """(bs, ny+1, nx+1) → byVDIM flat dof vector (matches the
        unstructured numbering of generate.rectangle)."""
        return jnp.moveaxis(u_grid, 0, -1).reshape(-1)

    def unflatten(self, u_flat) -> jnp.ndarray:
        """byVDIM flat vector → (bs, ny+1, nx+1)."""
        g = u_flat.reshape(self.ny + 1, self.nx + 1, self.bs)
        return jnp.moveaxis(g, -1, 0)

    def vertex_grid(self, v_flat) -> jnp.ndarray:
        """Scalar nodal vector → (ny+1, nx+1)."""
        return v_flat.reshape(self.ny + 1, self.nx + 1)

    # -- data movement (all static slices) -------------------------------------

    def _slices(self, arr, offsets):
        """Shifted (..., ny, nx) views of a (..., ny+1, nx+1) field."""
        ny, nx = self.ny, self.nx
        return [
            arr[..., dy : dy + ny, dx : dx + nx] for (dy, dx) in offsets
        ]

    def _cell_energy(self, orientation: str):
        dN = jnp.asarray(getattr(self, f"_dN_{orientation[:2]}"))
        w = getattr(self, f"_w_{orientation[:2]}")
        density = self.energy_density

        def energy(u_e, coeffs):
            # u_e: (3, bs) element dofs
            grad_u = u_e.T @ dN.astype(u_e.dtype)  # (bs, 2)
            return density(grad_u, coeffs) * w

        return energy

    def _coeffs_at_cells(self, fields, orientation_idx, offsets):
        out = {}
        for name, kind in self.field_kinds.items():
            f = fields[name]
            if kind == "vertex":
                out[name] = sum(self._slices(f, offsets)) / 3.0
            else:
                out[name] = f[orientation_idx]
        return out

    def _scatter_add(self, r, contrib, offsets):
        """r (bs, ny+1, nx+1) += contrib (3, bs, ny, nx) at the vertex
        offsets — static slice-adds."""
        ny, nx = self.ny, self.nx
        for k, (dy, dx) in enumerate(offsets):
            r = r.at[:, dy : dy + ny, dx : dx + nx].add(contrib[k])
        return r

    def _per_cell(self, fn, u, fields, orientation_idx, orientation, offsets):
        """vmap fn(u_e (3,bs), coeffs) over the cell lattice (minor axes)."""
        u_cells = jnp.stack(self._slices(u, offsets))  # (3, bs, ny, nx)
        coeffs = self._coeffs_at_cells(fields, orientation_idx, offsets)
        v = jax.vmap(jax.vmap(fn, in_axes=(-1, -1), out_axes=-1),
                     in_axes=(-1, -1), out_axes=-1)
        with jax.default_matmul_precision("float32"):
            return v(u_cells, coeffs)

    # -- assembled quantities ---------------------------------------------------

    def residual(self, u, fields):
        """F(u): (bs, ny+1, nx+1), gather-free."""
        r = jnp.zeros_like(u)
        for oi, (orientation, offsets) in enumerate(
            (("lower", _LOWER), ("upper", _UPPER))
        ):
            g = jax.grad(self._cell_energy(orientation))
            ev = self._per_cell(g, u, fields, oi, orientation, offsets)
            r = self._scatter_add(r, ev, offsets)
        return r

    def load_residual(self, f):
        """Constant −∫f·u contribution (total residual = residual −
        load_residual), 1-pt rule."""
        r = jnp.zeros_like(f)
        for orientation, offsets in (("lower", _LOWER), ("upper", _UPPER)):
            w = getattr(self, f"_w_{orientation[:2]}")
            f_c = sum(self._slices(f, offsets)) / 3.0  # (bs, ny, nx)
            contrib = jnp.broadcast_to(
                (w / 3.0) * f_c[None], (3,) + f_c.shape
            )
            r = self._scatter_add(r, contrib, offsets)
        return r

    def tangent_action(self, u, fields, v):
        """Matrix-free J(u)·v — jvp of the gather-free residual."""
        return jax.jvp(lambda w: self.residual(w, fields), (u,), (v,))[1]

    def diagonal(self, u, fields):
        """Jacobian diagonal for Jacobi/Chebyshev preconditioning."""
        d = jnp.zeros_like(u)
        for oi, (orientation, offsets) in enumerate(
            (("lower", _LOWER), ("upper", _UPPER))
        ):
            h = jax.hessian(self._cell_energy(orientation))
            em = self._per_cell(h, u, fields, oi, orientation, offsets)
            # em: (3, bs, 3, bs, ny, nx) → diag (3, bs, ny, nx)
            # diagonal over the vertex axes (0,2) → (bs, bs, ny, nx, 3);
            # then over the two bs axes → (ny, nx, 3, bs)
            ed = jnp.diagonal(
                jnp.diagonal(em, axis1=0, axis2=2), axis1=0, axis2=1
            )
            ed = jnp.moveaxis(ed, (2, 3), (0, 1))  # (3, bs, ny, nx)
            d = self._scatter_add(d, ed, offsets)
        return d

    def energy(self, u, fields) -> jnp.ndarray:
        """Total stored energy Π(u)."""
        total = jnp.zeros((), dtype=u.dtype)
        for oi, (orientation, offsets) in enumerate(
            (("lower", _LOWER), ("upper", _UPPER))
        ):
            e = self._per_cell(
                self._cell_energy(orientation), u, fields, oi,
                orientation, offsets,
            )
            total = total + jnp.sum(e)
        return total
