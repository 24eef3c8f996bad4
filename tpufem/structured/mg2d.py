"""Geometric multigrid preconditioner for the 2D structured fast path.

The lattice analog of the reference's BoomerAMG role (FEniCSx/mechanic2d/
asym_elasto_damage_model.cc:720-813): on a structured triangulation the
multigrid hierarchy is *geometric* — coarse level = the same
StructuredGrid2D at half resolution with coarsened coefficient fields —
so every transfer operator is a static slice stencil (prolongation =
linear interpolation on the triangulated lattice, restriction = its
exact transpose) and the whole V-cycle is gather-free XLA, fusing into
the existing chunked CG.

P1 spaces on the uniformly-refined lattice are nested, so the
rediscretized coarse operator equals the Galerkin product for
piecewise-constant coefficients; coefficient fields are coarsened by
vertex injection / 2x2 cell averaging (a standard geometric-MG
approximation — fine as a preconditioner).

Smoother: Chebyshev-Jacobi (fixed polynomial, symmetric => the V-cycle
stays SPD for CG). Coarsest level: dense inverse materialized at setup.
Setup is host-orchestrated but every step is a jitted device call; the
level data is a NamedTuple pytree passed as an *argument* to the solver
(remote-TPU constants rematerialize; tpufem.utils.pytree).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tpufem.la.precond import chebyshev_iterate
from tpufem.structured.grid2d import StructuredGrid2D


class MGLevel(NamedTuple):
    u_lin: jnp.ndarray  # (bs, ny+1, nx+1) linearization state
    fields: Dict[str, jnp.ndarray]
    free: jnp.ndarray  # (bs, ny+1, nx+1) 1.0 on unknowns
    inv_d: jnp.ndarray  # 1/diag of the constrained operator
    lmax: jnp.ndarray  # () lambda_max(D^-1 A) estimate


class MGData(NamedTuple):
    levels: Tuple[MGLevel, ...]
    coarse_inv: jnp.ndarray  # (nc, nc) dense inverse of coarsest operator
    # coarsest-level free mask: restricted residuals MUST be masked off
    # the coarse Dirichlet rows — those rows are identity at scale 1
    # while the free rows carry the E-scale, so unmasked residual there
    # turns into O(1) spurious corrections against an O(E) operator
    coarse_free: jnp.ndarray


# -- transfer operators (static slice stencils) -------------------------------


def prolong(c: jnp.ndarray) -> jnp.ndarray:
    """Linear interpolation on the right-diagonal triangulated lattice:
    coarse (..., nyc+1, nxc+1) -> fine (..., 2nyc+1, 2nxc+1). Edge
    midpoints average their two endpoints; the diagonal midpoint
    (2i+1, 2j+1) averages coarse (i, j) and (i+1, j+1) (the P1 hat
    functions of the nested coarse triangulation)."""
    nyc = c.shape[-2] - 1
    nxc = c.shape[-1] - 1
    f = jnp.zeros(c.shape[:-2] + (2 * nyc + 1, 2 * nxc + 1), c.dtype)
    f = f.at[..., ::2, ::2].set(c)
    f = f.at[..., ::2, 1::2].set(0.5 * (c[..., :, :-1] + c[..., :, 1:]))
    f = f.at[..., 1::2, ::2].set(0.5 * (c[..., :-1, :] + c[..., 1:, :]))
    f = f.at[..., 1::2, 1::2].set(
        0.5 * (c[..., :-1, :-1] + c[..., 1:, 1:])
    )
    return f


def restrict(rf: jnp.ndarray) -> jnp.ndarray:
    """Exact transpose of ``prolong`` (so the coarse-grid correction is
    a Galerkin projection): fine (..., 2nyc+1, 2nxc+1) -> coarse."""
    nyc = (rf.shape[-2] - 1) // 2
    nxc = (rf.shape[-1] - 1) // 2
    pad = [(0, 0)] * (rf.ndim - 2) + [(1, 1), (1, 1)]
    p = jnp.pad(rf, pad)

    def s(dy, dx):
        return p[..., 1 + dy : 2 + dy + 2 * nyc : 2,
                 1 + dx : 2 + dx + 2 * nxc : 2]

    return s(0, 0) + 0.5 * (
        s(0, 1) + s(0, -1) + s(1, 0) + s(-1, 0) + s(1, 1) + s(-1, -1)
    )


def _inject(f: jnp.ndarray) -> jnp.ndarray:
    return f[..., ::2, ::2]


def _coarsen_cell_field(f: jnp.ndarray) -> jnp.ndarray:
    """(2, ny, nx) per-orientation cell field -> 2x2 block mean."""
    o, ny, nx = f.shape
    return f.reshape(o, ny // 2, 2, nx // 2, 2).mean(axis=(2, 4))


def coarsen_grid(grid: StructuredGrid2D) -> StructuredGrid2D:
    return StructuredGrid2D(
        nx=grid.nx // 2, ny=grid.ny // 2,
        hx=grid.hx * 2, hy=grid.hy * 2, bs=grid.bs,
        energy_density=grid.energy_density,
        field_kinds=grid.field_kinds,
    )


def _coarsen_fields(grid: StructuredGrid2D, fields):
    out = {}
    for name, kind in grid.field_kinds.items():
        f = fields[name]
        out[name] = _inject(f) if kind == "vertex" else _coarsen_cell_field(f)
    return out


# -- setup --------------------------------------------------------------------


def _constrained_action(grid, L_u, L_fields, L_free):
    def A(v):
        av = grid.tangent_action(L_u, L_fields, v * L_free)
        return av * L_free + v * (1.0 - L_free)

    return A


def build_mg2d(
    grid: StructuredGrid2D,
    u_lin: jnp.ndarray,
    fields: Dict[str, jnp.ndarray],
    free: jnp.ndarray,
    *,
    coarse_dofs: int = 1500,
    max_levels: int = 16,
    power_iters: int = 15,
) -> Tuple[Tuple[StructuredGrid2D, ...], MGData]:
    """Build the hierarchy at the current linearization state.

    Coarsens while nx, ny stay even and the level is above
    ``coarse_dofs``; the coarsest operator is materialized dense (host
    pinv, so Dirichlet identity rows and any semi-definiteness are
    safe).
    """

    def make_level_data(g):
        # closure over g (python scalars + the energy callable) is safe;
        # all arrays are jit arguments
        @jax.jit
        def level_data(u, flds, fr):
            d = g.diagonal(u, flds)
            d = d * fr + (1.0 - fr)
            inv_d = jnp.where(d != 0, 1.0 / jnp.where(d == 0, 1.0, d), 1.0)
            A = _constrained_action(g, u, flds, fr)
            v0 = jnp.where(
                (jnp.arange(d.size) % 2 == 0), 1.0, -1.0
            ).astype(d.dtype).reshape(d.shape) * fr
            v0 = v0 / jnp.sqrt(jnp.vdot(v0, v0))

            def body(_, v):
                w = inv_d * A(v)
                return w / jnp.sqrt(jnp.vdot(w, w))

            v = jax.lax.fori_loop(0, power_iters, body, v0)
            w = inv_d * A(v)
            lmax = jnp.vdot(v, w) / jnp.vdot(v, v)
            return inv_d, lmax

        return level_data

    grids = [grid]
    levels = []
    g, u, flds, fr = grid, u_lin, fields, free
    while (
        len(grids) < max_levels
        and g.nx % 2 == 0 and g.ny % 2 == 0
        and g.nx >= 8 and g.ny >= 8
        and u.size > coarse_dofs
    ):
        inv_d, lmax = make_level_data(g)(u, flds, fr)
        levels.append(
            MGLevel(u_lin=u, fields=flds, free=fr, inv_d=inv_d, lmax=lmax)
        )
        flds = _coarsen_fields(g, flds)
        u = _inject(u)
        fr = _inject(fr)
        g = coarsen_grid(g)
        grids.append(g)

    # dense coarse inverse (host pinv; nc is small by construction)
    shape = u.shape
    nc = u.size
    A = _constrained_action(g, u, flds, fr)

    @jax.jit
    def col(e):
        return A(e.reshape(shape)).ravel()

    cols = jax.lax.map(col, jnp.eye(nc, dtype=u.dtype), batch_size=256)
    Ad = np.asarray(cols).T
    coarse_inv = jnp.asarray(
        np.linalg.pinv(Ad, rcond=1e-12).astype(np.asarray(u).dtype)
    )
    return tuple(grids), MGData(
        levels=tuple(levels), coarse_inv=coarse_inv, coarse_free=fr
    )


# -- apply ---------------------------------------------------------------------


def vcycle(grids, data: MGData, b: jnp.ndarray, *, degree: int = 3,
           lmin_ratio: float = 1.0 / 8.0, matvecs=None) -> jnp.ndarray:
    """One symmetric V(degree,degree)-cycle; pure jnp, unrolled levels.

    ``grids`` is the static tuple from build_mg2d (scalars + the energy
    callable only — safe to close over); ``data`` carries all arrays and
    must be passed as a traced argument. ``matvecs``: optional per-level
    raw linear operators overriding the XLA jvp stencil (see mg3d)."""

    def level(l, b):
        if l == len(data.levels):
            return (data.coarse_inv @ b.ravel()).reshape(b.shape)
        L = data.levels[l]
        if matvecs is not None and l < len(matvecs) and matvecs[l] is not None:
            raw = matvecs[l]

            def A(v, raw=raw, L=L):
                return raw(v * L.free) * L.free + v * (1.0 - L.free)
        else:
            A = _constrained_action(grids[l], L.u_lin, L.fields, L.free)
        kw = dict(degree=degree, lmin_ratio=lmin_ratio)
        x = chebyshev_iterate(
            A, L.inv_d, L.lmax, b, jnp.zeros_like(b), **kw
        )
        res = (b - A(x)) * L.free
        next_free = (
            data.levels[l + 1].free
            if l + 1 < len(data.levels)
            else data.coarse_free
        )
        bc = restrict(res) * next_free
        xc = level(l + 1, bc)
        x = x + prolong(xc) * L.free
        return chebyshev_iterate(A, L.inv_d, L.lmax, b, x, **kw)

    return level(0, b)


def mg_preconditioner(grids, *, degree: int = 3,
                      lmin_ratio: float = 1.0 / 8.0) -> Callable:
    """(data, r) -> z; partial-apply data at the call site so it stays a
    traced argument."""

    def M(data, r):
        return vcycle(grids, data, r, degree=degree, lmin_ratio=lmin_ratio)

    return M
