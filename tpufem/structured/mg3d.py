"""Geometric multigrid for the 3D structured (Q1 hex lattice) path.

Same design as structured.mg2d (see there for the BoomerAMG-role
citation and the coarse-Dirichlet masking rationale): Q1 spaces are
nested under dyadic refinement, trilinear interpolation is the exact
nested prolongation, and its transpose the restriction — both built as
compositions of 1-D [1/2, 1, 1/2] stencils per axis, so everything is
static slice arithmetic. The V-cycle plugs into make_grid_solver
unchanged (preconditioner='mg' dispatches on grid type).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tpufem.la.precond import chebyshev_iterate
from tpufem.structured.grid3d import StructuredGrid3D
from tpufem.structured.mg2d import MGData, MGLevel


def _prolong_axis(c: jnp.ndarray, axis: int) -> jnp.ndarray:
    c = jnp.moveaxis(c, axis, -1)
    m = c.shape[-1] - 1
    f = jnp.zeros(c.shape[:-1] + (2 * m + 1,), c.dtype)
    f = f.at[..., ::2].set(c)
    f = f.at[..., 1::2].set(0.5 * (c[..., :-1] + c[..., 1:]))
    return jnp.moveaxis(f, -1, axis)


def _restrict_axis(r: jnp.ndarray, axis: int) -> jnp.ndarray:
    r = jnp.moveaxis(r, axis, -1)
    m = (r.shape[-1] - 1) // 2
    p = jnp.pad(r, [(0, 0)] * (r.ndim - 1) + [(1, 1)])
    out = (
        p[..., 1 : 2 + 2 * m : 2]
        + 0.5 * (p[..., 0 : 1 + 2 * m : 2] + p[..., 2 : 3 + 2 * m : 2])
    )
    return jnp.moveaxis(out, -1, axis)


def prolong(c: jnp.ndarray) -> jnp.ndarray:
    """(bs, nzc+1, nyc+1, nxc+1) -> fine, trilinear."""
    for ax in (1, 2, 3):
        c = _prolong_axis(c, ax)
    return c


def restrict(rf: jnp.ndarray) -> jnp.ndarray:
    """Exact transpose of :func:`prolong`."""
    for ax in (3, 2, 1):
        rf = _restrict_axis(rf, ax)
    return rf


def _inject(f):
    return f[..., ::2, ::2, ::2]


def _coarsen_cell_field(f):
    nz, ny, nx = f.shape[-3:]
    return f.reshape(
        f.shape[:-3] + (nz // 2, 2, ny // 2, 2, nx // 2, 2)
    ).mean(axis=(-5, -3, -1))


def coarsen_grid(grid: StructuredGrid3D) -> StructuredGrid3D:
    return StructuredGrid3D(
        nx=grid.nx // 2, ny=grid.ny // 2, nz=grid.nz // 2,
        hx=grid.hx * 2, hy=grid.hy * 2, hz=grid.hz * 2, bs=grid.bs,
        energy_density=grid.energy_density,
        field_kinds=grid.field_kinds,
    )


def _coarsen_fields(grid, fields):
    out = {}
    for name, kind in grid.field_kinds.items():
        f = fields[name]
        out[name] = _inject(f) if kind == "vertex" else _coarsen_cell_field(f)
    return out


def _constrained_action(grid, u, fields, free):
    def A(v):
        av = grid.tangent_action(u, fields, v * free)
        return av * free + v * (1.0 - free)

    return A


def build_mg3d(
    grid: StructuredGrid3D,
    u_lin: jnp.ndarray,
    fields: Dict[str, jnp.ndarray],
    free: jnp.ndarray,
    *,
    coarse_dofs: int = 3000,
    max_levels: int = 16,
    power_iters: int = 15,
) -> Tuple[Tuple[StructuredGrid3D, ...], MGData]:
    def make_level_data(g):
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
            return inv_d, jnp.vdot(v, w) / jnp.vdot(v, v)

        return level_data

    grids = [grid]
    levels = []
    g, u, flds, fr = grid, u_lin, fields, free
    while (
        len(grids) < max_levels
        and g.nx % 2 == 0 and g.ny % 2 == 0 and g.nz % 2 == 0
        and min(g.nx, g.ny, g.nz) >= 4
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

    shape = u.shape
    nc = u.size
    A = _constrained_action(g, u, flds, fr)

    @jax.jit
    def col(e):
        return A(e.reshape(shape)).ravel()

    cols = jax.lax.map(col, jnp.eye(nc, dtype=u.dtype), batch_size=256)
    coarse_inv = jnp.asarray(
        np.linalg.pinv(np.asarray(cols).T, rcond=1e-12).astype(
            np.asarray(u).dtype
        )
    )
    return tuple(grids), MGData(
        levels=tuple(levels), coarse_inv=coarse_inv, coarse_free=fr
    )


def vcycle(grids, data: MGData, b: jnp.ndarray, *, degree: int = 3,
           lmin_ratio: float = 1.0 / 8.0, matvecs=None) -> jnp.ndarray:
    """``matvecs``: optional per-level raw linear operators (e.g. the
    Pallas constant-stencil matvec, structured.pallas3d) replacing the
    XLA jvp stencil in the smoothers — the fine level dominates V-cycle
    cost and the Pallas kernel is ~25x faster there."""

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
