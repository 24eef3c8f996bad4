"""Chunked Newton-Krylov on the structured fast path.

Matrix-free: the CG operator is jax.jvp of the gather-free residual —
pure stencil traffic, no sparse matrix, no gathers. BCs by mask fields
on the lattice. Executions are bounded (see nls/newton_chunked).
"""

from __future__ import annotations

from functools import partial
from typing import Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from tpufem.config import SolverConfig
from tpufem.structured.grid2d import StructuredGrid2D


class GridSolveResult(NamedTuple):
    u: jnp.ndarray
    newton_iters: int
    total_cg_iters: int
    final_residual: float
    r0: float
    converged: bool


def make_grid_solver(
    grid: StructuredGrid2D,
    cfg: Optional[SolverConfig] = None,
    *,
    cg_chunk: int = 200,
):
    """Returns solve(u0, fields, free_mask, bc_values, load=None).

    ``free_mask``: (ny+1, nx+1, bs) 1.0 on unknowns; ``bc_values`` same
    shape with imposed values; ``load`` optional nodal load field.

    ``cfg.preconditioner='mg'`` uses the geometric-multigrid V-cycle
    (structured.mg2d) — the lattice BoomerAMG equivalent; anything else
    falls back to point Jacobi.
    """
    cfg = cfg or SolverConfig()
    use_mg = cfg.preconditioner == "mg"

    def dot(a, b):
        return jnp.vdot(a, b)

    @jax.jit
    def rhs(u, fields, free, load_r):
        r = grid.residual(u, fields) - load_r
        b = -r * free
        return b, jnp.sqrt(dot(b, b))

    @jax.jit
    def diag_fn(u, fields, free):
        d = grid.diagonal(u, fields)
        return d * free + (1.0 - free)

    _mg_grids = {}

    def apply_pc(pcdata, r):
        if use_mg:
            from tpufem.structured import mg2d

            # the grids tuple is static structure (same lattice every
            # Newton iteration); all per-iteration arrays are in pcdata
            return mg2d.vcycle(
                _mg_grids["g"], pcdata, r, degree=cfg.mg_degree
            )
        return pcdata * r

    apply_pc_jit = jax.jit(apply_pc)

    @partial(jax.jit, static_argnums=(0,))
    def cg_chunk_fn(nsteps, u_lin, fields, free, pcdata, state):
        def A(v):
            av = grid.tangent_action(u_lin, fields, v * free)
            return av * free + v * (1.0 - free)

        def body(_, st):
            x, r, z, p, rz = st
            Ap = A(p)
            alpha = rz / dot(p, Ap)
            x = x + alpha * p
            r = r - alpha * Ap
            z = apply_pc(pcdata, r)
            rz_new = dot(r, z)
            p = z + (rz_new / rz) * p
            return (x, r, z, p, rz_new)

        st = jax.lax.fori_loop(0, nsteps, body, state)
        return st, jnp.sqrt(dot(st[1], st[1]))

    def solve(u0, fields, free, bc_values, load=None) -> GridSolveResult:
        free = free.astype(u0.dtype)
        u = jnp.where(free > 0, u0, bc_values.astype(u0.dtype))
        load_r = (
            grid.load_residual(load.astype(u0.dtype))
            if load is not None
            else jnp.zeros_like(u)
        )
        r0 = None
        total_cg = 0
        it = 0
        for it in range(1, cfg.newton_maxit + 1):
            b, bnorm = rhs(u, fields, free, load_r)
            bnorm = float(bnorm)
            if r0 is None:
                r0 = bnorm
            if bnorm < max(cfg.newton_rtol * r0, cfg.newton_atol):
                it -= 1
                break
            if use_mg:
                from tpufem.structured import mg2d

                grids, pcdata = mg2d.build_mg2d(grid, u, fields, free)
                _mg_grids["g"] = grids
            else:
                diag = diag_fn(u, fields, free)
                pcdata = jnp.where(diag != 0, 1.0 / diag, 1.0)
            z0 = apply_pc_jit(pcdata, b) if use_mg else pcdata * b
            state = (jnp.zeros_like(b), b, z0, z0, dot(b, z0))
            tol = max(cfg.cg_rtol * bnorm, cfg.cg_atol)
            k = 0
            while k < cfg.cg_maxit:
                nsteps = min(cg_chunk, cfg.cg_maxit - k)
                state, rr = cg_chunk_fn(
                    nsteps, u, fields, free, pcdata, state
                )
                k += nsteps
                if float(rr) < tol:
                    break
            u = u + state[0] * free
            total_cg += k
            if cfg.verbose:
                print(f"Newton {it}: |r| = {bnorm:.6e} (cg {k})")
        b, bnorm = rhs(u, fields, free, load_r)
        bnorm = float(bnorm)
        converged = bnorm < max(cfg.newton_rtol * (r0 or 1.0), cfg.newton_atol)
        return GridSolveResult(
            u=u, newton_iters=it, total_cg_iters=total_cg,
            final_residual=bnorm, r0=r0 or bnorm, converged=converged,
        )

    return solve
