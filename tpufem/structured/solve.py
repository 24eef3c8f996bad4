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
    inner_dtype=None,
    mg_matvec_factory=None,
):
    """Returns solve(u0, fields, free_mask, bc_values, load=None).

    ``free_mask``: (ny+1, nx+1, bs) 1.0 on unknowns; ``bc_values`` same
    shape with imposed values; ``load`` optional nodal load field.

    ``cfg.preconditioner='mg'`` uses the geometric-multigrid V-cycle
    (structured.mg2d) — the lattice BoomerAMG equivalent; anything else
    falls back to point Jacobi.

    ``mg_matvec_factory``: optional callable grid_level -> raw linear
    matvec (or None); used for the CG operator at the fine level and the
    MG smoothers per level — plug the Pallas constant-stencil kernels
    here for linear constant-coefficient problems.

    ``inner_dtype`` (e.g. jnp.float32): mixed-precision mode — the
    Newton residual, the iterate and the update stay in u0's dtype
    (f64), while each CG solve runs in ``inner_dtype`` on a normalized
    right-hand side. Newton itself is the defect-correction loop, so the
    iterate converges to the full-f64 root at the cost of a few extra
    (cheap, f32) Newton steps — the reference's all-f64 accuracy
    (CG rtol 1e-12, doc.tex:2252-2257) at TPU-f32 speed. Set
    ``cfg.cg_rtol`` to what the inner dtype can reach (~1e-6 for f32).
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
    _mg_matvecs = {}

    def _mg_mod():
        from tpufem.structured import mg2d, mg3d
        from tpufem.structured.grid3d import StructuredGrid3D

        return mg3d if isinstance(grid, StructuredGrid3D) else mg2d

    def apply_pc(pcdata, r):
        if use_mg:
            # the grids tuple is static structure (same lattice every
            # Newton iteration); all per-iteration arrays are in pcdata
            return _mg_mod().vcycle(
                _mg_grids["g"], pcdata, r, degree=cfg.mg_degree,
                matvecs=_mg_matvecs.get("m"),
            )
        return pcdata * r

    apply_pc_jit = jax.jit(apply_pc)

    _fine_mv = {}

    @partial(jax.jit, static_argnums=(0,))
    def cg_chunk_fn(nsteps, u_lin, fields, free, pcdata, state):
        raw = _fine_mv.get("f")

        def A(v):
            if raw is not None:
                return raw(v * free) * free + v * (1.0 - free)
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
            if inner_dtype is not None:
                scale = bnorm if bnorm > 0 else 1.0
                b_in = (b / scale).astype(inner_dtype)
                u_in = u.astype(inner_dtype)
                fields_in = {
                    k_: v.astype(inner_dtype) for k_, v in fields.items()
                }
                free_in = free.astype(inner_dtype)
            else:
                scale = 1.0
                b_in, u_in, fields_in, free_in = b, u, fields, free
            if use_mg:
                mod = _mg_mod()
                build = getattr(mod, "build_mg3d", None) or mod.build_mg2d
                grids, pcdata = build(grid, u_in, fields_in, free_in)
                _mg_grids["g"] = grids
                if mg_matvec_factory is not None and "m" not in _mg_matvecs:
                    _mg_matvecs["m"] = [
                        mg_matvec_factory(g) for g in grids[:-1]
                    ]
                    _fine_mv["f"] = _mg_matvecs["m"][0]
            elif mg_matvec_factory is not None and "f" not in _fine_mv:
                _fine_mv["f"] = mg_matvec_factory(grid)
            else:
                diag = diag_fn(u_in, fields_in, free_in)
                pcdata = jnp.where(diag != 0, 1.0 / diag, 1.0)
            z0 = apply_pc_jit(pcdata, b_in) if use_mg else pcdata * b_in
            state = (jnp.zeros_like(b_in), b_in, z0, z0, dot(b_in, z0))
            tol = max(cfg.cg_rtol * float(jnp.sqrt(dot(b_in, b_in))),
                      cfg.cg_atol)
            k = 0
            while k < cfg.cg_maxit:
                nsteps = min(cg_chunk, cfg.cg_maxit - k)
                state, rr = cg_chunk_fn(
                    nsteps, u_in, fields_in, free_in, pcdata, state
                )
                k += nsteps
                if float(rr) < tol:
                    break
            u = u + (state[0].astype(u.dtype) * scale) * free
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
