"""Chunked Newton-Krylov: bounded device executions, host-side control.

The fully-jitted solver (newton_jit) runs the entire Newton+CG loop as
one XLA execution. On runtimes that limit or mishandle long single
executions (the remote-TPU tunnel kills multi-second programs), and for
solves that want checkpointing/observability, this driver instead runs
CG in fixed-size jitted chunks and keeps Newton control flow on host —
the same structure as the reference's PETSc KSPSolve with its per-
iteration monitors (FEniCSx/mechanic2d/asym_elasto_damage_model.cc:
869-891), with materialized convergence scalars per chunk.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from tpufem.assemble.assembler import Assembler
from tpufem.config import SolverConfig
from tpufem.la.precond import jacobi_preconditioner


class ChunkedResult(NamedTuple):
    u: jnp.ndarray
    newton_iters: int
    total_cg_iters: int
    final_residual: float
    r0: float
    converged: bool
    history: list  # (newton_it, |r|, cg_iters) tuples


def make_chunked_solver(
    asm: Assembler,
    cfg: Optional[SolverConfig] = None,
    *,
    cg_chunk: int = 100,
    checkpoint_path: Optional[str] = None,
):
    """Returns solve(u0, coeffs) → ChunkedResult.

    Each device execution is at most ``cg_chunk`` CG iterations (or one
    assembly); convergence scalars are materialized between chunks.

    ``checkpoint_path``: save (u, newton state) after every Newton
    iteration and resume from the file if it exists — the
    checkpoint/restart capability the reference lacks (SURVEY.md §5.4;
    its runs are always start-to-finish).
    """
    cfg = cfg or SolverConfig()
    asm.pattern
    bj_plan = None
    if cfg.preconditioner == "block_jacobi":
        from tpufem.la.block_jacobi import BlockJacobiPlan

        bj_plan = BlockJacobiPlan.build(asm.pattern, cfg.block_size)
    use_amg = cfg.preconditioner == "amg"
    amg_state = {}

    @jax.jit
    def rhs(asm_, u, coeffs):
        free = asm_.free_mask(u.dtype)
        b = -asm_.residual(u, coeffs) * free
        return b, jnp.sqrt(jnp.dot(b, b, precision=jax.lax.Precision.HIGHEST))

    @jax.jit
    def assemble(asm_, bj_plan_, u, coeffs):
        mat = asm_.matrix(u, coeffs)
        if bj_plan_ is not None:
            pcdata = jnp.linalg.inv(bj_plan_.extract(mat))
        else:
            diag = mat.diagonal()
            pcdata = jnp.where(diag != 0, 1.0 / diag, 1.0)
        return mat, pcdata

    def apply_pc(bj_plan_, hier_, pcdata, r):
        if hier_ is not None:
            from tpufem.la.amg import vcycle

            return vcycle(hier_, r, degree=cfg.amg_degree)
        if bj_plan_ is not None:
            n, B, nb = bj_plan_.n, bj_plan_.B, bj_plan_.nb
            pad = nb * B - n
            rp = jnp.pad(r, (0, pad)) if pad else r
            y = jnp.einsum(
                "bij,bj->bi", pcdata, rp.reshape(nb, B),
                precision=jax.lax.Precision.HIGHEST,
            ).reshape(-1)
            return y[:n] if pad else y
        return pcdata * r

    @partial(jax.jit, static_argnums=(0,))
    def cg_chunk_fn(nsteps, asm_, bj_plan_, hier_, mat, pcdata, state):
        x, r, z, p, rz = state

        def dot(a, b):
            return jnp.dot(a, b, precision=jax.lax.Precision.HIGHEST)

        def body(_, st):
            x, r, z, p, rz = st
            Ap = mat.matvec(p)
            alpha = rz / dot(p, Ap)
            x = x + alpha * p
            r = r - alpha * Ap
            z = apply_pc(bj_plan_, hier_, pcdata, r)
            rz_new = dot(r, z)
            p = z + (rz_new / rz) * p
            return (x, r, z, p, rz_new)

        st = jax.lax.fori_loop(0, nsteps, body, state)
        rr = jnp.sqrt(dot(st[1], st[1]))
        return st, rr

    @jax.jit
    def cg_init(asm_, bj_plan_, hier_, mat, pcdata, b):
        x = jnp.zeros_like(b)
        r = b
        z = apply_pc(bj_plan_, hier_, pcdata, r)
        rz = jnp.dot(r, z, precision=jax.lax.Precision.HIGHEST)
        return (x, r, z, p_init(z), rz)

    def p_init(z):
        return z

    def solve(u0, coeffs) -> ChunkedResult:
        import os

        u = asm.set_bc(u0)
        history = []
        r0 = None
        total_cg = 0
        converged = False
        it = 0
        it_start = 1
        if checkpoint_path is not None and os.path.exists(checkpoint_path):
            from tpufem.io.checkpoint import load_checkpoint

            ck = load_checkpoint(checkpoint_path)
            u = jnp.asarray(ck["u"])
            it_start = int(ck["newton_it"]) + 1
            r0 = float(ck["r0"]) if np.isfinite(ck["r0"]) else None
            total_cg = int(ck["total_cg"])
        for it in range(it_start, cfg.newton_maxit + 1):
            b, bnorm = rhs(asm, u, coeffs)
            bnorm = float(bnorm)
            if r0 is None and (cfg.convergence == "r0" or it >= 2):
                # 'du0' (dolfinx) measures relative to the residual after
                # the first correction (doc.tex:2065-2068)
                r0 = bnorm
            ref = r0 if r0 is not None else bnorm
            if bnorm < max(cfg.newton_rtol * ref, cfg.newton_atol):
                converged = True
                it -= 1
                break
            mat, pcdata = assemble(asm, bj_plan, u, coeffs)
            hier = None
            if use_amg:
                if "h" not in amg_state:
                    from tpufem.la.amg import (
                        AMGOptions, build_hierarchy, ell_to_scipy,
                    )

                    V = asm.space
                    amg_state["h"] = build_hierarchy(
                        ell_to_scipy(mat), V.dof_coords, V.bs,
                        free_mask=np.asarray(
                            asm._free_mask_np, dtype=np.float64
                        ),
                        opts=AMGOptions(
                            theta=cfg.amg_theta,
                            coarse_size=cfg.amg_coarse_size,
                        ),
                        dtype=np.asarray(b).dtype,
                    )
                hier = amg_state["h"]
            state = cg_init(asm, bj_plan, hier, mat, pcdata, b)
            tol = max(cfg.cg_rtol * bnorm, cfg.cg_atol)
            k = 0
            while k < cfg.cg_maxit:
                nsteps = min(cg_chunk, cfg.cg_maxit - k)
                state, rr = cg_chunk_fn(
                    nsteps, asm, bj_plan, hier, mat, pcdata, state
                )
                k += nsteps
                if float(rr) < tol:
                    break
            u = u + state[0] * asm.free_mask(u.dtype)
            total_cg += k
            history.append((it, bnorm, k))
            if checkpoint_path is not None:
                from tpufem.io.checkpoint import save_checkpoint

                save_checkpoint(
                    checkpoint_path,
                    dict(u=np.asarray(u), newton_it=it,
                         r0=r0 if r0 is not None else np.nan,
                         total_cg=total_cg),
                )
            if cfg.verbose:
                print(
                    f"Newton iteration {it}: |r| = {bnorm:.6e} "
                    f"(cg {k} iters)"
                )
        b, bnorm = rhs(asm, u, coeffs)
        bnorm = float(bnorm)
        if r0 is None:
            r0 = bnorm
        converged = bnorm < max(cfg.newton_rtol * r0, cfg.newton_atol)
        if not converged and cfg.error_on_nonconvergence:
            from tpufem.nls.newton import NonConvergenceError

            raise NonConvergenceError(
                f"chunked Newton: |r| = {bnorm:.3e} after {it} iterations"
            )
        return ChunkedResult(
            u=u, newton_iters=it, total_cg_iters=total_cg,
            final_residual=bnorm, r0=r0 or bnorm, converged=converged,
            history=history,
        )

    return solve
