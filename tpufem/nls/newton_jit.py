"""Fully-jitted Newton-Krylov: the whole nonlinear solve as one XLA
program.

The eager ``NewtonSolver`` mirrors the reference's callback structure
(good for observability); this module is the TPU fast path: Newton outer
``lax.while_loop`` wrapping the CG inner ``lax.while_loop``, with the
assembled ELL Jacobian (or the matrix-free JVP action) and Jacobi/
Chebyshev preconditioning all fused by XLA. Dirichlet handling uses the
"BCs-in-initial-guess" formulation the reference documents but leaves
off (FEniCSx/mechanic2d/asym_elasto_damage_model.cc:665-668): with
u0[bc] = g the lifting term J·(g−u) vanishes identically, so each step
solves Â δ = −M F(u) with δ[bc] = 0 — same fixed point, no extra JVP.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from tpufem.assemble.assembler import Assembler
from tpufem.config import SolverConfig
from tpufem.la.cg import cg
from tpufem.la.precond import chebyshev_preconditioner, jacobi_preconditioner


class JitSolveResult(NamedTuple):
    u: jnp.ndarray
    newton_iters: jnp.ndarray
    final_residual: jnp.ndarray
    r0: jnp.ndarray
    converged: jnp.ndarray
    total_cg_iters: jnp.ndarray


def make_newton_solver(
    asm: Assembler,
    cfg: Optional[SolverConfig] = None,
    *,
    use_matrix: bool = True,
    dot=None,
    jit: bool = True,
):
    """Build solve(u0, coeffs) → JitSolveResult, fully on device.

    ``use_matrix=True`` assembles the ELL Jacobian once per Newton
    iteration and runs CG on its matvec (the reference's assembled-PETSc
    path); ``False`` uses the matrix-free JVP action (BASELINE.json
    config 3 path).
    """
    cfg = cfg or SolverConfig()
    if dot is None:
        dot = lambda a, b: jnp.dot(a, b, precision=jax.lax.Precision.HIGHEST)
    if use_matrix or cfg.preconditioner in ("block_jacobi", "amg"):
        asm.pattern  # build eagerly so ELL tables are pytree leaves
    bj_plan = None
    if cfg.preconditioner == "block_jacobi":
        from tpufem.la.block_jacobi import BlockJacobiPlan

        bj_plan = BlockJacobiPlan.build(asm.pattern, cfg.block_size)
        if not use_matrix:
            raise ValueError("block_jacobi requires use_matrix=True")
    if cfg.preconditioner == "amg" and not use_matrix:
        raise ValueError("amg requires use_matrix=True")

    # ``asm`` is a registered pytree: passing it as an argument makes all
    # its index tables buffer parameters of the XLA program rather than
    # baked-in constants (constants are rematerialized per call on the
    # remote-TPU path — measured ~600x slower gathers).
    def solve(asm, bj_plan, amg_hier, u0, coeffs):
        u0 = asm.set_bc(u0)
        free = asm.free_mask(u0.dtype)

        def rhs(u):
            return -asm.residual(u, coeffs) * free

        def newton_cond(state):
            u, b, bnorm, r0, it, cg_tot = state
            keep = (bnorm >= jnp.maximum(cfg.newton_rtol * r0, cfg.newton_atol))
            return keep & (it < cfg.newton_maxit)

        def newton_body(state):
            u, b, bnorm, r0, it, cg_tot = state
            if use_matrix:
                mat = asm.matrix(u, coeffs)
                A = mat.matvec
                diag = mat.diagonal()
            else:
                A = asm.constrained_action(u, coeffs)
                diag = asm.diagonal(u, coeffs)
            if cfg.preconditioner == "jacobi":
                M = jacobi_preconditioner(diag)
            elif cfg.preconditioner == "chebyshev":
                from tpufem.la.precond import estimate_lambda_max

                lmax = estimate_lambda_max(A, diag, b.shape[0])
                M = chebyshev_preconditioner(A, diag, lmax=lmax)
            elif cfg.preconditioner == "block_jacobi":
                M = bj_plan.preconditioner(mat)
            elif cfg.preconditioner == "amg":
                from tpufem.la.amg import amg_preconditioner

                M = amg_preconditioner(amg_hier, degree=cfg.amg_degree)
            else:
                M = None
            res = cg(
                A, b, M=M, rtol=cfg.cg_rtol, atol=cfg.cg_atol,
                maxit=cfg.cg_maxit, dot=dot,
            )
            u = u + res.x
            b_new = rhs(u)
            bnorm_new = jnp.sqrt(dot(b_new, b_new))
            if cfg.convergence == "du0":
                # dolfinx convention: relative scale is the residual after
                # the FIRST correction (doc.tex:2065-2068)
                r0 = jnp.where(it == 0, bnorm_new, r0)
            return (u, b_new, bnorm_new, r0, it + 1, cg_tot + res.iters)

        b0 = rhs(u0)
        r0 = jnp.sqrt(dot(b0, b0))
        state = (
            u0, b0, r0, r0,
            jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32),
        )
        u, b, bnorm, r0, it, cg_tot = jax.lax.while_loop(
            newton_cond, newton_body, state
        )
        converged = bnorm < jnp.maximum(cfg.newton_rtol * r0, cfg.newton_atol)
        return JitSolveResult(
            u=u, newton_iters=it, final_residual=bnorm, r0=r0,
            converged=converged, total_cg_iters=cg_tot,
        )

    _hier_cache = {}

    def _get_hier(u0, coeffs):
        """Host-side SA-AMG setup from the Jacobian at the initial
        iterate (built once per solver; the V-cycle itself is device
        code passed in as a pytree argument)."""
        if "h" not in _hier_cache:
            from tpufem.la.amg import AMGOptions, build_hierarchy, ell_to_scipy
            import numpy as np

            mat = jax.jit(lambda a, u, c: a.matrix(a.set_bc(u), c))(
                asm, u0, coeffs
            )
            sp = ell_to_scipy(mat)
            V = asm.space
            _hier_cache["h"] = build_hierarchy(
                sp, V.dof_coords, V.bs,
                free_mask=np.asarray(asm._free_mask_np, dtype=np.float64),
                opts=AMGOptions(
                    theta=cfg.amg_theta, coarse_size=cfg.amg_coarse_size
                ),
                dtype=np.asarray(u0).dtype,
            )
        return _hier_cache["h"]

    need_amg = cfg.preconditioner == "amg"
    if jit:
        solve_jitted = jax.jit(solve)
        return lambda u0, coeffs: solve_jitted(
            asm, bj_plan, _get_hier(u0, coeffs) if need_amg else None,
            u0, coeffs,
        )
    return lambda u0, coeffs: solve(
        asm, bj_plan, _get_hier(u0, coeffs) if need_amg else None, u0, coeffs
    )
