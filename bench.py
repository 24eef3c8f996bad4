"""Benchmark: assembly throughput on the mechanic2d physics at ~1M DoF.

Prints ONE JSON line:
  {"metric": "assembly_mdof_s", "value": N, "unit": "MDoF/s",
   "vs_baseline": N}

Metric: DoF assembled per second for one nonlinear-iteration assembly
pass (residual + element tangents + Jacobi diagonal) of the asymmetric
elasto-damage model on P1 triangles — the phase the reference profiles
as "6.3/6.4 create+assemble elementary vector/matrix".

Baseline (BASELINE.md): the reference's FEniCSx C++ np=1 figure —
6.17M DoF × 7 NL iterations / (19.96 s + 44.73 s) ≈ 0.667 MDoF/s on one
CPU core. vs_baseline = ours / 0.667.

Secondary numbers (end-to-end Newton-Krylov solve time) go to stderr.
"""

import json
import sys
import time

import numpy as np

REFERENCE_MDOF_S = 6.17e6 * 7 / (19.96 + 44.73) / 1e6  # ≈ 0.667 MDoF/s


def main():
    import jax

    # persistent compile cache: axon remote compiles take minutes per
    # program; cache across bench invocations
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from tpufem.assemble import Assembler
    from tpufem.config import SolverConfig
    from tpufem.forms import EnergyFunctional, asym_damage_psi
    from tpufem.forms.form import Coefficient, Term
    from tpufem.mesh import unit_square
    from tpufem.spaces import DirichletBC, FunctionSpace
    from tpufem.spaces.bc import locate_dofs_geometrical

    from tpufem.mesh.reorder import sfc_reorder

    dtype = jnp.float32
    n = 724  # 2*n^2 cells, (n+1)^2 nodes -> ~1.05M dofs
    t0 = time.perf_counter()
    mesh = sfc_reorder(unit_square(n))
    V = FunctionSpace.create(mesh, 1, bs=2)
    DS = FunctionSpace.create(mesh, 1, bs=1)
    E, NU = 1.0e6, 0.3
    d_np = np.zeros(DS.n_dofs)
    band = (DS.dof_coords[:, 1] > 0.45) & (DS.dof_coords[:, 1] < 0.55)
    d_np[band] = 0.8
    stiff = Term(
        integrand=lambda qp: asym_damage_psi(qp.eps, qp.coeff("d"), E, NU),
        degree=1,
    )
    F = EnergyFunctional(V, [stiff], [Coefficient("d", DS)])
    left = locate_dofs_geometrical(V, lambda x: np.abs(x[:, 0]) < 1e-12)
    right = locate_dofs_geometrical(V, lambda x: np.abs(x[:, 0] - 1) < 1e-12)
    bcs = [DirichletBC(V, left, [0.0, 0.0]), DirichletBC(V, right, [0.01, 0.0])]
    asm = Assembler(F, bcs)
    coeffs = {"d": jnp.asarray(d_np, dtype=dtype)}
    print(
        f"setup: {V.n_dofs} dofs, {mesh.n_cells} cells, "
        f"{time.perf_counter()-t0:.2f}s",
        file=sys.stderr,
    )

    # asm passed as a pytree argument (its tables must be buffer
    # parameters, not program constants — see tpufem.utils.pytree)

    u = jnp.zeros(V.n_dofs, dtype=dtype)
    # compile + warmup; then a CHAINED loop (each pass depends on the
    # previous result) so no runtime-level execution caching can hide work
    @jax.jit
    def chained_pass(asm_, u, d):
        r, diag = assembly_pass_body(asm_, u, d)
        return u + 1e-12 * r, r, diag

    def assembly_pass_body(asm_, u, d):
        c = {"d": d}
        return asm_.residual(u, c), asm_.diagonal(u, c)

    # block_until_ready does not synchronize on this runtime: time by
    # materializing a scalar, and difference two chain lengths to cancel
    # the round-trip overhead
    u_c, r, diag = chained_pass(asm, u, coeffs["d"])
    float(np.asarray(u_c)[0])
    reps0, reps1 = 3, 13
    t0 = time.perf_counter()
    for _ in range(reps0):
        u_c, r, diag = chained_pass(asm, u_c, coeffs["d"])
    float(np.asarray(u_c)[0])
    t_a = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(reps1):
        u_c, r, diag = chained_pass(asm, u_c, coeffs["d"])
    float(np.asarray(u_c)[0])
    t_b = time.perf_counter() - t0
    dt = max(t_b - t_a, 1e-9) / (reps1 - reps0)
    mdof_s = V.n_dofs / dt / 1e6
    print(f"assembly pass: {dt*1e3:.2f} ms -> {mdof_s:.1f} MDoF/s", file=sys.stderr)

    # end-to-end solve (secondary, stderr): chunked driver — bounded
    # device executions (the remote runtime faults on multi-second single
    # executions) with host-materialized convergence scalars, so the
    # timing is honest by construction
    from tpufem.nls.newton_chunked import make_chunked_solver

    cfg = SolverConfig(
        cg_rtol=1e-6, newton_rtol=1e-5, newton_atol=1e-3, cg_maxit=2000,
        error_on_nonconvergence=False, preconditioner="block_jacobi",
        block_size=256,
    )
    solve = make_chunked_solver(asm, cfg, cg_chunk=100)
    res = solve(u, coeffs)  # warm up compiles
    coeffs2 = {"d": coeffs["d"] * (1.0 + 1e-6)}
    t0 = time.perf_counter()
    res = solve(u, coeffs2)
    t_solve = time.perf_counter() - t0
    print(
        f"e2e newton-krylov ({V.n_dofs} dofs): {t_solve:.3f} s, "
        f"newton={res.newton_iters} cg={res.total_cg_iters} "
        f"rel={res.final_residual/max(res.r0,1e-30):.2e}",
        file=sys.stderr,
    )

    print(
        json.dumps(
            {
                "metric": "assembly_mdof_s",
                "value": round(mdof_s, 2),
                "unit": "MDoF/s",
                "vs_baseline": round(mdof_s / (REFERENCE_MDOF_S * 1e0), 2),
            }
        )
    )


if __name__ == "__main__":
    main()
