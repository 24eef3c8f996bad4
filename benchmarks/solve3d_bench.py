"""10M-DoF 3D elasticity on the structured path (BASELINE config 3).

Target (BASELINE.json): <5 s end-to-end on v5p-8; here one v5e core.
Measures residual/jvp throughput (honest chained protocol) and the
chunked Newton-CG solve.

Usage: python benchmarks/solve3d_bench.py [n=148]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
sys.path.insert(0, "/root/repo")


def main():
    from tpufem.config import SolverConfig
    from tpufem.forms import linear_elastic_psi
    from tpufem.structured.grid3d import StructuredGrid3D
    from tpufem.structured.solve import make_grid_solver

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 148
    N1 = n + 1
    ndofs = 3 * N1**3
    E, NU = 1.0e6, 0.3
    grid = StructuredGrid3D(
        nx=n, ny=n, nz=n, hx=1 / n, hy=1 / n, hz=1 / n, bs=3,
        energy_density=lambda g, c: linear_elastic_psi(
            0.5 * (g + g.T), E, NU
        ),
        field_kinds={},
    )
    u0 = jnp.zeros((3, N1, N1, N1), dtype=jnp.float32)
    print(f"n={n}: {ndofs/1e6:.2f}M dofs", flush=True)

    @jax.jit
    def chain_res(u, iters):
        def body(_, x):
            return x + 1e-12 * grid.residual(x, {})

        return jax.lax.fori_loop(0, iters, body, u)

    t0 = time.perf_counter()
    x = chain_res(u0, 2)
    float(np.asarray(x)[0, 0, 0, 0])
    print(f"residual compile: {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    x = chain_res(u0, 5)
    float(np.asarray(x)[0, 0, 0, 0])
    ta = time.perf_counter() - t0
    t0 = time.perf_counter()
    x = chain_res(u0, 55)
    float(np.asarray(x)[0, 0, 0, 0])
    tb = time.perf_counter() - t0
    per = max(tb - ta, 1e-9) / 50
    print(
        f"3D residual: {per*1e3:.3f} ms -> {ndofs/per/1e6:.0f} MDoF/s",
        flush=True,
    )

    # end-to-end solve: pulled bar
    free = np.ones((3, N1, N1, N1), dtype=np.float32)
    free[:, :, :, 0] = 0.0
    free[:, :, :, -1] = 0.0
    bcv = np.zeros((3, N1, N1, N1), dtype=np.float32)
    bcv[0, :, :, -1] = 0.01
    cfg = SolverConfig(
        cg_rtol=1e-6, newton_rtol=1e-5, newton_atol=1e-2,
        cg_maxit=2000, error_on_nonconvergence=False,
    )
    solve = make_grid_solver(grid, cfg, cg_chunk=100)
    t0 = time.perf_counter()
    res = solve(u0, {}, jnp.asarray(free), jnp.asarray(bcv))
    t_first = time.perf_counter() - t0
    print(
        f"e2e first (incl compile): {t_first:.1f}s newton={res.newton_iters} "
        f"cg={res.total_cg_iters} conv={res.converged}",
        flush=True,
    )
    t0 = time.perf_counter()
    res = solve(u0 + 1e-9, {}, jnp.asarray(free), jnp.asarray(bcv))
    t_solve = time.perf_counter() - t0
    print(
        f"e2e solve ({ndofs/1e6:.1f}M dofs): {t_solve:.3f} s, "
        f"newton={res.newton_iters} cg={res.total_cg_iters} "
        f"rel={res.final_residual/max(res.r0,1e-30):.2e}",
        flush=True,
    )

    # geometric MG with per-level Pallas constant-stencil smoothers
    from tpufem.structured import pallas3d

    def factory(g):
        if min(g.nx, g.ny, g.nz) < 16:
            return None  # tiny levels: the XLA stencil is fine
        return pallas3d.make_linear_matvec(g, E, NU, block_z=4)

    cfg_mg = SolverConfig(
        cg_rtol=1e-6, newton_rtol=1e-5, newton_atol=1e-2,
        cg_maxit=500, preconditioner="mg",
        error_on_nonconvergence=False,
    )
    solve_mg = make_grid_solver(grid, cfg_mg, cg_chunk=5,
                                mg_matvec_factory=factory)
    t0 = time.perf_counter()
    res = solve_mg(u0, {}, jnp.asarray(free), jnp.asarray(bcv))
    print(
        f"e2e MG first (incl compile): {time.perf_counter()-t0:.1f}s "
        f"newton={res.newton_iters} cg={res.total_cg_iters} "
        f"conv={res.converged}",
        flush=True,
    )
    t0 = time.perf_counter()
    res = solve_mg(u0 + 1e-9, {}, jnp.asarray(free), jnp.asarray(bcv))
    t_mg = time.perf_counter() - t0
    print(
        f"e2e MG solve ({ndofs/1e6:.1f}M dofs): {t_mg:.3f} s, "
        f"newton={res.newton_iters} cg={res.total_cg_iters} "
        f"rel={res.final_residual/max(res.r0,1e-30):.2e}",
        flush=True,
    )


if __name__ == "__main__":
    main()
