"""Reference-physics (asym elasto-damage) nonlinear solve at 2.1M DoF on
the structured path — the flagship workload at scale.

Reference context (BASELINE.md): the study solves 6.17M DoF of this
physics in 813.997 s on 1 CPU core / 13.44 s on 128 cores.

Usage: python benchmarks/mechanic2d_scale_bench.py [n=1024]
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
    from tpufem.forms import asym_damage_psi
    from tpufem.structured import StructuredGrid2D
    from tpufem.structured.solve import make_grid_solver

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    nx = ny = n
    ndofs = 2 * (n + 1) ** 2
    E, NU = 1.0e6, 0.3
    grid = StructuredGrid2D(
        nx=nx, ny=ny, hx=1 / nx, hy=1 / ny, bs=2,
        energy_density=lambda g, c: asym_damage_psi(
            0.5 * (g + g.T), c["d"], E, NU
        ),
        field_kinds={"d": "vertex"},
    )
    yy = np.linspace(0, 1, ny + 1)[:, None]
    d = jnp.asarray(
        np.broadcast_to(
            np.where((yy > 0.45) & (yy < 0.55), 0.8, 0.0), (ny + 1, nx + 1)
        ).astype(np.float32)
    )
    free = np.ones((2, ny + 1, nx + 1), dtype=np.float32)
    free[:, :, 0] = 0.0
    free[:, :, -1] = 0.0
    bcv = np.zeros((2, ny + 1, nx + 1), dtype=np.float32)
    bcv[0, :, -1] = 0.01
    cfg = SolverConfig(
        cg_rtol=1e-5, newton_rtol=1e-4, newton_atol=1e-2, cg_maxit=6000,
        error_on_nonconvergence=False, verbose=True,
    )
    solve = make_grid_solver(grid, cfg, cg_chunk=500)
    u0 = jnp.zeros((2, ny + 1, nx + 1), dtype=jnp.float32)
    t0 = time.perf_counter()
    res = solve(u0, {"d": d}, jnp.asarray(free), jnp.asarray(bcv))
    t_first = time.perf_counter() - t0
    print(
        f"first solve (incl compiles): {t_first:.1f}s "
        f"newton={res.newton_iters} cg={res.total_cg_iters} "
        f"conv={res.converged}",
        flush=True,
    )
    t0 = time.perf_counter()
    res = solve(u0, {"d": d * (1 + 1e-6)}, jnp.asarray(free),
                jnp.asarray(bcv))
    t_solve = time.perf_counter() - t0
    print(
        f"mechanic2d-physics e2e ({ndofs/1e6:.1f}M dofs): {t_solve:.3f} s "
        f"newton={res.newton_iters} cg={res.total_cg_iters} "
        f"rel={res.final_residual/max(res.r0,1e-30):.2e} "
        f"conv={res.converged}",
        flush=True,
    )


if __name__ == "__main__":
    main()
