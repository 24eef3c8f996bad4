"""Structured-path throughput on TPU (honest chained timing).

Usage: python benchmarks/structured_bench.py [n=1024]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
sys.path.insert(0, "/root/repo")


def main():
    from tpufem.forms import asym_damage_psi
    from tpufem.structured import StructuredGrid2D

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    nx = ny = n
    ndofs = (nx + 1) * (ny + 1) * 2
    grid = StructuredGrid2D(
        nx=nx, ny=ny, hx=1.0 / nx, hy=1.0 / ny, bs=2,
        energy_density=lambda g, c: asym_damage_psi(
            0.5 * (g + g.T), c["d"], 3.7e7, 0.3
        ),
        field_kinds={"d": "vertex"},
    )
    rng = np.random.default_rng(0)
    d = jnp.asarray(
        rng.uniform(0, 1, (ny + 1, nx + 1)).astype(np.float32)
    )
    u0 = jnp.zeros((2, ny + 1, nx + 1), dtype=jnp.float32)
    print(f"n={n}: {ndofs} dofs", flush=True)

    @jax.jit
    def chain_res(u, d, iters):
        def body(_, u):
            r = grid.residual(u, {"d": d})
            return u + 1e-12 * r

        return jax.lax.fori_loop(0, iters, body, u)

    @jax.jit
    def chain_jvp(u, d, iters):
        def body(_, v):
            av = grid.tangent_action(u, {"d": d}, v)
            return v + 1e-12 * av

        return jax.lax.fori_loop(0, iters, body, jnp.ones_like(u))

    def run(label, fn, *args):
        fn(*args + (1,))
        x = fn(*args + (2,))
        float(np.asarray(x).ravel()[0])
        t0 = time.perf_counter()
        x = fn(*args + (5,))
        float(np.asarray(x).ravel()[0])
        ta = time.perf_counter() - t0
        t0 = time.perf_counter()
        x = fn(*args + (55,))
        float(np.asarray(x).ravel()[0])
        tb = time.perf_counter() - t0
        per = max(tb - ta, 1e-9) / 50
        print(
            f"{label}: {per*1e3:.3f} ms -> {ndofs/per/1e6:.0f} MDoF/s",
            flush=True,
        )

    run("structured residual", chain_res, u0, d)
    run("structured jvp     ", chain_jvp, u0, d)


if __name__ == "__main__":
    main()
