"""Pallas fused-residual kernel: on-chip correctness + throughput.

Correctness is checked against the XLA structured path at small n
(where the XLA program compiles quickly); throughput is measured at
large n with the honest chained protocol. Mosaic kernels compile in
seconds where the equivalent XLA stencil program takes ~10 minutes on
this remote-compile path.

Usage: python benchmarks/pallas_bench.py [n=1024] [block_rows=64]
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
    from tpufem.structured.pallas2d import make_residual_kernel

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    br = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    E, NU = 1e6, 0.3
    rng = np.random.default_rng(0)

    # --- correctness at small n (cheap XLA reference compile) ---
    ns = 96
    us = jnp.asarray(rng.normal(size=(2, ns + 1, ns + 1)).astype(np.float32) * 1e-3)
    ds = jnp.asarray(rng.uniform(0, 1, (ns + 1, ns + 1)).astype(np.float32))
    pal_s = make_residual_kernel(ns, ns, 1 / ns, 1 / ns, E, NU, block_rows=32)
    grid_s = StructuredGrid2D(
        nx=ns, ny=ns, hx=1 / ns, hy=1 / ns, bs=2,
        energy_density=lambda g, c: asym_damage_psi(
            0.5 * (g + g.T), c["d"], E, NU
        ),
        field_kinds={"d": "vertex"},
    )
    r_pal = np.asarray(pal_s(us, ds))
    r_ref = np.asarray(grid_s.residual(us, {"d": ds}))
    err = np.abs(r_pal - r_ref).max() / np.abs(r_ref).max()
    print(f"on-chip correctness (n={ns}): rel err {err:.2e}", flush=True)
    assert err < 1e-5, err

    # --- throughput at large n ---
    nx = ny = n
    ndofs = (nx + 1) * (ny + 1) * 2
    u = jnp.asarray(rng.normal(size=(2, ny + 1, nx + 1)).astype(np.float32) * 1e-3)
    d = jnp.asarray(rng.uniform(0, 1, (ny + 1, nx + 1)).astype(np.float32))
    pal = make_residual_kernel(nx, ny, 1 / nx, 1 / ny, E, NU, block_rows=br)

    @jax.jit
    def chain(u, d, iters):
        def body(_, x):
            return x + 1e-12 * pal(x, d)

        return jax.lax.fori_loop(0, iters, body, u)

    t0 = time.perf_counter()
    x = chain(u, d, 2)
    float(np.asarray(x)[0, 0, 0])
    print(f"chain compile+2: {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    x = chain(u, d, 5)
    float(np.asarray(x)[0, 0, 0])
    ta = time.perf_counter() - t0
    t0 = time.perf_counter()
    x = chain(u, d, 2005)
    float(np.asarray(x)[0, 0, 0])
    tb = time.perf_counter() - t0
    per = max(tb - ta, 1e-9) / 2000
    print(
        f"pallas residual (n={n}, br={br}): {per*1e3:.3f} ms -> "
        f"{ndofs/per/1e6:.0f} MDoF/s",
        flush=True,
    )


if __name__ == "__main__":
    main()
