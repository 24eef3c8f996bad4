"""Probe: raw XLA gather throughput for the ELL matvec shape at 2M rows.

y = sum(vals * x[cols], axis=0) with vals/cols (W, N). Measures per-iter
time vs W and vs index locality (random cols vs banded RCM-like cols)
to decide whether the assembled-ELL 3D CG operator can beat the fused
JVP's ~10.5 ms (benchmarks/ell3d_bench.py).
"""

import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
sys.path.insert(0, "/root/repo")

import jax.numpy as jnp
import numpy as np


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 2_101_248
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(N), dtype=jnp.float32)

    @jax.jit
    def chain(vv, cc, xx, iters):
        def body(_, z):
            y = jnp.sum(vv * z[cc], axis=0)
            return z * 0.9999 + y * 1e-9

        return jax.lax.fori_loop(0, iters, body, xx)

    from benchmarks.lane_bench import slope_time

    for W in (8, 45):
        vals = jnp.asarray(rng.standard_normal((W, N)), dtype=jnp.float32)
        for kind in ("random", "banded"):
            if kind == "random":
                cols = rng.integers(0, N, size=(W, N))
            else:
                # banded: cols within +-bw of the row (3D RCM bandwidth)
                bw = 24000
                base = np.arange(N)[None, :]
                cols = np.clip(
                    base + rng.integers(-bw, bw, size=(W, N)), 0, N - 1
                )
            cols = jnp.asarray(cols.astype(np.int32))
            per = slope_time(f"gather W={W} {kind}", chain, (vals, cols),
                             x, (8, 40), chunk=16)
            print(f"  {W*N/per/1e9:.2f} Gelem/s, "
                  f"{(vals.nbytes + cols.nbytes + W*N*4)/per/1e9:.0f} GB/s "
                  f"apparent", flush=True)


if __name__ == "__main__":
    main()
