"""Honest TPU gather-rate probes (chained + materialized).

Determines the assembly optimization strategy: the chained fori_loop
keeps every iteration data-dependent, and a host materialization closes
the timing — see memory/axon-tpu-runtime-gotchas.md for why nothing
weaker can be trusted on this runtime.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")


def chain_time(label, make_body, x0, n_work, reps0=2, reps1=12):
    @jax.jit
    def chain(x, iters):
        return jax.lax.fori_loop(0, iters, make_body(), x)

    x = chain(x0, 1)
    float(np.asarray(x).ravel()[0])
    t0 = time.perf_counter()
    x = chain(x0, reps0)
    float(np.asarray(x).ravel()[0])
    ta = time.perf_counter() - t0
    t0 = time.perf_counter()
    x = chain(x0, reps1)
    float(np.asarray(x).ravel()[0])
    tb = time.perf_counter() - t0
    per = max(tb - ta, 1e-9) / (reps1 - reps0)
    print(
        f"{label}: {per*1e3:8.3f} ms/iter -> {n_work/per/1e6:9.1f} M/s",
        flush=True,
    )
    return per


def main():
    rng = np.random.default_rng(0)
    N = 1_000_000
    M = 1_572_864

    # 1) random flat gather: out[i] = t[idx[i]]
    idx = jnp.asarray(rng.integers(0, N, M, dtype=np.int32))
    t = jnp.asarray(rng.normal(size=N).astype(np.float32))

    def body_gather():
        def b(_, x):
            return x.at[:].set(x[idx[:N]] * 0.999 + 1e-6)
        return b

    chain_time("flat gather N->N  ", body_gather, t, N)

    # 2) gather (K, N) + sum axis 0 (the assembly reduce shape)
    K = 8
    ridx = jnp.asarray(rng.integers(0, N, (K, N), dtype=np.int32))

    def body_reduce():
        def b(_, x):
            return jnp.sum(x[ridx], axis=0) * 0.12 + 1e-6
        return b

    chain_time("reduce (8,N)+sum0 ", body_reduce, t, K * N)

    # 3) sorted-ish gather (RCM-like locality: idx = i + small jitter)
    loc = np.clip(
        np.arange(N) + rng.integers(-512, 512, N), 0, N - 1
    ).astype(np.int32)
    lidx = jnp.asarray(loc)

    def body_local():
        def b(_, x):
            return x[lidx] * 0.999 + 1e-6
        return b

    chain_time("local gather ±512 ", body_local, t, N)

    # 4) pure elementwise (bandwidth reference)
    def body_ew():
        def b(_, x):
            return x * 0.999 + 1e-6
        return b

    chain_time("elementwise       ", body_ew, t, N)

    # 5) contiguous slice-shift (structured-mesh reference)
    def body_shift():
        def b(_, x):
            return (
                x * 0.5
                + jnp.roll(x, 1) * 0.25
                + jnp.roll(x, -1) * 0.25
                + 1e-6
            )
        return b

    chain_time("roll stencil      ", body_shift, t, 3 * N)


if __name__ == "__main__":
    main()
