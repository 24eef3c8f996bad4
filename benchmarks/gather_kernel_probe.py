"""Probe: which in-kernel gather formulation is fastest on this TPU.

Decides the unstructured-assembly kernel design (VERDICT round-2 item 3):
the XLA gather ceiling measured in round 1 was ~130-180M elem/s, far
below the >=1 GDoF/s unstructured assembly target.

The candidate TPU-native layout is **lane-partitioned SPMD**: nodes are
split into 128 groups (one per vector lane, SFC-contiguous); lane j's
solution values live in column j of a (rows, 128) slab; every gather is
then *within a lane* — out[i, j] = win[idx[i, j], j] — which is exactly
`jnp.take_along_axis(win, idx, axis=0)`, the hardware sublane shuffle.
Cells straddling groups are handled by halo duplication at setup time
(same owner/ghost structure as the device-level partition, one level
down).

Variants:
  A. XLA flat gather (baseline ceiling)
  A2. XLA take_along_axis on (rows,128) whole-array (no Pallas)
  D. Pallas take_along_axis within a WR-row VMEM window, WR=16/512
  E. Pallas select-loop over window rows (guaranteed lowering), WR=16

Timing per memory/axon-tpu-runtime-gotchas.md: chained fori_loop, host
materialization, long-chain differencing.
"""

import os
import time

import jax

if os.environ.get("PROBE_CPU") == "1":
    jax.config.update("jax_platforms", "cpu")
INTERPRET = os.environ.get("PROBE_CPU") == "1"

import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

if INTERPRET:
    NR = 256  # source rows (x is (NR, 128))
    T = 4
    KR = 8  # gathered rows per tile
else:
    NR = 16 * 1024  # 2.1M source elements
    T = 256
    KR = 256  # 32k gathers per tile -> 8.4M total
N = NR * 128
M = T * KR * 128


def chain_time(label, body, x0, n_work, reps0=3, reps1=33):
    @jax.jit
    def chain(x, iters):
        return jax.lax.fori_loop(0, iters, body, x)

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
        f"{label}: {per*1e3:8.3f} ms/iter -> {n_work/per/1e6:9.1f} M elem/s",
        flush=True,
    )
    return per


def correctness(fn, x, expect, label):
    got = np.asarray(fn(x))
    err = np.abs(got - expect).max() / max(np.abs(expect).max(), 1e-30)
    print(f"{label} correctness: rel err {err:.2e}", flush=True)


def make_probe(WR):
    """Per-lane windowed gather kernel: tile t DMAs WR rows starting at
    rstart[t], gathers (KR,128) elements per-lane, reduces to (1,128)."""

    def kern(start_ref, idx_ref, x_hbm, o_ref, win, sem):
        t = pl.program_id(0)
        s = start_ref[t]
        dma = pltpu.make_async_copy(x_hbm.at[pl.ds(s, WR), :], win, sem)
        dma.start()
        dma.wait()
        idx = idx_ref[0]  # (KR, 128) local row index in [0, WR)
        g = jnp.take_along_axis(win[:], idx, axis=0)  # (KR, 128)
        o_ref[0, :, :] = jnp.broadcast_to(
            jnp.sum(g, axis=0, keepdims=True), (8, 128)
        )

    def kern_select(start_ref, idx_ref, x_hbm, o_ref, win, sem):
        t = pl.program_id(0)
        s = start_ref[t]
        dma = pltpu.make_async_copy(x_hbm.at[pl.ds(s, WR), :], win, sem)
        dma.start()
        dma.wait()
        idx = idx_ref[0]
        acc = jnp.zeros((KR, 128), jnp.float32)
        w = win[:]
        for r in range(WR):
            acc = acc + jnp.where(idx == r, w[r : r + 1, :], 0.0)
        o_ref[0, :, :] = jnp.broadcast_to(
            jnp.sum(acc, axis=0, keepdims=True), (8, 128)
        )

    def build(kernel):
        return pl.pallas_call(
            kernel,
            interpret=INTERPRET,
            out_shape=jax.ShapeDtypeStruct((T, 8, 128), jnp.float32),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(T,),
                in_specs=[
                    pl.BlockSpec((1, KR, 128), lambda t, s: (t, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.ANY),
                ],
                out_specs=pl.BlockSpec((1, 8, 128), lambda t, s: (t, 0, 0),
                                       memory_space=pltpu.VMEM),
                scratch_shapes=[
                    pltpu.VMEM((WR, 128), jnp.float32),
                    pltpu.SemaphoreType.DMA(()),
                ],
            ),
        )

    return build(kern), build(kern_select)


def main():
    rng = np.random.default_rng(0)
    xnp = rng.normal(size=(NR, 128)).astype(np.float32)
    x0 = jnp.asarray(xnp.ravel())

    def run_variant(WR, with_select=False):
        if WR > NR:
            return
        D = max((NR - WR) // max(T - 1, 1), 1)
        rstarts = np.minimum(np.arange(T) * D, NR - WR).astype(np.int32)
        local = rng.integers(0, WR, (T, KR, 128), dtype=np.int32)
        # expected per-tile per-lane sums
        exp = np.zeros((T, 128), np.float32)
        for t in range(T):
            win = xnp[rstarts[t] : rstarts[t] + WR]
            exp[t] = np.take_along_axis(win, local[t], axis=0).sum(axis=0)
        pk, ps = make_probe(WR)
        rj = jnp.asarray(rstarts)
        lj = jnp.asarray(local)

        def g_taa(x):
            return pk(rj, lj, x.reshape(NR, 128))[:, 0, :]

        def body_taa(_, x):
            s = g_taa(x)
            return x * 0.9999 + jnp.pad(s.ravel(), (0, N - T * 128)) * 1e-9

        try:
            correctness(jax.jit(g_taa), x0, exp, f"D WR={WR} take_along")
            chain_time(f"D pallas take_along WR={WR:4d}", body_taa, x0, M)
        except Exception as e:
            print(f"D WR={WR} FAILED: {type(e).__name__}: {e}"[:600],
                  flush=True)
        if with_select:
            def g_sel(x):
                return ps(rj, lj, x.reshape(NR, 128))[:, 0, :]

            def body_sel(_, x):
                s = g_sel(x)
                return x * 0.9999 + jnp.pad(
                    s.ravel(), (0, N - T * 128)
                ) * 1e-9

            try:
                correctness(jax.jit(g_sel), x0, exp, f"E WR={WR} select")
                chain_time(f"E pallas select     WR={WR:4d}", body_sel, x0, M)
            except Exception as e:
                print(f"E WR={WR} FAILED: {type(e).__name__}: {e}"[:600],
                      flush=True)

    # ---- A. XLA flat gather baseline ----
    gidx = rng.integers(0, N, M, dtype=np.int32)
    gj = jnp.asarray(gidx)

    def body_xla(_, x):
        g = x[gj]
        s = jnp.sum(g.reshape(-1, 128), axis=0)
        return x * 0.9999 + jnp.pad(s, (0, N - 128)) * 1e-9

    chain_time("A xla flat gather          ", body_xla, x0, M)

    # ---- A2. XLA take_along_axis whole-array ----
    tidx = jnp.asarray(rng.integers(0, NR, (T * KR, 128), dtype=np.int32))

    def body_taa_xla(_, x):
        g = jnp.take_along_axis(x.reshape(NR, 128), tidx, axis=0)
        s = jnp.sum(g, axis=0)
        return x * 0.9999 + jnp.pad(s, (0, N - 128)) * 1e-9

    chain_time("A2 xla take_along whole    ", body_taa_xla, x0, M)

    run_variant(16, with_select=True)
    run_variant(512)
    run_variant(2048)


if __name__ == "__main__":
    main()
