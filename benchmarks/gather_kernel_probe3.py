"""Gather probe round 3: long-chain re-measurement of the Pallas
variants whose deltas were below tunnel noise (memory gotcha #2: chain
length must be LONG for sub-ms kernels).

  F. lane shuffle (take_along_axis axis=1)  — 512 chained reps
  G. select-loop WR=16/32/64                — 512 chained reps
  K. empty pallas grid-step overhead probe  — measures per-step cost
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
    NR, T, KR = 256, 4, 8
    REPS = (2, 6)
else:
    NR, T, KR = 16 * 1024, 256, 256
    REPS = (8, 520)
N = NR * 128
M = T * KR * 128


def chain_time(label, body, x0, n_work):
    reps0, reps1 = REPS

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
        f"{label}: {per*1e3:8.4f} ms/iter -> {n_work/per/1e6:9.1f} M elem/s",
        flush=True,
    )
    return per


rng = np.random.default_rng(0)
xnp = rng.normal(size=(NR, 128)).astype(np.float32)
x0 = jnp.asarray(xnp.ravel())


def fold(x, s):
    return x * 0.9999 + jnp.pad(s.ravel(), (0, N - s.size)) * 1e-9


def build(kern, WR, n_scratch_rows):
    return pl.pallas_call(
        kern,
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
                pltpu.VMEM((n_scratch_rows, 128), jnp.float32),
                pltpu.SemaphoreType.DMA(()),
            ],
        ),
    )


def starts_for(WR):
    return np.minimum(
        np.arange(T) * max((NR - WR) // max(T - 1, 1), 1), NR - WR
    ).astype(np.int32)


# F: lane shuffle
def kern_lane(start_ref, idx_ref, x_hbm, o_ref, win, sem):
    t = pl.program_id(0)
    dma = pltpu.make_async_copy(x_hbm.at[pl.ds(start_ref[t], KR), :], win,
                                sem)
    dma.start()
    dma.wait()
    g = jnp.take_along_axis(win[:], idx_ref[0], axis=1)
    o_ref[0, :, :] = jnp.broadcast_to(
        jnp.sum(g, axis=0, keepdims=True), (8, 128)
    )


try:
    pk = build(kern_lane, KR, KR)
    rj = jnp.asarray(starts_for(KR))
    lj = jnp.asarray(rng.integers(0, 128, (T, KR, 128), dtype=np.int32))

    def gf(x):
        return pk(rj, lj, x.reshape(NR, 128))[:, 0, :]

    chain_time("F lane shuffle (long)   ", lambda _, x: fold(x, gf(x)),
               x0, M)
except Exception as e:
    print(f"F FAILED: {type(e).__name__}: {e}"[:300], flush=True)


# G: select-loop
def make_select(WR):
    def kern(start_ref, idx_ref, x_hbm, o_ref, win, sem):
        t = pl.program_id(0)
        dma = pltpu.make_async_copy(
            x_hbm.at[pl.ds(start_ref[t], WR), :], win, sem
        )
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

    return build(kern, WR, WR)


for WR in (16, 32, 64):
    try:
        pk = make_select(WR)
        rj = jnp.asarray(starts_for(WR))
        lj = jnp.asarray(rng.integers(0, WR, (T, KR, 128), dtype=np.int32))

        def gs(x, pk=pk, rj=rj, lj=lj):
            return pk(rj, lj, x.reshape(NR, 128))[:, 0, :]

        chain_time(f"G select WR={WR:3d} (long)  ",
                   lambda _, x: fold(x, gs(x)), x0, M)
    except Exception as e:
        print(f"G WR={WR} FAILED: {type(e).__name__}: {e}"[:300], flush=True)


# K: near-empty kernel — per-grid-step overhead
def kern_empty(start_ref, idx_ref, x_hbm, o_ref, win, sem):
    o_ref[0, :, :] = idx_ref[0, :8, :].astype(jnp.float32)


try:
    pk = build(kern_empty, 8, 8)
    rj = jnp.asarray(starts_for(8))
    lj = jnp.asarray(rng.integers(0, 8, (T, KR, 128), dtype=np.int32))

    def ge(x):
        return pk(rj, lj, x.reshape(NR, 128))[:, 0, :]

    per = chain_time("K empty grid (overhead) ",
                     lambda _, x: fold(x, ge(x)), x0, M)
    print(f"   -> per-grid-step overhead ~ {per/T*1e6:.1f} us", flush=True)
except Exception as e:
    print(f"K FAILED: {type(e).__name__}: {e}"[:300], flush=True)
