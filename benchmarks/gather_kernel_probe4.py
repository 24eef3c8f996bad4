"""Gather probe round 4: slope-protocol (reps 512 vs 2048) measurement
of the select-window kernel at WR=16/32/64, with int32 vs int8 indices.

Round-3 finding (slope-corrected): select-16 runs at ~63 Gelem/s —
~300x the XLA gather ceiling — and is partially bound by streaming the
int32 index blocks (33.5 MB per 8.4M gathers). int8 offsets cut that
4x. These numbers size the lane-partitioned unstructured assembly
design (VERDICT round-2 item 3).
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
    R0, R1 = 2, 6
else:
    NR, T, KR = 16 * 1024, 256, 256
    R0, R1 = 512, 2048
N = NR * 128
M = T * KR * 128


def slope_time(label, body, x0, n_work):
    @jax.jit
    def chain(x, iters):
        return jax.lax.fori_loop(0, iters, body, x)

    x = chain(x0, 1)
    float(np.asarray(x).ravel()[0])

    def run(reps):
        t0 = time.perf_counter()
        x = chain(x0, reps)
        float(np.asarray(x).ravel()[0])
        return time.perf_counter() - t0

    ta = run(R0)
    tb = run(R1)
    per = max(tb - ta, 1e-9) / (R1 - R0)
    print(
        f"{label}: {per*1e3:8.4f} ms/iter -> {n_work/per/1e9:7.2f} G elem/s",
        flush=True,
    )
    return per


rng = np.random.default_rng(0)
xnp = rng.normal(size=(NR, 128)).astype(np.float32)
x0 = jnp.asarray(xnp.ravel())


def fold(x, s):
    return x * 0.9999 + jnp.pad(s.ravel(), (0, N - s.size)) * 1e-9


def make_select(WR, idx_dtype):
    def kern(start_ref, idx_ref, x_hbm, o_ref, win, sem):
        t = pl.program_id(0)
        dma = pltpu.make_async_copy(
            x_hbm.at[pl.ds(start_ref[t], WR), :], win, sem
        )
        dma.start()
        dma.wait()
        idx = idx_ref[0].astype(jnp.int32)
        acc = jnp.zeros((KR, 128), jnp.float32)
        w = win[:]
        for r in range(WR):
            acc = acc + jnp.where(idx == r, w[r : r + 1, :], 0.0)
        o_ref[0, :, :] = jnp.broadcast_to(
            jnp.sum(acc, axis=0, keepdims=True), (8, 128)
        )

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
                pltpu.VMEM((WR, 128), jnp.float32),
                pltpu.SemaphoreType.DMA(()),
            ],
        ),
    )


for WR in (16, 32, 64):
    for dt, nm in ((np.int32, "i32"), (np.int8, "i8 ")):
        if WR > 127 and dt == np.int8:
            continue
        try:
            pk = make_select(WR, dt)
            rs = np.minimum(
                np.arange(T) * max((NR - WR) // max(T - 1, 1), 1), NR - WR
            ).astype(np.int32)
            li = rng.integers(0, WR, (T, KR, 128)).astype(dt)
            rj, lj = jnp.asarray(rs), jnp.asarray(li)

            def g(x, pk=pk, rj=rj, lj=lj):
                return pk(rj, lj, x.reshape(NR, 128))[:, 0, :]

            slope_time(f"select WR={WR:3d} idx={nm}",
                       lambda _, x: fold(x, g(x)), x0, M)
        except Exception as e:
            print(f"WR={WR} {nm} FAILED: {type(e).__name__}: {e}"[:300],
                  flush=True)
