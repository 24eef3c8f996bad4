"""Gather probe round 2: which irregular-movement primitive can beat
~0.5 Gelem/s on this chip.

  F. Pallas take_along_axis axis=1 (lane shuffle) — is the cross-lane
     dynamic shuffle supported / fast? (the Benes-network building block)
  G. select-loop scaling: WR = 32 / 64 windows
  H. one-hot MXU gather with bf16 hi/lo split values, N=128 batched
     columns (the s-step/multi-vector shape)
  I. XLA sorted gather (monotone non-decreasing indices, dup<=8)
  J. XLA row-pair gather u2d (N,2)[idx]

Timing protocol per memory/axon-tpu-runtime-gotchas.md.
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
else:
    NR, T, KR = 16 * 1024, 256, 256
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


rng = np.random.default_rng(0)
xnp = rng.normal(size=(NR, 128)).astype(np.float32)
x0 = jnp.asarray(xnp.ravel())


def out_spec():
    return pl.BlockSpec((1, 8, 128), lambda t, s: (t, 0, 0),
                        memory_space=pltpu.VMEM)


def fold(x, s):
    return x * 0.9999 + jnp.pad(s.ravel(), (0, N - s.size)) * 1e-9


# ---- F. lane shuffle: out[i, j] = blk[i, idx[i, j]] -------------------------
def kern_lane(start_ref, idx_ref, x_hbm, o_ref, win, sem):
    t = pl.program_id(0)
    s = start_ref[t]
    dma = pltpu.make_async_copy(x_hbm.at[pl.ds(s, KR), :], win, sem)
    dma.start()
    dma.wait()
    idx = idx_ref[0]  # (KR, 128) lane indices in [0, 128)
    g = jnp.take_along_axis(win[:], idx, axis=1)  # (KR, 128)
    o_ref[0, :, :] = jnp.broadcast_to(
        jnp.sum(g, axis=0, keepdims=True), (8, 128)
    )


def probe_lane():
    pk = pl.pallas_call(
        kern_lane,
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
            out_specs=out_spec(),
            scratch_shapes=[
                pltpu.VMEM((KR, 128), jnp.float32),
                pltpu.SemaphoreType.DMA(()),
            ],
        ),
    )
    rstarts = np.minimum(
        np.arange(T) * max((NR - KR) // max(T - 1, 1), 1), NR - KR
    ).astype(np.int32)
    lidx = rng.integers(0, 128, (T, KR, 128), dtype=np.int32)
    exp = np.zeros((T, 128), np.float32)
    for t in range(T):
        blk = xnp[rstarts[t] : rstarts[t] + KR]
        exp[t] = np.take_along_axis(blk, lidx[t], axis=1).sum(axis=0)
    rj, lj = jnp.asarray(rstarts), jnp.asarray(lidx)

    def g(x):
        return pk(rj, lj, x.reshape(NR, 128))[:, 0, :]

    got = np.asarray(jax.jit(g)(x0))
    err = np.abs(got - exp).max() / np.abs(exp).max()
    print(f"F lane-shuffle correctness: rel err {err:.2e}", flush=True)
    chain_time("F pallas lane shuffle      ",
               lambda _, x: fold(x, g(x)), x0, M)


try:
    probe_lane()
except Exception as e:
    print(f"F lane shuffle FAILED: {type(e).__name__}: {e}"[:400], flush=True)


# ---- G. select-loop WR=32/64 ------------------------------------------------
def probe_select(WR):
    def kern(start_ref, idx_ref, x_hbm, o_ref, win, sem):
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

    pk = pl.pallas_call(
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
            out_specs=out_spec(),
            scratch_shapes=[
                pltpu.VMEM((WR, 128), jnp.float32),
                pltpu.SemaphoreType.DMA(()),
            ],
        ),
    )
    rstarts = np.minimum(
        np.arange(T) * max((NR - WR) // max(T - 1, 1), 1), NR - WR
    ).astype(np.int32)
    lidx = rng.integers(0, WR, (T, KR, 128), dtype=np.int32)
    rj, lj = jnp.asarray(rstarts), jnp.asarray(lidx)

    def g(x):
        return pk(rj, lj, x.reshape(NR, 128))[:, 0, :]

    chain_time(f"G pallas select WR={WR:3d}      ",
               lambda _, x: fold(x, g(x)), x0, M)


for WR in (32, 64):
    try:
        probe_select(WR)
    except Exception as e:
        print(f"G WR={WR} FAILED: {type(e).__name__}: {e}"[:300], flush=True)


# ---- H. one-hot MXU, 128 batched columns ------------------------------------
# gather the same (K, W) pattern out of a (W, 128) value panel: the
# s-step-CG / multi-RHS shape. W=512 window, K=512 rows per block.
def probe_onehot():
    W, K = (128, 64) if INTERPRET else (512, 512)
    TT = max(M // (K * 128), 1)

    def kern(start_ref, idx_ref, x_hbm, o_ref, win, sem):
        t = pl.program_id(0)
        s = start_ref[t]
        dma = pltpu.make_async_copy(x_hbm.at[pl.ds(s, W), :], win, sem)
        dma.start()
        dma.wait()
        ids = idx_ref[0]  # (K,) in SMEM? -> use VMEM (K,128)? keep (8,K)
        iota = jax.lax.broadcasted_iota(jnp.int32, (K, W), 1)
        oh = (iota == ids[0][:, None]).astype(jnp.bfloat16)
        w = win[:]
        hi = w.astype(jnp.bfloat16)
        lo = (w - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        g = jax.lax.dot_general(
            oh, hi, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + jax.lax.dot_general(
            oh, lo, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (K, 128)
        o_ref[0, :, :] = jnp.broadcast_to(
            jnp.sum(g, axis=0, keepdims=True), (8, 128)
        )

    pk = pl.pallas_call(
        kern,
        interpret=INTERPRET,
        out_shape=jax.ShapeDtypeStruct((TT, 8, 128), jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(TT,),
            in_specs=[
                pl.BlockSpec((1, 8, K), lambda t, s: (t, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=pl.BlockSpec((1, 8, 128), lambda t, s: (t, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((W, 128), jnp.float32),
                pltpu.SemaphoreType.DMA(()),
            ],
        ),
    )
    rstarts = np.minimum(
        np.arange(TT) * max((NR - W) // max(TT - 1, 1), 1), NR - W
    ).astype(np.int32)
    lidx = rng.integers(0, W, (TT, 8, K), dtype=np.int32)
    rj, lj = jnp.asarray(rstarts), jnp.asarray(lidx)

    def g(x):
        return pk(rj, lj, x.reshape(NR, 128))[:, 0, :]

    # correctness
    exp = np.zeros((TT, 128), np.float32)
    for t in range(TT):
        w = xnp[rstarts[t] : rstarts[t] + W]
        exp[t] = w[lidx[t, 0]].sum(axis=0)
    got = np.asarray(jax.jit(g)(x0))
    err = np.abs(got - exp).max() / np.abs(exp).max()
    print(f"H one-hot bf16x2 correctness: rel err {err:.2e}", flush=True)
    n_work = TT * K * 128  # gathered elements (K rows x 128 panel cols)
    chain_time("H one-hot mxu W=512 N=128  ",
               lambda _, x: fold(x, g(x)), x0, n_work)


try:
    probe_onehot()
except Exception as e:
    print(f"H one-hot FAILED: {type(e).__name__}: {e}"[:400], flush=True)


# ---- I. XLA sorted gather ----------------------------------------------------
src = np.sort(rng.integers(0, N, M).astype(np.int32))
sj = jnp.asarray(src)


def body_sorted(_, x):
    g = x[sj]
    return fold(x, jnp.sum(g.reshape(-1, 128), axis=0))


chain_time("I xla sorted gather        ",
           body_sorted, x0, M)

# ---- J. XLA row-pair gather ---------------------------------------------------
ridx = jnp.asarray(rng.integers(0, N // 2, M // 2).astype(np.int32))


def body_rows(_, x):
    g = x.reshape(N // 2, 2)[ridx]  # (M/2, 2)
    return fold(x, jnp.sum(g.reshape(-1, 128), axis=0))


chain_time("J xla row-pair gather      ",
           body_rows, x0, M)
