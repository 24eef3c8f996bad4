"""Probe: which in-kernel gather formulation is fastest on this TPU.

Decides the unstructured-assembly kernel design (VERDICT round-2 item 3):
the XLA gather ceiling measured in round 1 was ~130M elem/s, far below
the >=1 GDoF/s unstructured assembly target. Candidates:

  A. XLA flat gather (baseline, the ceiling we want to break)
  B. Pallas: sublane dynamic-gather (take_along_axis axis=0) + one-hot
     lane select, inside VMEM windows
  C. Pallas: one-hot MXU row-matmul + one-hot lane select (guaranteed
     lowerable: only matmul + compare + reduce)

All candidates gather M elements out of an N-element f32 array through
*windowed* indices (each tile of K indices hits a W-wide window — the
post-RCM locality structure of FEM dofmaps). Source array lives as
(N/128, 128) rows; window = WR rows of 128.

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

if INTERPRET:  # tiny shapes for CPU-interpret correctness runs
    N = 32 * 1024
    T = 4
    K = 1024
else:
    N = 2 * 1024 * 1024  # source elements
    T = 1024  # tiles
    K = 8192  # gathered elements per tile
NR = N // 128  # source rows
WR = 16  # window rows (W = 2048 elements)
W = WR * 128
KS = 512  # sub-block
M = T * K  # total gathers per iteration (8.4M full-size)


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


def make_pallas(kernel):
    return pl.pallas_call(
        kernel,
        interpret=INTERPRET,
        out_shape=jax.ShapeDtypeStruct((T, 1), jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,  # row starts
            grid=(T,),
            in_specs=[
                pl.BlockSpec((1, K), lambda t, s: (t, 0),
                             memory_space=pltpu.VMEM),  # local idx
                pl.BlockSpec(memory_space=pltpu.ANY),  # x rows (NR, 128)
            ],
            out_specs=pl.BlockSpec((1, 1), lambda t, s: (t, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((WR, 128), jnp.float32),
                pltpu.SemaphoreType.DMA(()),
            ],
        ),
    )


def kern_taa(start_ref, idx_ref, x_hbm, o_ref, win, sem):
    t = pl.program_id(0)
    s = start_ref[t]
    dma = pltpu.make_async_copy(x_hbm.at[pl.ds(s, WR), :], win, sem)
    dma.start()
    dma.wait()
    idx = idx_ref[0, :]  # (K,) local in [0, W)
    total = jnp.zeros((), jnp.float32)
    parts = []
    for b in range(K // KS):
        ids = idx[b * KS : (b + 1) * KS]
        rows = ids // 128  # (KS,)
        lanes = ids % 128
        ridx = jnp.broadcast_to(rows[:, None], (KS, 128))
        tmp = jnp.take_along_axis(win[:], ridx, axis=0)  # (KS, 128)
        oh_c = (
            jax.lax.broadcasted_iota(jnp.int32, (KS, 128), 1)
            == lanes[:, None]
        )
        parts.append(jnp.sum(jnp.where(oh_c, tmp, 0.0)))
    o_ref[0, 0] = sum(parts)


def kern_onehot(start_ref, idx_ref, x_hbm, o_ref, win, sem):
    t = pl.program_id(0)
    s = start_ref[t]
    dma = pltpu.make_async_copy(x_hbm.at[pl.ds(s, WR), :], win, sem)
    dma.start()
    dma.wait()
    idx = idx_ref[0, :]
    parts = []
    for b in range(K // KS):
        ids = idx[b * KS : (b + 1) * KS]
        rows = ids // 128
        lanes = ids % 128
        oh_r = (
            jax.lax.broadcasted_iota(jnp.int32, (KS, WR), 1) == rows[:, None]
        ).astype(jnp.float32)
        tmp = jax.lax.dot_general(
            oh_r, win[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (KS, 128) = rows selected
        oh_c = (
            jax.lax.broadcasted_iota(jnp.int32, (KS, 128), 1)
            == lanes[:, None]
        )
        parts.append(jnp.sum(jnp.where(oh_c, tmp, 0.0)))
    o_ref[0, 0] = sum(parts)


def main():
    rng = np.random.default_rng(0)
    # window row-starts (multiples of rows): tile t covers rows
    # [rs[t], rs[t]+WR)
    D = (NR - WR) // (T - 1)
    rstarts = (np.arange(T) * D).astype(np.int32)
    local = rng.integers(0, W, (T, K), dtype=np.int32)
    gidx = rstarts[:, None].astype(np.int64) * 128 + local

    xnp = rng.normal(size=N).astype(np.float32)
    x0 = jnp.asarray(xnp)
    gidx_j = jnp.asarray(gidx.ravel())
    local_j = jnp.asarray(local)
    rstarts_j = jnp.asarray(rstarts)

    expect = xnp[gidx.ravel()].reshape(T, K).sum(axis=1)

    # ---- A. XLA flat gather ----
    def gather_xla(x):
        return jnp.sum(x[gidx_j].reshape(T, K), axis=1)

    def body_xla(_, x):
        s = gather_xla(x)
        return x * 0.9999 + jnp.pad(s, (0, N - T)) * 1e-9

    correctness(jax.jit(gather_xla), x0, expect, "A")
    chain_time("A xla flat gather     ", body_xla, x0, M)

    # ---- B. take_along_axis ----
    pb = make_pallas(kern_taa)

    def gather_taa(x):
        return pb(rstarts_j, local_j, x.reshape(NR, 128))[:, 0]

    def body_taa(_, x):
        s = gather_taa(x)
        return x * 0.9999 + jnp.pad(s, (0, N - T)) * 1e-9

    try:
        correctness(jax.jit(gather_taa), x0, expect, "B")
        chain_time("B pallas take_along   ", body_taa, x0, M)
    except Exception as e:
        print(f"B pallas take_along    FAILED: {type(e).__name__}: {e}"[:600],
              flush=True)

    # ---- C. one-hot MXU ----
    pc = make_pallas(kern_onehot)

    def gather_oh(x):
        return pc(rstarts_j, local_j, x.reshape(NR, 128))[:, 0]

    def body_oh(_, x):
        s = gather_oh(x)
        return x * 0.9999 + jnp.pad(s, (0, N - T)) * 1e-9

    try:
        correctness(jax.jit(gather_oh), x0, expect, "C")
        chain_time("C pallas one-hot mxu  ", body_oh, x0, M)
    except Exception as e:
        print(f"C pallas one-hot mxu   FAILED: {type(e).__name__}: {e}"[:600],
              flush=True)


if __name__ == "__main__":
    main()
