"""Pallas kernels for the lane-partitioned layout.

Two primitives cover every irregular movement in unstructured FEM
assembly (gather to cells, scatter-add to nodes, copy owner-sum and
refresh):

- ``lane_gather``: windowed per-lane select — out[t,c,v,k,j] =
  values[c, starts[t]+idx[t,v,k,j], j]; loop over the WR window rows
  with vectorized compares (measured 27–94 Gelem/s on v5e,
  benchmarks/gather_kernel_probe4.py — ~300x the XLA gather ceiling).
- ``lane_scatter``: the transpose — iterates over *source* rows and
  compares each row's destination index against a K-iota, so the cost
  is sources x K, independent of per-destination valence.

Both stream their index blocks through VMEM via the grid pipeline and
DMA the value window from HBM with a scalar-prefetched start row.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N_LANES = 128


@functools.partial(
    jax.jit,
    static_argnames=("wr", "sum_v", "interpret"),
)
def lane_gather(values, starts, idx, *, wr: int, sum_v: bool = False,
                interpret: bool = False):
    """values (C, R, 128); starts (T,) int32 window row-starts (valid,
    pre-clamped); idx (T, V, K, 128) int32 in [-1, wr).

    Returns (T, C, V, K, 128), or (T, C, K, 128) summed over V when
    ``sum_v`` (sentinel -1 entries contribute 0).
    """
    C, R, L = values.shape
    T, V, K, _ = idx.shape
    out_chan = C if sum_v else C * V

    def kern(start_ref, idx_ref, v_hbm, o_ref, win, sem):
        t = pl.program_id(0)
        s = start_ref[t]
        dma = pltpu.make_async_copy(
            v_hbm.at[:, pl.ds(s, wr), :], win, sem
        )
        dma.start()
        dma.wait()
        ids = idx_ref[0].astype(jnp.int32)  # (V, K, 128)
        w = win[:]
        for c in range(C):
            if sum_v:
                acc = jnp.zeros((K, L), values.dtype)
                for r in range(wr):
                    cnt = jnp.zeros((K, L), values.dtype)
                    for v in range(V):
                        cnt = cnt + (ids[v] == r).astype(values.dtype)
                    acc = acc + w[c, r : r + 1, :] * cnt
                o_ref[0, c] = acc
            else:
                for v in range(V):
                    acc = jnp.zeros((K, L), values.dtype)
                    for r in range(wr):
                        acc = acc + jnp.where(
                            ids[v] == r, w[c, r : r + 1, :], 0.0
                        )
                    o_ref[0, c * V + v] = acc

    out = pl.pallas_call(
        kern,
        interpret=interpret,
        out_shape=jax.ShapeDtypeStruct((T, out_chan, K, L), values.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(T,),
            in_specs=[
                pl.BlockSpec((1, V, K, L), lambda t, s: (t, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec(
                (1, out_chan, K, L), lambda t, s: (t, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM((C, wr, L), values.dtype),
                pltpu.SemaphoreType.DMA(()),
            ],
        ),
    )(starts, idx, values)
    if sum_v:
        return out  # (T, C, K, 128)
    return out.reshape(T, C, V, K, L)


@functools.partial(
    jax.jit,
    static_argnames=("sk", "k_out", "interpret"),
)
def lane_scatter(src, starts, dest_idx, *, sk: int, k_out: int,
                 interpret: bool = False):
    """src (C, S, 128); starts (T,) int32 source-window row-starts;
    dest_idx (T, SK, 128) int32 in [-1, k_out).

    Returns (T, C, k_out, 128):
      out[t, c, kappa, j] = sum_{r: dest_idx[t,r,j]==kappa} src[c, starts[t]+r, j]
    """
    C, S, L = src.shape
    T, SK, _ = dest_idx.shape
    assert SK == sk

    def kern(start_ref, didx_ref, s_hbm, o_ref, win, sem):
        t = pl.program_id(0)
        s = start_ref[t]
        dma = pltpu.make_async_copy(
            s_hbm.at[:, pl.ds(s, sk), :], win, sem
        )
        dma.start()
        dma.wait()
        dk = didx_ref[0].astype(jnp.int32)  # (SK, 128)
        w = win[:]
        iota = jax.lax.broadcasted_iota(jnp.int32, (k_out, L), 0)
        for c in range(C):
            acc = jnp.zeros((k_out, L), src.dtype)
            for r in range(sk):
                acc = acc + jnp.where(
                    iota == dk[r : r + 1, :], w[c, r : r + 1, :], 0.0
                )
            o_ref[0, c] = acc

    return pl.pallas_call(
        kern,
        interpret=interpret,
        out_shape=jax.ShapeDtypeStruct((T, C, k_out, L), src.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(T,),
            in_specs=[
                pl.BlockSpec((1, SK, L), lambda t, s: (t, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec(
                (1, C, k_out, L), lambda t, s: (t, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM((C, sk, L), src.dtype),
                pltpu.SemaphoreType.DMA(()),
            ],
        ),
    )(starts, dest_idx, src)


@functools.partial(
    jax.jit,
    static_argnames=("wr", "interpret"),
)
def lane_gather_weighted(values, starts, idx, wts, *, wr: int,
                         interpret: bool = False):
    """Weighted windowed gather-sum:
      out[t, c, k, j] = sum_v wts[t,v,k,j] * values[c, starts[t]+idx[t,v,k,j], j]
    (idx = -1 entries skipped). The interpolation/prolongation primitive
    of the lane two-level preconditioner."""
    C, R, L = values.shape
    T, V, K, _ = idx.shape

    def kern(start_ref, idx_ref, w_ref, v_hbm, o_ref, win, sem):
        t = pl.program_id(0)
        dma = pltpu.make_async_copy(
            v_hbm.at[:, pl.ds(start_ref[t], wr), :], win, sem
        )
        dma.start()
        dma.wait()
        ids = idx_ref[0]  # (V, K, L)
        wv = w_ref[0]
        w = win[:]
        for c in range(C):
            acc = jnp.zeros((K, L), values.dtype)
            for r in range(wr):
                m = jnp.zeros((K, L), values.dtype)
                for v in range(V):
                    m = m + jnp.where(ids[v] == r, wv[v], 0.0)
                acc = acc + w[c, r : r + 1, :] * m
            o_ref[0, c] = acc

    return pl.pallas_call(
        kern,
        interpret=interpret,
        out_shape=jax.ShapeDtypeStruct((T, C, K, L), values.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(T,),
            in_specs=[
                pl.BlockSpec((1, V, K, L), lambda t, s: (t, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, V, K, L), lambda t, s: (t, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec(
                (1, C, K, L), lambda t, s: (t, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM((C, wr, L), values.dtype),
                pltpu.SemaphoreType.DMA(()),
            ],
        ),
    )(starts, idx, wts, values)


@functools.partial(
    jax.jit,
    static_argnames=("sk", "k_out", "n_dest", "interpret"),
)
def lane_scatter_weighted(src, starts, dest_idx, wts, *, sk: int,
                          k_out: int, n_dest: int,
                          interpret: bool = False):
    """Weighted multi-destination scatter (the transpose of
    lane_gather_weighted):
      out[t,c,kappa,j] += wts[t,d,r,j] * src[c, starts[t]+r, j]
        for every (d, r) with dest_idx[t,d,r,j] == kappa.
    dest_idx, wts: (T, n_dest, SK, 128)."""
    C, S, L = src.shape
    T, D, SK, _ = dest_idx.shape
    assert SK == sk and D == n_dest

    def kern(start_ref, didx_ref, w_ref, s_hbm, o_ref, win, sem):
        t = pl.program_id(0)
        dma = pltpu.make_async_copy(
            s_hbm.at[:, pl.ds(start_ref[t], sk), :], win, sem
        )
        dma.start()
        dma.wait()
        dk = didx_ref[0]  # (D, SK, L)
        wv = w_ref[0]
        w = win[:]
        iota = jax.lax.broadcasted_iota(jnp.int32, (k_out, L), 0)
        for c in range(C):
            acc = jnp.zeros((k_out, L), src.dtype)
            for r in range(sk):
                for d in range(n_dest):
                    acc = acc + jnp.where(
                        iota == dk[d, r : r + 1, :],
                        wv[d, r : r + 1, :] * w[c, r : r + 1, :],
                        0.0,
                    )
            o_ref[0, c] = acc

    return pl.pallas_call(
        kern,
        interpret=interpret,
        out_shape=jax.ShapeDtypeStruct((T, C, k_out, L), src.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(T,),
            in_specs=[
                pl.BlockSpec((1, D, SK, L), lambda t, s: (t, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, D, SK, L), lambda t, s: (t, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec(
                (1, C, k_out, L), lambda t, s: (t, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM((C, sk, L), src.dtype),
                pltpu.SemaphoreType.DMA(()),
            ],
        ),
    )(starts, dest_idx, wts, src)
