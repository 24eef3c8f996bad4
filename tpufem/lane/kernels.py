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
import numpy as np
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
    static_argnames=("wr", "n_ch", "interpret"),
)
def lane_gather_cm(values, starts, idx, *, wr: int, n_ch: int,
                   interpret: bool = False):
    """Cells-minor windowed gather: like :func:`lane_gather` but the
    output is laid out (V*C, T, K, 128) with dof row v*C+c leading, so
    the (nd, M) cells-minor view the physics vmaps over is a FREE
    reshape (lane_gather's (T, C, V, K, 128) layout needs a ~50 MB HBM
    transpose at 2M cells)."""
    C, R, L = values.shape
    T, V, K, _ = idx.shape
    assert n_ch == C * V

    def kern(start_ref, idx_ref, v_hbm, o_ref, win, sem):
        t = pl.program_id(0)
        dma = pltpu.make_async_copy(
            v_hbm.at[:, pl.ds(start_ref[t], wr), :], win, sem
        )
        dma.start()
        dma.wait()
        ids = idx_ref[0].astype(jnp.int32)  # (V, K, L)
        w = win[:]
        for v in range(V):
            accs = [jnp.zeros((K, L), values.dtype) for _ in range(C)]
            # channel-invariant mask hoisted out of the c loop
            for r in range(wr):
                m = ids[v] == r
                for c in range(C):
                    accs[c] = accs[c] + jnp.where(
                        m, w[c, r : r + 1, :], 0.0
                    )
            for c in range(C):
                o_ref[v * C + c, 0] = accs[c]

    return pl.pallas_call(
        kern,
        interpret=interpret,
        out_shape=jax.ShapeDtypeStruct((V * C, T, K, L), values.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(T,),
            in_specs=[
                pl.BlockSpec((1, V, K, L), lambda t, s: (t, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec(
                (V * C, 1, K, L), lambda t, s: (0, t, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM((C, wr, L), values.dtype),
                pltpu.SemaphoreType.DMA(()),
            ],
        ),
    )(starts, idx, values)


@functools.partial(
    jax.jit,
    static_argnames=("k_out", "n_ch", "interpret"),
)
def lane_scatter_cm(src, idx, *, k_out: int, n_ch: int,
                    interpret: bool = False):
    """Cells-minor bin scatter: src (V*C, T, K, 128) element vectors
    (dof row v*C+c — the layout the physics writes), idx = the SAME
    (T, V, K, 128) gather table. Returns bin partials (C, T, k_out, 128)
    (channel-leading, so the owner/refresh stage needs no transpose):
      out[c,t,r,j] = sum_{v,k: idx[t,v,k,j]==r} src[v*C+c, t, k, j]
    """
    ND, T, K, L = src.shape
    _, V, _, _ = idx.shape
    C = ND // V
    assert n_ch == C

    def kern(idx_ref, src_ref, o_ref):
        ids = idx_ref[0].astype(jnp.int32)  # (V, K, L)
        iota = jax.lax.broadcasted_iota(jnp.int32, (k_out, L), 0)
        accs = [jnp.zeros((k_out, L), src.dtype) for _ in range(C)]
        for v in range(V):
            svs = [src_ref[v * C + c, 0] for c in range(C)]  # (K, L)
            # one one-hot per (v, k), shared by the C channels
            for k in range(K):
                m = iota == ids[v, k : k + 1, :]
                for c in range(C):
                    accs[c] = accs[c] + jnp.where(
                        m, svs[c][k : k + 1, :], 0.0
                    )
        for c in range(C):
            o_ref[c, 0] = accs[c]

    return pl.pallas_call(
        kern,
        interpret=interpret,
        out_shape=jax.ShapeDtypeStruct((C, T, k_out, L), src.dtype),
        grid=(T,),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        in_specs=[
            pl.BlockSpec((1, V, K, L), lambda t: (t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ND, 1, K, L), lambda t: (0, t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (C, 1, k_out, L), lambda t: (0, t, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    )(idx, src)


@functools.partial(
    jax.jit,
    static_argnames=("wrs", "wg", "shifts", "head", "interpret"),
)
def lane_pass_update(values, starts, idx, *, wrs, wg: int, shifts,
                     head: bool, interpret: bool = False):
    """All owner-sum (resp. refresh) passes in ONE kernel, fused with
    the bin-block update. Per pass p and bin t:

      acc[c,k,j] = sum_p sum_r (idx[p,t,k,j]==r)
                   * values[c, starts[p,t]+r, (j - shifts[p]) mod 128]

    and the output is the per-bin block of ``values`` updated in place:
    ``head=True`` (owner-sum) ADDS acc into the first K rows of each wg
    window; ``head=False`` (refresh) SETS the last K rows to acc.

    values (C, R=T*wg, 128); starts (P, T) int32; idx (P, T, K, 128) in
    [-1, wrs[p]); shifts: static tuple of P lane shifts; ``wrs``: static
    tuple of PER-PASS window heights — the planner sorts copies by
    (p, q) group within each bin, so each pass only needs its group's
    row span (a narrow window with a per-bin dynamic start) instead of
    the whole copy region. Returns (C, T, wg, 128) — reshape to
    (C, R, 128) is free. Replaces P separate (full-state jnp.roll +
    windowed gather) rounds plus a full-state .at[].add/.set: window
    DMAs overlap, the lane shift is an in-register pltpu.roll on the
    window block."""
    C, R, L = values.shape
    P, T, K, _ = idx.shape
    assert len(shifts) == P and len(wrs) == P and R == T * wg
    wr_max = max(wrs)

    def kern(start_ref, idx_ref, base_ref, v_hbm, o_ref, win, sems):
        t = pl.program_id(0)
        dmas = [
            pltpu.make_async_copy(
                v_hbm.at[:, pl.ds(start_ref[p, t], wrs[p]), :],
                # np.int32: under jax_enable_x64 a bare Python int lowers
                # as an i64 constant, which Mosaic's memref_slice rejects
                win.at[np.int32(p), :, pl.ds(0, wrs[p])],
                sems.at[np.int32(p)],
            )
            for p in range(P)
        ]
        for d in dmas:
            d.start()
        for d in dmas:
            d.wait()
        ids = idx_ref[:, 0].astype(jnp.int32)  # (P, K, L)
        accs = [jnp.zeros((K, L), values.dtype) for _ in range(C)]
        for p in range(P):
            ws = []
            for c in range(C):
                w = win[p, c]  # (wr_max, L)
                if shifts[p] % L:
                    # pltpu.roll needs a non-negative shift; cyclic over
                    # the 128 lanes so mod is exact
                    w = pltpu.roll(w, np.int32(shifts[p] % L), 1)
                ws.append(w)
            # one compare per (p, r), shared by the C channels
            for r in range(wrs[p]):
                m = ids[p] == r
                for c in range(C):
                    accs[c] = accs[c] + jnp.where(
                        m, ws[c][r : r + 1, :], 0.0
                    )
        for c in range(C):
            base = base_ref[c, 0]  # (wg, L)
            if head:
                o_ref[c, 0] = jnp.concatenate(
                    [base[:K] + accs[c], base[K:]], axis=0
                )
            else:
                o_ref[c, 0] = jnp.concatenate(
                    [base[: wg - K], accs[c]], axis=0
                )

    base_view = values.reshape(C, T, wg, L)
    return pl.pallas_call(
        kern,
        interpret=interpret,
        out_shape=jax.ShapeDtypeStruct((C, T, wg, L), values.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(T,),
            in_specs=[
                pl.BlockSpec((P, 1, K, L), lambda t, s: (0, t, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((C, 1, wg, L), lambda t, s: (0, t, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec(
                (C, 1, wg, L), lambda t, s: (0, t, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM((P, C, wr_max, L), values.dtype),
                pltpu.SemaphoreType.DMA((P,)),
            ],
        ),
    )(starts, idx, base_view, values)


def lane_fused_elem(values, starts, idx, cell_data, elem_fn, *,
                    wr: int, nv: int, k_block: int = 0,
                    interpret: bool = False):
    """Fused gather -> element function -> bin scatter (ONE HBM pass).

    The per-iteration hot path of unstructured assembly: the unfused
    pipeline writes the gathered per-cell dofs (nd, M) and the element
    vectors (nd, M) to HBM and relayouts both (~200 MB round trips at
    2M cells); here everything between the solution window and the bin
    partials stays in VMEM.

    values: tuple of state arrays, each (C, R, 128) (one for residual,
      (u, v) for the tangent action). All share ``starts``/``idx``.
    starts (T,) int32 window row starts; idx (T, nv, K, 128) in [-1, wr).
    cell_data: tuple of (T, D_i, K, 128) per-cell row blocks (static
      geometry, runtime coefficients) streamed via the grid pipeline.
    elem_fn(u_blocks, cds) with u_blocks a tuple of (nv*C, KB, 128)
      arrays and cds the tuple of (D_i, KB, 128) blocks, returning the
      element vectors (nv*C, KB, 128) (vmapped physics — traced INTO
      the kernel).

    ``k_block``: split the K (cells-per-bin) axis into sub-blocks of
    this size (must divide K; 0 = no split). Each sub-block is a grid
    step revisiting the same output window (accumulated in place; the
    solution window is DMA'd once per bin). Bounds the live vreg set of
    the unrolled gather/physics/scatter graph — 3D elasticity at
    K=192 spills ~158M of vregs unblocked, which exceeds VMEM.

    Returns (T, C, wr, 128) bin partials:
      out[t,c,r,j] = sum_{v,k: idx[t,v,k,j]==r} ev[v*C+c, k, j]
    """
    n_states = len(values)
    n_cd = len(cell_data)
    C, R, L = values[0].shape
    T, NV, K, _ = idx.shape
    assert NV == nv
    KB = k_block if k_block else K
    assert K % KB == 0
    NKB = K // KB

    def kern(start_ref, idx_ref, *refs):
        cd_refs = refs[:n_cd]
        v_hbms = refs[n_cd : n_cd + n_states]
        o_ref = refs[n_cd + n_states]
        wins = refs[n_cd + n_states + 1 : n_cd + 2 * n_states + 1]
        sems = refs[n_cd + 2 * n_states + 1 :]
        t = pl.program_id(0)
        kb = pl.program_id(1)
        s = start_ref[t]

        # the solution window serves every sub-block of the bin: DMA it
        # on the first one only (scratch persists across grid steps)
        @pl.when(kb == 0)
        def _load():
            dmas = [
                pltpu.make_async_copy(h.at[:, pl.ds(s, wr), :], w, sm)
                for h, w, sm in zip(v_hbms, wins, sems)
            ]
            for d in dmas:
                d.start()
            for d in dmas:
                d.wait()

        ids = idx_ref[0].astype(jnp.int32)  # (nv, KB, L)
        dt = values[0].dtype
        u_blocks = []
        for w in wins:
            ww = w[:]
            rows = [None] * (nv * C)
            # the (ids[v] == r) mask is channel-invariant: hoist it out
            # of the c loop so each window row costs 1 compare + C
            # select/adds instead of C of each
            for v in range(nv):
                accs = [jnp.zeros((KB, L), dt) for _ in range(C)]
                for r in range(wr):
                    m = ids[v] == r
                    for c in range(C):
                        accs[c] = accs[c] + jnp.where(
                            m, ww[c, r : r + 1, :], 0.0
                        )
                for c in range(C):
                    rows[v * C + c] = accs[c]
            u_blocks.append(jnp.stack(rows))  # (nv*C, KB, L)
        ev = elem_fn(
            tuple(u_blocks), tuple(cd[0] for cd in cd_refs)
        )  # (nv*C, KB, L), row v*C+c
        # scatter: accumulate rows; the (iota == ids) one-hot is shared
        # across the C output channels
        iota = jax.lax.broadcasted_iota(jnp.int32, (wr, L), 0)
        ids_flat = ids.reshape(nv * KB, L)
        evf = [
            ev.reshape(nv, C, KB, L)[:, c].reshape(nv * KB, L)
            for c in range(C)
        ]
        accs = [jnp.zeros((wr, L), dt) for _ in range(C)]
        for r in range(nv * KB):
            m = iota == ids_flat[r : r + 1, :]
            for c in range(C):
                accs[c] = accs[c] + jnp.where(
                    m, evf[c][r : r + 1, :], 0.0
                )
        for c in range(C):
            acc = accs[c]
            if NKB == 1:
                o_ref[0, c] = acc
            else:
                # revisited output window: init on the first sub-block
                @pl.when(kb == 0)
                def _init(c=c, acc=acc):
                    o_ref[0, c] = acc

                @pl.when(kb != 0)
                def _accum(c=c, acc=acc):
                    o_ref[0, c] = o_ref[0, c] + acc

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T, NKB),
        in_specs=[
            pl.BlockSpec((1, NV, KB, L), lambda t, kb, s: (t, 0, kb, 0),
                         memory_space=pltpu.VMEM),
        ] + [
            pl.BlockSpec((1, cd.shape[1], KB, L),
                         lambda t, kb, s: (t, 0, kb, 0),
                         memory_space=pltpu.VMEM)
            for cd in cell_data
        ] + [pl.BlockSpec(memory_space=pl.ANY)] * n_states,
        out_specs=pl.BlockSpec(
            (1, C, wr, L), lambda t, kb, s: (t, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((C, wr, L), values[0].dtype)
            for _ in range(n_states)
        ] + [pltpu.SemaphoreType.DMA(()) for _ in range(n_states)],
    )
    return pl.pallas_call(
        kern,
        interpret=interpret,
        out_shape=jax.ShapeDtypeStruct((T, C, wr, L), values[0].dtype),
        grid_spec=grid_spec,
        # the unrolled physics+select graph carries many live (K, L)
        # temporaries; the 16M default scoped-vmem stack is too small
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )(starts, idx, *cell_data, *values)


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
        # idx may arrive int8 (windows < 127 rows — 4x less HBM/upload
        # traffic for the two-level tables); widen for the compares
        ids = idx_ref[0].astype(jnp.int32)  # (V, K, L)
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
