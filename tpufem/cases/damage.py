"""Damage field construction + distributed neighbor smoothing.

Reimplements the reference's one custom distributed algorithm
(doc.tex:601-642; C++ loops at FEniCSx/mechanic2d/
asym_elasto_damage_model.cc:315-473; MFEM table walk MFEM/...cc:
1155-1315; SciPy CSR form asym_elasto_damage_model_symb_sym.py:160-199):

1. nodes of ~30 tagged grain-boundary edges get d = MAX_DAM;
2. for 8·(MAX_REFINE+1) iterations, two half-steps each:
   - *enlarge*: nodes with d < 0.01 receive the edge-neighbor average,
     d ← max(avg, d);
   - *smooth+enlarge*: all nodes receive the neighbor average,
     d ← max(avg, d).

TPU-native formulation: the per-edge gather/sum is a padded ELL
adjacency matvec (one dense gather + row-sum), the owner-side
``max(avg, old)`` is elementwise — the whole loop is one
``lax.fori_loop`` on device. Under sharding the matvec rides the halo
exchange (scatter_rev(+)/scatter_fwd become ppermute steps) — this is
the first multi-device integration test per SURVEY.md §3.5.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from tpufem.config import INDEX_DTYPE
from tpufem.mesh.mesh import Mesh
from tpufem.mesh.topology import build_entities, vertex_to_entity


def node_adjacency_ell(mesh: Mesh):
    """Padded neighbor table via edges: (neighbors (n, k), mask (n, k),
    inv_degree (n,)). Neighbor j of node i ⇔ edge (i,j) exists.

    Padding entries point at the sentinel slot ``n`` (gather from a
    zero-extended vector instead of a mask multiply); ``mask`` is kept
    in the return for API stability but is None."""
    edges, _ = build_entities(mesh, 1)
    n = mesh.n_nodes
    # undirected: both directions; int32 throughout — the int64
    # intermediates measurably dominate at ~3M edges on this host
    src = np.concatenate([edges[:, 0], edges[:, 1]]).astype(
        np.int32, copy=False
    )
    dst = np.concatenate([edges[:, 1], edges[:, 0]]).astype(
        np.int32, copy=False
    )
    order = np.argsort(src, kind="stable")
    src, dst = src[order], dst[order]
    deg = np.bincount(src, minlength=n)
    k = int(deg.max()) if n else 0
    start = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(deg, out=start[1:])
    neighbors = np.full((n, k), n, dtype=INDEX_DTYPE)  # pad -> slot n
    within = np.arange(len(src), dtype=np.int64)
    within -= start[src]
    neighbors[src, within] = dst
    inv_deg = np.where(deg > 0, 1.0 / np.maximum(deg, 1), 0.0)
    return neighbors, None, inv_deg


def initial_damage(
    mesh: Mesh, damaged_edge_tags: Sequence[int], max_dam: float
) -> np.ndarray:
    """d = max_dam on every node of the tagged boundary edges
    (FEniCSx/...cc:354-397). Tag list for the Neper mesh at :359-361
    (30 tags, 333 duplicated — preserved as-is); square.msh uses {4}
    (:356)."""
    d = np.zeros(mesh.n_nodes)
    if 1 not in mesh.entity_tags:
        return d
    tags = mesh.entity_tags[1]
    for tag in damaged_edge_tags:
        rows = tags.find(int(tag))
        nodes = np.unique(tags.entities[rows].ravel())
        d[nodes] = max_dam
    return d


@functools.partial(jax.jit, static_argnums=(3,))
def _smooth_loop(d, nb, w, iterations):
    # nb/w are *arguments*, not closure captures: capturing the
    # multi-MB neighbor tables embeds them as HLO constants and blows
    # trace+compile time ~40x at 1M nodes
    def neighbor_avg(dv):
        # padding entries of nb point at the appended zero slot
        ext = jnp.concatenate([dv, jnp.zeros((1,), dv.dtype)])
        return jnp.sum(ext[nb], axis=1) * w

    def body(_, dv):
        # half 1: enlarge — only currently-undamaged nodes updated
        avg = neighbor_avg(dv)
        cand = jnp.where(dv < 0.01, avg, 0.0)
        dv = jnp.maximum(cand, dv)
        # half 2: smooth + enlarge everywhere
        avg = neighbor_avg(dv)
        dv = jnp.maximum(avg, dv)
        return dv

    return jax.lax.fori_loop(0, iterations, body, d)


def _smooth_host(d, neighbors, inv_deg, iterations):
    """NumPy twin of :func:`_smooth_loop` (same two half-steps, same
    sentinel-padded gather) for the remote-tunnel platform, where
    uploading the multi-hundred-MB neighbor table plus a remote compile
    costs far more than the host loop (measured: the whole damage phase
    was 431 s of a 6.2M-DoF e2e, almost none of it device compute).

    Hot sections run in native C++ when the library builds (same
    left-to-right per-row accumulation, so results stay bit-identical
    to this NumPy loop and to the jitted device path)."""
    from tpufem import native

    nd = native.damage_smooth(neighbors, inv_deg, d, iterations)
    if nd is not None:
        return nd
    d = np.asarray(d, dtype=np.float64).copy()
    ext = np.zeros(len(d) + 1)

    def neighbor_avg():
        # left-to-right column accumulation: bit-identical to the
        # native per-row loop (NumPy's axis-sum switches to pairwise
        # summation at k >= 8, which would differ by ~1 ulp)
        ext[:-1] = d
        g = ext[neighbors]
        s = g[:, 0].copy()
        for j in range(1, g.shape[1]):
            s += g[:, j]
        return s * inv_deg

    for _ in range(iterations):
        avg = neighbor_avg()
        np.maximum(np.where(d < 0.01, avg, 0.0), d, out=d)
        avg = neighbor_avg()
        np.maximum(avg, d, out=d)
    return d


def smooth_damage(
    mesh: Mesh, d0: np.ndarray, *, iterations: int, dtype=None,
    backend: str = "auto",
) -> jnp.ndarray:
    """Run the two-half-step smoothing loop; returns final d.

    ``backend``: 'device' (one jitted fori_loop — the TPU-native path),
    'host' (NumPy twin, bit-identical in f64), or 'auto' (host on
    remote-tunnel platforms, device otherwise). The host path returns
    a NumPy array (no dead upload through the tunnel); the device path
    returns a jnp array — every caller normalizes with asarray."""
    from tpufem.config import is_remote_device_platform

    neighbors, _, inv_deg = node_adjacency_ell(mesh)
    if backend == "auto":
        backend = "host" if is_remote_device_platform() else "device"
    if backend == "host":
        d0h = np.asarray(d0)
        return _smooth_host(d0h, neighbors, inv_deg, iterations).astype(
            d0h.dtype if dtype is None else dtype
        )
    dt = jnp.asarray(d0).dtype if dtype is None else dtype
    nb = jnp.asarray(neighbors)
    w = jnp.asarray(inv_deg, dtype=dt)
    d = jnp.asarray(d0, dtype=dt)
    return _smooth_loop(d, nb, w, iterations)


def smooth_damage_sharded(
    mesh: Mesh, d0: np.ndarray, *, iterations: int, n_shards: int,
    devices=None, dtype=None,
) -> jnp.ndarray:
    """The smoothing loop over an n-device mesh — the reference's
    distributed algorithm verbatim (per half-iteration: local partial
    neighbor sums over *owned-by-this-shard edges only* to avoid
    double-count, scatter_rev(+) to owners, owner-side max(avg, old),
    scatter_fwd to ghosts — FEniCSx/...cc:414-472, doc.tex:603-628),
    mapped to shard_map + all_to_all halos. Bit-identical to
    :func:`smooth_damage` on one device.
    """
    import jax
    from jax.sharding import Mesh as JaxMesh, PartitionSpec as P
    from jax import shard_map

    from tpufem.parallel.partition import partition_mesh
    from tpufem.spaces.space import FunctionSpace

    DS = FunctionSpace.create(mesh, 1, bs=1)
    part = partition_mesh(DS, n_shards)
    S, L = n_shards, part.local_size

    # assign each global edge to the lowest shard whose cells contain it
    edges, c2e = build_entities(mesh, 1)
    ne = len(edges)
    edge_owner = np.full(ne, S, dtype=np.int64)
    for s in range(S - 1, -1, -1):
        cg = part.cell_global[s]
        cs = cg[cg >= 0]
        edge_owner[np.unique(c2e[cs].ravel())] = s

    # per-shard local neighbor ELL over its owned edges
    g2l = []
    for s in range(S):
        l2g = part.local_to_global[s]
        table = {int(g): i for i, g in enumerate(l2g) if g >= 0}
        g2l.append(table)
    per_shard = []
    kmax = 1
    for s in range(S):
        es = edges[edge_owner == s]
        src = np.concatenate([es[:, 0], es[:, 1]])
        dst = np.concatenate([es[:, 1], es[:, 0]])
        ls = np.array([g2l[s][int(g)] for g in src], dtype=np.int64)
        ld = np.array([g2l[s][int(g)] for g in dst], dtype=np.int64)
        order = np.argsort(ls, kind="stable")
        ls, ld = ls[order], ld[order]
        deg = np.bincount(ls, minlength=L)
        kmax = max(kmax, int(deg.max()) if len(deg) else 0)
        per_shard.append((ls, ld, deg))
    neighbors = np.full((S, L, kmax), L, dtype=np.int64)  # pad -> L slot
    for s, (ls, ld, deg) in enumerate(per_shard):
        start = np.zeros(L + 1, dtype=np.int64)
        np.cumsum(deg, out=start[1:])
        within = np.arange(len(ls)) - start[ls]
        neighbors[s, ls, within] = ld

    # global degree (owned slots) for the average
    _, _, inv_deg_g = node_adjacency_ell(mesh)
    inv_deg = np.zeros((S, L))
    for s in range(S):
        l2g = part.local_to_global[s]
        sel = l2g >= 0
        inv_deg[s, sel] = inv_deg_g[l2g[sel]]
    dt = jnp.float64 if dtype is None and jax.config.jax_enable_x64 else (
        dtype or jnp.float32
    )

    d_local = np.zeros((S, L))
    for s in range(S):
        l2g = part.local_to_global[s]
        sel = l2g >= 0
        d_local[s, sel] = np.asarray(d0)[l2g[sel]]

    if devices is None:
        devices = jax.devices()[:S]
    jmesh = JaxMesh(np.array(devices), ("shards",))
    AXIS = "shards"

    owned = part.owned_mask.astype(np.float64)
    nb = jnp.asarray(neighbors)
    args = tuple(
        jnp.asarray(a) for a in (
            d_local.astype(dt), owned.astype(dt), inv_deg.astype(dt),
            part.send_idx,
            # receiver-major view: recv_place[me, t] = my ghost slots for
            # data arriving from t (partition stores [sender, receiver])
            np.ascontiguousarray(part.recv_idx.transpose(1, 0, 2)),
        )
    )

    @jax.jit
    def run(d, owned, inv_deg, send_idx, recv_idx, nb):
        def body_fn(d, owned, inv_deg, send_idx, recv_idx, nb):
            d = d[0]
            owned = owned[0]
            inv_deg = inv_deg[0]
            send_idx = send_idx[0]
            recv_idx = recv_idx[0]
            nb = nb[0]

            def halo_fwd(u):
                safe = jnp.where(send_idx >= 0, send_idx, 0)
                buf = u[safe] * (send_idx >= 0)
                recv = jax.lax.all_to_all(
                    buf, AXIS, split_axis=0, concat_axis=0
                )
                tgt = jnp.where(recv_idx >= 0, recv_idx, L)
                ext = jnp.concatenate([u, jnp.zeros(1, u.dtype)])
                return ext.at[tgt.ravel()].set(
                    recv.ravel(), mode="drop"
                )[:L]

            def halo_rev(r):
                safe = jnp.where(recv_idx >= 0, recv_idx, 0)
                buf = r[safe] * (recv_idx >= 0)
                recv = jax.lax.all_to_all(
                    buf, AXIS, split_axis=0, concat_axis=0
                )
                tgt = jnp.where(send_idx >= 0, send_idx, L)
                ext = jnp.concatenate([r, jnp.zeros(1, r.dtype)])
                return ext.at[tgt.ravel()].add(
                    recv.ravel(), mode="drop"
                )[:L] * owned

            def neighbor_avg(dv):
                ext = jnp.concatenate([dv, jnp.zeros(1, dv.dtype)])
                partial = jnp.sum(ext[nb], axis=1)
                return halo_rev(partial) * inv_deg

            def it(_, dv):
                avg = neighbor_avg(dv)
                cand = jnp.where(dv < 0.01, avg, 0.0)
                dv = halo_fwd(jnp.maximum(cand, dv) * owned)
                avg = neighbor_avg(dv)
                dv = halo_fwd(jnp.maximum(avg, dv) * owned)
                return dv

            d = halo_fwd(d * owned)
            d = jax.lax.fori_loop(0, iterations, it, d)
            return d[None]

        return shard_map(
            body_fn, mesh=jmesh,
            in_specs=(P(AXIS),) * 6,
            out_specs=P(AXIS),
        )(d, owned, inv_deg, send_idx, recv_idx, nb)

    d_out = np.asarray(run(*args, nb))
    # assemble the global vector from owned slots
    out = np.zeros(mesh.n_nodes, dtype=d_out.dtype)
    for s in range(S):
        l2g = part.local_to_global[s]
        sel = (l2g >= 0) & part.owned_mask[s]
        out[l2g[sel]] = d_out[s, sel]
    return jnp.asarray(out)


# the reference's damaged-edge tag list for the Neper polycrystal mesh
# (FEniCSx/...cc:359-361; MFEM zero-based copy at MFEM/...cc:1170-1199).
# 333 appears twice in the original — kept verbatim.
NEPER_DAMAGED_EDGE_TAGS = (
    148, 342, 333, 19, 380, 408, 328, 329, 325, 323,
    96, 97, 531, 4, 471, 234, 235, 184, 236, 419,
    350, 332, 364, 176, 77, 333, 341, 343, 144, 143,
)
SQUARE_DAMAGED_EDGE_TAGS = (4,)
