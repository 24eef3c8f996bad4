"""Host-side mesh partitioning → static shard plans.

Replaces the reference's partitioning stack (ParMETIS/PtScotch via
dolfinx, doc.tex:406-410; serial METIS in MFEM, doc.tex:390-395) with a
space-filling-curve cell partition (Morton order on centroids) — O(n log n),
deterministic, and good enough load balance for near-uniform meshes (the
reference's own finding: (Par)METIS load balance is what makes assembly
scale, doc.tex:1575; SFC gives the same contiguity for these meshes).

Everything a device needs is precomputed here into *uniform-shape* int32
arrays (padded to the max across shards) so the sharded program is fully
static:

- local dof numbering per shard: owned dofs [0, n_owned_max), ghosts
  [n_owned_max, n_owned_max + n_ghost_max) — the owner/ghost dichotomy of
  dolfinx IndexMap (FEniCSx/...cc:325-344);
- per-cell dofmaps/geometry in local numbering, with a cell validity mask
  for padding;
- the halo-exchange plan: for each (src, dst) shard pair, which local
  owned dofs to send and which local ghost slots they land in
  (scatter_fwd); the reverse-add plan is its transpose (scatter_rev).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence

import numpy as np

from tpufem.config import INDEX_DTYPE
from tpufem.mesh.mesh import Mesh
from tpufem.spaces.space import FunctionSpace


def _morton_order(centroids: np.ndarray, bits: int = 16) -> np.ndarray:
    """Order cells along a Morton (Z-) curve of their centroids."""
    x = centroids - centroids.min(axis=0)
    span = x.max(axis=0)
    span[span == 0] = 1.0
    q = np.minimum((x / span * (2**bits - 1)).astype(np.uint64), 2**bits - 1)
    code = np.zeros(len(x), dtype=np.uint64)
    for b in range(bits):
        for d in range(x.shape[1]):
            code |= ((q[:, d] >> np.uint64(b)) & np.uint64(1)) << np.uint64(
                b * x.shape[1] + d
            )
    return np.argsort(code, kind="stable")


def _rcb_order_split(centroids: np.ndarray, idx: np.ndarray, k: int):
    """Recursive coordinate bisection: split along the longest axis at
    the (load-proportional) median. Returns list of k cell-index arrays.

    The METIS-quality-gap mitigation (doc.tex:390-410): on irregular
    (polycrystal) meshes RCB cuts halo volume vs the Morton-SFC chunks
    because every part is a compact axis-aligned box, not a curve
    segment that can straddle thin slivers."""
    if k == 1:
        return [idx]
    k1 = k // 2
    pts = centroids[idx]
    ax = int(np.argmax(pts.max(axis=0) - pts.min(axis=0)))
    m = int(round(len(idx) * k1 / k))
    order = np.argsort(pts[:, ax], kind="stable")
    return _rcb_order_split(centroids, idx[order[:m]], k1) + _rcb_order_split(
        centroids, idx[order[m:]], k - k1
    )


def rcb_partition(mesh: Mesh, n_shards: int) -> np.ndarray:
    """(n_cells,) part id per cell by recursive coordinate bisection."""
    from tpufem.utils.hostops import cell_centroids

    centroids = cell_centroids(mesh.x, mesh.cells)
    parts = _rcb_order_split(
        centroids, np.arange(mesh.n_cells, dtype=np.int64), n_shards
    )
    cell_part = np.empty(mesh.n_cells, dtype=np.int64)
    for s, ids in enumerate(parts):
        cell_part[ids] = s
    return cell_part


def sfc_partition(mesh: Mesh, n_shards: int) -> np.ndarray:
    """(n_cells,) part id per cell: contiguous Morton-curve chunks."""
    from tpufem.utils.hostops import cell_centroids

    centroids = cell_centroids(mesh.x, mesh.cells)
    order = _morton_order(centroids)
    bounds = np.linspace(0, mesh.n_cells, n_shards + 1).astype(np.int64)
    cell_part = np.empty(mesh.n_cells, dtype=np.int64)
    for s in range(n_shards):
        cell_part[order[bounds[s] : bounds[s + 1]]] = s
    return cell_part


def partition_quality(mesh: Mesh, cell_part: np.ndarray) -> dict:
    """Edge-cut / balance report (the numbers METIS would print,
    doc.tex:390-410): cut facets, per-part cell counts, and the
    node-halo volume (nodes touched by >1 part, counted once per extra
    part)."""
    from tpufem.mesh.topology import build_entities

    facets, c2f = build_entities(mesh, mesh.dim - 1)
    nf = len(facets)
    nlf = c2f.shape[1]
    p = np.repeat(cell_part, nlf)
    f = c2f.ravel().astype(np.int64)
    fmin = np.full(nf, np.iinfo(np.int64).max)
    fmax = np.full(nf, -1, dtype=np.int64)
    np.minimum.at(fmin, f, p)
    np.maximum.at(fmax, f, p)
    edge_cut = int((fmax != fmin).sum())
    counts = np.bincount(cell_part, minlength=int(cell_part.max()) + 1)
    # halo volume: Σ_nodes (#parts touching - 1)
    n_parts = int(cell_part.max()) + 1
    pairs = np.unique(
        np.stack(
            [np.repeat(cell_part, mesh.cells.shape[1]),
             mesh.cells.ravel().astype(np.int64)], axis=1
        ),
        axis=0,
    )
    touch = np.bincount(pairs[:, 1], minlength=mesh.n_nodes)
    halo = int(np.maximum(touch - 1, 0).sum())
    return {
        "edge_cut": edge_cut,
        "halo_nodes": halo,
        "cells_min": int(counts.min()),
        "cells_max": int(counts.max()),
        "imbalance": float(counts.max() / max(counts.mean(), 1e-30)),
        "n_parts": n_parts,
    }


@dataclasses.dataclass
class MeshPartition:
    """Static plan for an n-shard decomposition of one FunctionSpace's
    scalar dofs (vector blocking handled downstream)."""

    n_shards: int
    n_owned_max: int
    n_ghost_max: int
    n_cells_max: int
    # per shard arrays (all padded to the max)
    cells_local: np.ndarray  # (S, C, ndofe) scalar dofmap in local numbering
    cell_mask: np.ndarray  # (S, C) bool: real cell?
    cell_global: np.ndarray  # (S, C) original cell index (or -1)
    owned_mask: np.ndarray  # (S, L) bool: is local slot an owned dof?
    local_to_global: np.ndarray  # (S, L) global scalar dof (or -1 pad)
    n_owned: np.ndarray  # (S,)
    # halo plan (scalar-dof granularity)
    halo_pair_max: int
    # fwd: shard s sends owned local idx send_idx[s,t,k] to shard t where it
    # lands at ghost local idx recv_idx[s,t,k] (indices into t's local
    # array); masked entries are -1
    send_idx: np.ndarray  # (S, T, K)
    recv_idx: np.ndarray  # (S, T, K)

    @property
    def local_size(self) -> int:
        return self.n_owned_max + self.n_ghost_max


def partition_mesh(
    space: FunctionSpace,
    n_shards: int,
    *,
    order: Optional[np.ndarray] = None,
    method: str = "sfc",
) -> MeshPartition:
    """Partition the cells of ``space.mesh`` into ``n_shards`` shards.

    ``method``: 'sfc' (Morton chunks) or 'rcb' (recursive coordinate
    bisection — lower edge-cut on irregular meshes)."""
    mesh = space.mesh
    dofmap = space.dofmap  # (nc, ndofe) scalar dofs
    nc, ndofe = dofmap.shape
    n_dofs = space.n_scalar_dofs

    if order is not None:
        bounds = np.linspace(0, nc, n_shards + 1).astype(np.int64)
        cell_part = np.empty(nc, dtype=np.int64)
        for s in range(n_shards):
            cell_part[order[bounds[s] : bounds[s + 1]]] = s
    elif method == "rcb":
        cell_part = rcb_partition(mesh, n_shards)
    elif method == "sfc":
        cell_part = sfc_partition(mesh, n_shards)
    else:
        raise ValueError(f"unknown partition method {method!r}")

    # dof ownership: owner = min shard touching the dof
    dof_owner = np.full(n_dofs, n_shards, dtype=np.int64)
    for s in range(n_shards - 1, -1, -1):
        sel = dofmap[cell_part == s].ravel()
        dof_owner[sel] = s

    shard_cells: List[np.ndarray] = [
        np.nonzero(cell_part == s)[0] for s in range(n_shards)
    ]
    owned_dofs: List[np.ndarray] = [
        np.nonzero(dof_owner == s)[0] for s in range(n_shards)
    ]
    # ghosts: dofs touched by my cells but owned elsewhere
    ghost_dofs: List[np.ndarray] = []
    for s in range(n_shards):
        touched = np.unique(dofmap[shard_cells[s]].ravel())
        ghost_dofs.append(touched[dof_owner[touched] != s])

    n_owned_max = max(len(o) for o in owned_dofs)
    n_ghost_max = max(len(g) for g in ghost_dofs) if n_shards > 1 else 0
    n_cells_max = max(len(c) for c in shard_cells)
    L = n_owned_max + n_ghost_max

    # local numbering tables
    cells_local = np.zeros((n_shards, n_cells_max, ndofe), dtype=INDEX_DTYPE)
    cell_mask = np.zeros((n_shards, n_cells_max), dtype=bool)
    cell_global = np.full((n_shards, n_cells_max), -1, dtype=INDEX_DTYPE)
    owned_mask = np.zeros((n_shards, L), dtype=bool)
    local_to_global = np.full((n_shards, L), -1, dtype=np.int64)
    n_owned = np.zeros(n_shards, dtype=INDEX_DTYPE)
    g2l: List[Dict[int, int]] = []
    for s in range(n_shards):
        no, ng = len(owned_dofs[s]), len(ghost_dofs[s])
        n_owned[s] = no
        owned_mask[s, :no] = True
        local_to_global[s, :no] = owned_dofs[s]
        local_to_global[s, n_owned_max : n_owned_max + ng] = ghost_dofs[s]
        table = {int(g): i for i, g in enumerate(owned_dofs[s])}
        table.update(
            {int(g): n_owned_max + i for i, g in enumerate(ghost_dofs[s])}
        )
        g2l.append(table)
        cs = shard_cells[s]
        lc = np.vectorize(table.__getitem__, otypes=[np.int64])(
            dofmap[cs]
        ) if len(cs) else np.zeros((0, ndofe), np.int64)
        cells_local[s, : len(cs)] = lc
        cell_mask[s, : len(cs)] = True
        cell_global[s, : len(cs)] = cs

    # halo plan: for each ghost on shard s owned by shard t, t sends it
    pair_lists: Dict[tuple, List[tuple]] = {}
    for s in range(n_shards):
        for i, g in enumerate(ghost_dofs[s]):
            t = int(dof_owner[g])
            # sender t: local owned index; receiver s: ghost local index
            pair_lists.setdefault((t, s), []).append(
                (g2l[t][int(g)], n_owned_max + i)
            )
    K = max((len(v) for v in pair_lists.values()), default=0)
    send_idx = np.full((n_shards, n_shards, max(K, 1)), -1, dtype=INDEX_DTYPE)
    recv_idx = np.full((n_shards, n_shards, max(K, 1)), -1, dtype=INDEX_DTYPE)
    for (t, s), pairs in pair_lists.items():
        for k, (si, ri) in enumerate(pairs):
            send_idx[t, s, k] = si
            recv_idx[t, s, k] = ri

    return MeshPartition(
        n_shards=n_shards,
        n_owned_max=n_owned_max,
        n_ghost_max=n_ghost_max,
        n_cells_max=n_cells_max,
        cells_local=cells_local,
        cell_mask=cell_mask,
        cell_global=cell_global,
        owned_mask=owned_mask,
        local_to_global=local_to_global,
        n_owned=n_owned,
        halo_pair_max=max(K, 1),
        send_idx=send_idx,
        recv_idx=recv_idx,
    )
