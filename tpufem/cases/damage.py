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

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from tpufem.config import INDEX_DTYPE
from tpufem.mesh.mesh import Mesh
from tpufem.mesh.topology import build_entities, vertex_to_entity


def node_adjacency_ell(mesh: Mesh):
    """Padded neighbor table via edges: (neighbors (n, k), mask (n, k),
    inv_degree (n,)). Neighbor j of node i ⇔ edge (i,j) exists."""
    edges, _ = build_entities(mesh, 1)
    n = mesh.n_nodes
    # undirected: both directions
    src = np.concatenate([edges[:, 0], edges[:, 1]])
    dst = np.concatenate([edges[:, 1], edges[:, 0]])
    order = np.argsort(src, kind="stable")
    src, dst = src[order], dst[order]
    deg = np.bincount(src, minlength=n)
    k = int(deg.max()) if n else 0
    start = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(deg, out=start[1:])
    neighbors = np.zeros((n, k), dtype=INDEX_DTYPE)
    mask = np.zeros((n, k), dtype=bool)
    within = np.arange(len(src)) - start[src]
    neighbors[src, within] = dst
    mask[src, within] = True
    inv_deg = np.where(deg > 0, 1.0 / np.maximum(deg, 1), 0.0)
    return neighbors, mask, inv_deg


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


def smooth_damage(
    mesh: Mesh, d0: np.ndarray, *, iterations: int, dtype=None
) -> jnp.ndarray:
    """Run the two-half-step smoothing loop on device; returns final d."""
    neighbors, mask, inv_deg = node_adjacency_ell(mesh)
    nb = jnp.asarray(neighbors)
    mk = jnp.asarray(mask, dtype=d0.dtype if dtype is None else dtype)
    w = jnp.asarray(inv_deg, dtype=mk.dtype)
    d = jnp.asarray(d0, dtype=mk.dtype)

    def neighbor_avg(dv):
        return jnp.sum(dv[nb] * mk, axis=1) * w

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


# the reference's damaged-edge tag list for the Neper polycrystal mesh
# (FEniCSx/...cc:359-361; MFEM zero-based copy at MFEM/...cc:1170-1199).
# 333 appears twice in the original — kept verbatim.
NEPER_DAMAGED_EDGE_TAGS = (
    148, 342, 333, 19, 380, 408, 328, 329, 325, 323,
    96, 97, 531, 4, 471, 234, 235, 184, 236, 419,
    350, 332, 364, 176, 77, 333, 341, 343, 144, 143,
)
SQUARE_DAMAGED_EDGE_TAGS = (4,)
