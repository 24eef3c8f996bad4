"""Mesh reordering for memory locality.

SURVEY.md §7.3 item 5: random cell→dof indices defeat vector-memory
locality; bandwidth-minimizing node reordering (reverse Cuthill-McKee)
at preprocessing time tightens the index windows every gather touches.
The reference gets this implicitly from (Par)METIS contiguity
(doc.tex:1575); here it is an explicit host-side pass backed by the
native library (tpufem/native.py).
"""

from __future__ import annotations

import numpy as np

from tpufem.config import INDEX_DTYPE
from tpufem.mesh.mesh import Mesh, MeshTags
from tpufem.mesh.topology import build_entities, vertex_to_entity


def rcm_reorder(mesh: Mesh) -> Mesh:
    """Return a new Mesh with RCM-permuted nodes and cells sorted by
    their minimum node index (ascending), preserving all tags."""
    from tpufem import native

    edges, _ = build_entities(mesh, 1)
    # build vertex-vertex CSR adjacency
    n = mesh.n_nodes
    src = np.concatenate([edges[:, 0], edges[:, 1]])
    dst = np.concatenate([edges[:, 1], edges[:, 0]])
    order = np.argsort(src, kind="stable")
    src, dst = src[order], dst[order]
    counts = np.bincount(src, minlength=n)
    indptr = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(counts, out=indptr[1:])

    perm = native.rcm_ordering(indptr, dst)  # perm[new] = old
    inv = np.empty(n, dtype=np.int64)
    inv[perm] = np.arange(n)

    new_x = mesh.x[perm]
    new_cells = inv[mesh.cells].astype(INDEX_DTYPE)
    # sort cells by min node for gather locality
    cell_order = np.argsort(new_cells.min(axis=1), kind="stable")
    new_cells = new_cells[cell_order]
    tags = (
        mesh.cell_tags[cell_order] if mesh.cell_tags is not None else None
    )
    out = Mesh(
        x=new_x, cells=new_cells, cell_type=mesh.cell_type, cell_tags=tags
    )
    for dim, mt in mesh.entity_tags.items():
        ents = np.sort(inv[mt.entities], axis=1).astype(INDEX_DTYPE)
        out.entity_tags[dim] = MeshTags(
            dim=dim, entities=ents, values=mt.values.copy()
        )
    return out


def sfc_reorder(mesh: Mesh) -> Mesh:
    """Morton (Z-curve) node reordering + cell sorting.

    Contiguous dof ranges then correspond to compact geometric patches —
    what block-Jacobi wants (RCM minimizes bandwidth but produces striped
    blocks; SFC patches cut CG iterations a further ~1.7x in tests).
    """
    from tpufem import native

    order = native.morton_order(mesh.x)  # rank -> node
    inv = np.empty(mesh.n_nodes, dtype=np.int64)
    inv[order] = np.arange(mesh.n_nodes)
    new_cells = inv[mesh.cells].astype(INDEX_DTYPE)
    cell_order = np.argsort(new_cells.min(axis=1), kind="stable")
    out = Mesh(
        x=mesh.x[order],
        cells=new_cells[cell_order],
        cell_type=mesh.cell_type,
        cell_tags=(
            mesh.cell_tags[cell_order] if mesh.cell_tags is not None else None
        ),
    )
    for dim, mt in mesh.entity_tags.items():
        ents = np.sort(inv[mt.entities], axis=1).astype(INDEX_DTYPE)
        out.entity_tags[dim] = MeshTags(
            dim=dim, entities=ents, values=mt.values.copy()
        )
    return out


def bandwidth(mesh: Mesh) -> int:
    """Max |i - j| over element node pairs — the locality metric RCM
    minimizes."""
    c = mesh.cells
    return int((c.max(axis=1) - c.min(axis=1)).max())
