"""Uniform refinement with tag transfer.

Equivalent of dolfinx ``refinement::plaza::refine`` + cell/facet meshtag
transfer (FEniCSx/mechanic2d/asym_elasto_damage_model.cc:166-186) and
mfem ``ParMesh::UniformRefinement`` (MFEM/...cc:1038), restricted to the
uniform (red) case which is all the reference workload uses
(MAX_REFINE applications of uniform refinement).
"""

from __future__ import annotations

import numpy as np

from tpufem.config import INDEX_DTYPE
from tpufem.mesh.mesh import CellType, Mesh, MeshTags
from tpufem.mesh.topology import build_entities


def _midpoint_nodes(mesh: Mesh):
    """New node per unique edge; returns (new_x, edge_to_newnode)."""
    edges, c2e = build_entities(mesh, 1)
    mid = 0.5 * (mesh.x[edges[:, 0]] + mesh.x[edges[:, 1]])
    new_x = np.concatenate([mesh.x, mid], axis=0)
    edge_to_new = (mesh.n_nodes + np.arange(edges.shape[0])).astype(INDEX_DTYPE)
    return new_x, edges, c2e, edge_to_new


def refine_uniform(mesh: Mesh) -> Mesh:
    """One level of uniform refinement. Cell tags propagate to children;
    tagged edges (entity_tags[1]) are split into two tagged children —
    the meshtag transfer of FEniCSx/...cc:171-176."""
    if mesh.cell_type == CellType.triangle:
        return _refine_triangle(mesh)
    if mesh.cell_type == CellType.quad:
        return _refine_quad(mesh)
    if mesh.cell_type == CellType.tetra:
        return _refine_tetra(mesh)
    if mesh.cell_type == CellType.hexahedron:
        return _refine_hex(mesh)
    raise NotImplementedError(mesh.cell_type)


def _transfer_edge_tags(mesh: Mesh, new_mesh: Mesh, edges, edge_to_new):
    """Tagged edge (a,b) → children (a,m) and (m,b)."""
    if 1 not in mesh.entity_tags:
        return
    tags = mesh.entity_tags[1]
    # find each tagged edge in the unique edge table
    from tpufem.mesh.topology import match_tagged_entities

    idx = match_tagged_entities(mesh, 1)
    valid = idx >= 0
    idx = idx[valid]
    vals = tags.values[valid]
    a = edges[idx, 0]
    b = edges[idx, 1]
    m = edge_to_new[idx]
    child = np.concatenate(
        [np.stack([a, m], axis=1), np.stack([m, b], axis=1)], axis=0
    )
    child = np.sort(child, axis=1).astype(INDEX_DTYPE)
    new_mesh.entity_tags[1] = MeshTags(
        dim=1, entities=child, values=np.concatenate([vals, vals])
    )


def _refine_triangle(mesh: Mesh) -> Mesh:
    new_x, edges, c2e, edge_to_new = _midpoint_nodes(mesh)
    v = mesh.cells  # (nc, 3)
    # midpoint of local edge k (opposite vertex k)
    m = edge_to_new[c2e]  # (nc, 3): m0 on (1,2), m1 on (0,2), m2 on (0,1)
    children = [
        np.stack([v[:, 0], m[:, 2], m[:, 1]], axis=1),
        np.stack([v[:, 1], m[:, 0], m[:, 2]], axis=1),
        np.stack([v[:, 2], m[:, 1], m[:, 0]], axis=1),
        np.stack([m[:, 0], m[:, 1], m[:, 2]], axis=1),
    ]
    cells = np.concatenate(children, axis=0).astype(INDEX_DTYPE)
    tags = (
        np.tile(mesh.cell_tags, 4) if mesh.cell_tags is not None else None
    )
    out = Mesh(x=new_x, cells=cells, cell_type=CellType.triangle, cell_tags=tags)
    _transfer_edge_tags(mesh, out, edges, edge_to_new)
    return out


def _refine_quad(mesh: Mesh) -> Mesh:
    new_x, edges, c2e, edge_to_new = _midpoint_nodes(mesh)
    v = mesh.cells  # tensor order: 0=(0,0) 1=(1,0) 2=(0,1) 3=(1,1)
    m = edge_to_new[c2e]  # local edges (0,1),(0,2),(1,3),(2,3)
    center = new_x[v].mean(axis=1)
    cidx = (len(new_x) + np.arange(mesh.n_cells)).astype(INDEX_DTYPE)
    new_x = np.concatenate([new_x, center], axis=0)
    e01, e02, e13, e23 = m[:, 0], m[:, 1], m[:, 2], m[:, 3]
    children = [
        np.stack([v[:, 0], e01, e02, cidx], axis=1),
        np.stack([e01, v[:, 1], cidx, e13], axis=1),
        np.stack([e02, cidx, v[:, 2], e23], axis=1),
        np.stack([cidx, e13, e23, v[:, 3]], axis=1),
    ]
    cells = np.concatenate(children, axis=0).astype(INDEX_DTYPE)
    tags = np.tile(mesh.cell_tags, 4) if mesh.cell_tags is not None else None
    out = Mesh(x=new_x, cells=cells, cell_type=CellType.quad, cell_tags=tags)
    _transfer_edge_tags(mesh, out, edges, edge_to_new)
    return out


def _refine_tetra(mesh: Mesh) -> Mesh:
    """Bey's red (1:8) tetra refinement: 4 corner tets + the interior
    octahedron cut into 4 tets along the m02-m13 diagonal (Bey 1995,
    the scheme MFEM's hex/tet UniformRefinement and dolfinx's uniform
    plaza path reduce to for the all-red case)."""
    new_x, edges, c2e, edge_to_new = _midpoint_nodes(mesh)
    v = mesh.cells  # (nc, 4)
    m = edge_to_new[c2e]  # (nc, 6) in CELL_EDGES[tetra] order:
    # e0=(2,3) e1=(1,3) e2=(1,2) e3=(0,3) e4=(0,2) e5=(0,1)
    m23, m13, m12, m03, m02, m01 = (m[:, k] for k in range(6))
    children = [
        # corner tets
        np.stack([v[:, 0], m01, m02, m03], axis=1),
        np.stack([m01, v[:, 1], m12, m13], axis=1),
        np.stack([m02, m12, v[:, 2], m23], axis=1),
        np.stack([m03, m13, m23, v[:, 3]], axis=1),
        # octahedron, diagonal m02-m13
        np.stack([m01, m02, m03, m13], axis=1),
        np.stack([m01, m02, m12, m13], axis=1),
        np.stack([m02, m03, m13, m23], axis=1),
        np.stack([m02, m12, m13, m23], axis=1),
    ]
    cells = np.concatenate(children, axis=0).astype(INDEX_DTYPE)
    tags = np.tile(mesh.cell_tags, 8) if mesh.cell_tags is not None else None
    out = Mesh(x=new_x, cells=cells, cell_type=CellType.tetra, cell_tags=tags)
    _transfer_edge_tags(mesh, out, edges, edge_to_new)
    return out


def _refine_hex(mesh: Mesh) -> Mesh:
    """Uniform hex refinement via 2×2×2 trilinear subdivision per cell
    (face/center nodes deduplicated by coordinate hashing)."""
    v = mesh.cells
    x = mesh.x
    # 27 lattice points per cell in tensor order
    corners = x[v]  # (nc, 8, 3) tensor-ordered
    nc = mesh.n_cells
    grid = np.array(
        [[i, j, k] for k in (0, 1, 2) for j in (0, 1, 2) for i in (0, 1, 2)],
        dtype=np.float64,
    ) / 2.0  # (27, 3) in reference coords
    # trilinear basis at the 27 points for the 8 tensor-ordered corners
    gx, gy, gz = grid[:, 0], grid[:, 1], grid[:, 2]
    basis = np.stack(
        [
            (1 - gx) * (1 - gy) * (1 - gz), gx * (1 - gy) * (1 - gz),
            (1 - gx) * gy * (1 - gz), gx * gy * (1 - gz),
            (1 - gx) * (1 - gy) * gz, gx * (1 - gy) * gz,
            (1 - gx) * gy * gz, gx * gy * gz,
        ],
        axis=1,
    )  # (27, 8)
    pts = np.einsum("qv,cvd->cqd", basis, corners).reshape(-1, 3)
    # dedupe points (quantized) to get conforming mesh
    key = np.round(pts / (1e-12 + np.abs(pts).max()) * 1e12).astype(np.int64)
    _, first, inv = np.unique(key, axis=0, return_index=True, return_inverse=True)
    new_x = pts[first]
    node_of = inv.reshape(nc, 27)

    def lid(i, j, k):
        return (k * 3 + j) * 3 + i

    children = []
    for dk in (0, 1):
        for dj in (0, 1):
            for di in (0, 1):
                ids = [lid(di + a, dj + b, dk + c)
                       for c in (0, 1) for b in (0, 1) for a in (0, 1)]
                children.append(node_of[:, ids])
    cells = np.concatenate(children, axis=0).astype(INDEX_DTYPE)
    tags = np.tile(mesh.cell_tags, 8) if mesh.cell_tags is not None else None
    return Mesh(x=new_x, cells=cells, cell_type=CellType.hexahedron,
                cell_tags=tags)
