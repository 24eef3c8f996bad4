"""gmsh 2.2 ASCII reader producing a tpufem Mesh with cell/facet tags.

TPU-native equivalent of the reference mesh-ingest path: the reference
converts Neper gmsh 2.2 files to XDMF with ``gmsh_to_xdmf_neper_dam.py``
(dolfinx gmshio) then reads them with ``XDMFFile::read_mesh/read_meshtags``
(FEniCSx/mechanic2d/asym_elasto_damage_model.cc:152-164); MFEM reads the
gmsh file directly (MFEM/...cc:1020). We read the gmsh file directly on
host into SoA NumPy arrays. The bundled debug mesh
``common/data/square.msh`` (62 nodes, gmsh 2.2) exercises every section
this reader supports.
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np

from tpufem.config import INDEX_DTYPE
from tpufem.mesh.mesh import CellType, Mesh, MeshTags

# gmsh element type id -> (cell type, n nodes)
_GMSH_TYPES = {
    15: (CellType.point, 1),
    1: (CellType.interval, 2),
    2: (CellType.triangle, 3),
    3: (CellType.quad, 4),
    4: (CellType.tetra, 4),
    5: (CellType.hexahedron, 8),
}

# gmsh hexahedron vertex order -> tpufem tensor order (x fastest)
_HEX_PERM = np.array([0, 1, 3, 2, 4, 5, 7, 6], dtype=np.int64)
# gmsh quad (ccw loop) -> tpufem tensor order
_QUAD_PERM = np.array([0, 1, 3, 2], dtype=np.int64)


def read_gmsh(path: str) -> Mesh:
    """Read a gmsh 2.2 ASCII file.

    The highest-dimensional element block becomes the cells (with the
    first tag — the physical tag — as ``cell_tags``); lower-dimensional
    tagged elements become ``entity_tags`` per dimension, matching the
    cell/facet MeshTags pair the reference reads (FEniCSx/...cc:159-162).
    """
    with open(path) as fh:
        lines = fh.read().splitlines()

    i = 0
    n = len(lines)
    nodes = None
    node_ids = None
    elems_by_type: Dict[str, List[List[int]]] = {}
    tags_by_type: Dict[str, List[int]] = {}

    while i < n:
        line = lines[i].strip()
        if line == "$MeshFormat":
            version = lines[i + 1].split()[0]
            if not version.startswith("2."):
                raise ValueError(f"only gmsh 2.x ASCII supported, got {version}")
            i += 3
        elif line == "$Nodes":
            count = int(lines[i + 1])
            node_ids = np.empty(count, dtype=np.int64)
            nodes = np.empty((count, 3), dtype=np.float64)
            for k in range(count):
                parts = lines[i + 2 + k].split()
                node_ids[k] = int(parts[0])
                nodes[k] = [float(parts[1]), float(parts[2]), float(parts[3])]
            i += 2 + count + 1
        elif line == "$Elements":
            count = int(lines[i + 1])
            for k in range(count):
                parts = lines[i + 2 + k].split()
                etype = int(parts[1])
                ntags = int(parts[2])
                if etype not in _GMSH_TYPES:
                    continue
                ctype, nv = _GMSH_TYPES[etype]
                phys = int(parts[3]) if ntags >= 1 else 0
                verts = [int(v) for v in parts[3 + ntags : 3 + ntags + nv]]
                elems_by_type.setdefault(ctype, []).append(verts)
                tags_by_type.setdefault(ctype, []).append(phys)
            i += 2 + count + 1
        else:
            i += 1

    if nodes is None or not elems_by_type:
        raise ValueError(f"no nodes/elements found in {path}")

    # gmsh node ids are 1-based but may be non-contiguous: build id->index
    id_to_idx = np.full(int(node_ids.max()) + 1, -1, dtype=np.int64)
    id_to_idx[node_ids] = np.arange(len(node_ids))

    # pick the highest-dimensional block as cells
    from tpufem.mesh.mesh import CELL_INFO

    cell_type = max(elems_by_type, key=lambda t: CELL_INFO[t]["dim"])
    tdim = CELL_INFO[cell_type]["dim"]

    def to_array(ctype: str) -> np.ndarray:
        arr = np.asarray(elems_by_type[ctype], dtype=np.int64)
        arr = id_to_idx[arr]
        if ctype == CellType.hexahedron:
            arr = arr[:, _HEX_PERM]
        elif ctype == CellType.quad:
            arr = arr[:, _QUAD_PERM]
        return arr.astype(INDEX_DTYPE)

    cells = to_array(cell_type)
    cell_tags = np.asarray(tags_by_type[cell_type], dtype=INDEX_DTYPE)

    # geometric dim: drop trailing zero coordinate axes for 1D/2D meshes
    gdim = 3
    if tdim < 3 and np.allclose(nodes[:, 2], 0.0):
        gdim = 2
    x = np.ascontiguousarray(nodes[:, :gdim])

    mesh = Mesh(x=x, cells=cells, cell_type=cell_type, cell_tags=cell_tags)

    for ctype, rows in elems_by_type.items():
        dim = CELL_INFO[ctype]["dim"]
        if ctype == cell_type or dim >= tdim:
            continue
        ents = to_array(ctype)
        if dim > 0:
            ents = np.sort(ents, axis=1)  # canonical vertex order for matching
        mesh.entity_tags[dim] = MeshTags(
            dim=dim,
            entities=ents,
            values=np.asarray(tags_by_type[ctype], dtype=INDEX_DTYPE),
        )
    return mesh
