"""Host-side mesh layer: ingestion, topology, refinement, partitioning.

TPU-native equivalent of reference L2 (dolfinx::mesh + mfem::(Par)Mesh):
all mesh preprocessing is one-time host NumPy producing static int32 SoA
arrays consumed by jitted device code. See SURVEY.md §2.2 rows
"Mesh file read" .. "Topology/connectivity queries".
"""

from tpufem.mesh.mesh import Mesh, CellType, CELL_INFO
from tpufem.mesh.gmsh import read_gmsh
from tpufem.mesh.generate import unit_square, rectangle, box
from tpufem.mesh.topology import (
    build_entities,
    cell_edges,
    vertex_to_entity,
    boundary_facets,
    locate_entities_boundary,
)
from tpufem.mesh.refine import refine_uniform, refine_marked

__all__ = [
    "Mesh",
    "CellType",
    "CELL_INFO",
    "read_gmsh",
    "unit_square",
    "rectangle",
    "box",
    "build_entities",
    "cell_edges",
    "vertex_to_entity",
    "boundary_facets",
    "locate_entities_boundary",
    "refine_uniform",
    "refine_marked",
]
