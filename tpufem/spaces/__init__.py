"""Function spaces, dofmaps, fields, Dirichlet BCs.

TPU-native equivalent of reference L3 space machinery:
``fem::create_functionspace`` + ``dofmap()->map()``
(FEniCSx/mechanic2d/asym_elasto_damage_model.cc:268-311) and
``ParFiniteElementSpace(pmesh, &fec, dim, Ordering::byVDIM)``
(MFEM/...cc:1107-1108). A dofmap is a static (n_cells, ndof_cell) int32
array; vector fields use block size ``bs`` with byVDIM interleaving
(dof = node * bs + component).
"""

from tpufem.spaces.space import FunctionSpace
from tpufem.spaces.function import Function
from tpufem.spaces.bc import DirichletBC, locate_dofs_topological, locate_dofs_geometrical

__all__ = [
    "FunctionSpace",
    "Function",
    "DirichletBC",
    "locate_dofs_topological",
    "locate_dofs_geometrical",
]
