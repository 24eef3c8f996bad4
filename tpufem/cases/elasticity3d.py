"""3D linear elasticity on a hex mesh, matrix-free Chebyshev-CG.

BASELINE.json config 3: "3D linear elasticity on hex mesh, matrix-free
Chebyshev-preconditioned CG (no explicit sparse matrix)". This is the
10M-DoF <5 s target workload. Q1 hexes use 2×2×2 Gauss quadrature; the
operator is the JVP action of the assembled-energy gradient — no sparse
matrix ever exists.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from tpufem.assemble import Assembler
from tpufem.config import SolverConfig
from tpufem.forms import EnergyFunctional, linear_elastic_psi
from tpufem.forms.form import Coefficient, Term
from tpufem.mesh import box
from tpufem.mesh.mesh import CellType
from tpufem.nls.newton_jit import make_newton_solver
from tpufem.spaces import DirichletBC, FunctionSpace
from tpufem.spaces.bc import locate_dofs_geometrical


@dataclasses.dataclass
class Elasticity3DConfig:
    n: int = 16  # elements per side
    E: float = 1.0e6
    nu: float = 0.3
    imposed: float = 0.01  # x-displacement on x=1 face
    cell_type: str = CellType.hexahedron
    matrix_free: bool = True
    solver: SolverConfig = dataclasses.field(
        default_factory=lambda: SolverConfig(
            preconditioner="chebyshev", cg_rtol=1e-10
        )
    )


def setup(cfg: Elasticity3DConfig):
    mesh = box(cfg.n, cfg.n, cfg.n, cell_type=cfg.cell_type)
    V = FunctionSpace.create(mesh, 1, bs=3)
    qdeg = 2 if cfg.cell_type == CellType.hexahedron else 1
    stiff = Term(
        integrand=lambda qp: linear_elastic_psi(qp.eps, cfg.E, cfg.nu),
        degree=qdeg,
    )
    F = EnergyFunctional(V, [stiff])
    left = locate_dofs_geometrical(V, lambda x: np.abs(x[:, 0]) < 1e-12)
    right = locate_dofs_geometrical(V, lambda x: np.abs(x[:, 0] - 1) < 1e-12)
    bcs = [
        DirichletBC(V, left, [0.0, 0.0, 0.0]),
        DirichletBC(V, right, [cfg.imposed, 0.0, 0.0]),
    ]
    return Assembler(F, bcs), V, mesh


def run(cfg: Optional[Elasticity3DConfig] = None):
    cfg = cfg or Elasticity3DConfig()
    asm, V, mesh = setup(cfg)
    from tpufem.config import default_dtype

    dtype = default_dtype()
    solve = make_newton_solver(asm, cfg.solver, use_matrix=not cfg.matrix_free)
    res = solve(jnp.zeros(V.n_dofs, dtype=dtype), {})
    return res, V, mesh
