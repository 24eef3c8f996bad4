"""Neo-Hookean hyperelasticity with AD consistent tangents, Newton-Krylov.

BASELINE.json config 4: "Neo-Hookean hyperelasticity with jax.jacfwd
consistent tangents (replaces admfem dual numbers), Newton-Krylov".
The tangent the reference computes with nested dual numbers
(MFEM/mechanic2d/autodiff/admfem.hpp:672-699: dual<dual<>,dual<>>
Hessian of the Potential functor, state_size(state_size+1)/2 evals) is
jax.hessian of the same scalar potential here — identical math, one
line, fused into the batched element kernel.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp
import numpy as np

from tpufem.assemble import Assembler
from tpufem.config import SolverConfig
from tpufem.forms import EnergyFunctional, neo_hookean_psi
from tpufem.forms.form import Term
from tpufem.mesh import box, unit_square
from tpufem.mesh.mesh import CellType
from tpufem.nls.newton_jit import make_newton_solver
from tpufem.spaces import DirichletBC, FunctionSpace
from tpufem.spaces.bc import locate_dofs_geometrical


@dataclasses.dataclass
class NeoHookeanConfig:
    n: int = 8
    dim: int = 3
    E: float = 1.0e6
    nu: float = 0.3
    stretch: float = 0.2  # finite-strain imposed displacement
    solver: SolverConfig = dataclasses.field(
        default_factory=lambda: SolverConfig(
            cg_rtol=1e-10, newton_maxit=20, newton_rtol=1e-9
        )
    )


def setup(cfg: NeoHookeanConfig):
    if cfg.dim == 3:
        mesh = box(cfg.n, cfg.n, cfg.n, cell_type=CellType.hexahedron)
        bs, qdeg = 3, 2
    else:
        mesh = unit_square(cfg.n)
        bs, qdeg = 2, 2
    V = FunctionSpace.create(mesh, 1, bs=bs)
    stiff = Term(
        integrand=lambda qp: neo_hookean_psi(qp.grad_u, cfg.E, cfg.nu),
        degree=qdeg,
    )
    F = EnergyFunctional(V, [stiff])
    left = locate_dofs_geometrical(V, lambda x: np.abs(x[:, 0]) < 1e-12)
    right = locate_dofs_geometrical(V, lambda x: np.abs(x[:, 0] - 1) < 1e-12)
    fixed = [0.0] * bs
    pulled = [cfg.stretch] + [0.0] * (bs - 1)
    bcs = [DirichletBC(V, left, fixed), DirichletBC(V, right, pulled)]
    return Assembler(F, bcs), V, mesh


def run(cfg: Optional[NeoHookeanConfig] = None):
    cfg = cfg or NeoHookeanConfig()
    asm, V, mesh = setup(cfg)
    from tpufem.config import default_dtype

    solve = make_newton_solver(asm, cfg.solver, use_matrix=True)
    res = solve(jnp.zeros(V.n_dofs, dtype=default_dtype()), {})
    return res, V, mesh
