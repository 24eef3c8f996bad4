"""Linear algebra: Krylov solvers + preconditioners.

TPU-native equivalent of reference L1 (PETSc KSP CG + hypre BoomerAMG,
FEniCSx/mechanic2d/asym_elasto_damage_model.cc:717-813). All reductions
are jnp dots — under shard_map they lower to psum over ICI, replacing
MPI_Allreduce inside PETSc's VecDot/VecNorm.
"""

from tpufem.la.cg import cg, CGResult
from tpufem.la.precond import jacobi_preconditioner, chebyshev_preconditioner

__all__ = ["cg", "CGResult", "jacobi_preconditioner", "chebyshev_preconditioner"]
