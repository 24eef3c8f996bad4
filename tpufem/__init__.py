"""tpufem — a TPU-native finite element framework in JAX.

Built from scratch against the capability surface of the reference study
``SalzmanA/fem-libraries`` (FEniCSx 0.8.0 + MFEM 4.7.0 implementations of a
distributed nonlinear elasto-damage elasticity workload). See SURVEY.md for
the blueprint and the file:line citations into ``/root/reference``.

Layering (bottom-up), mirroring SURVEY.md §7.1:

- :mod:`tpufem.mesh`      — host-side mesh ingestion, topology, refinement,
  partitioning (reference L2: dolfinx::mesh / mfem::ParMesh).
- :mod:`tpufem.elements`  — reference elements, quadrature, geometry
  (reference: basix tabulation / mfem FiniteElementCollection).
- :mod:`tpufem.spaces`    — function spaces, dofmaps, boundary conditions
  (reference L3: dolfinx::fem::FunctionSpace / mfem::ParFiniteElementSpace).
- :mod:`tpufem.forms`     — physics as energy densities; jax.grad/jax.hessian
  replace UFL-diff, SymPy, and dual-number AD (reference L4/L5).
- :mod:`tpufem.assemble`  — batched element kernels + segment-sum scatter
  assembly, Dirichlet lifting (reference L3 assembly).
- :mod:`tpufem.la`        — vectors, CG, preconditioners (reference L1:
  PETSc KSP + hypre BoomerAMG).
- :mod:`tpufem.nls`       — Newton solver (reference: dolfinx/mfem
  NewtonSolver).
- :mod:`tpufem.parallel`  — device meshes, owner/ghost halo exchange over
  ICI (reference L0: MPI scatter_fwd/scatter_rev).
- :mod:`tpufem.io`        — field output, checkpointing.
- :mod:`tpufem.perf`      — the reference's 16-phase profiling table.
- :mod:`tpufem.cases`     — complete workloads (mechanic2d, ...).
"""

__version__ = "0.1.0"

from tpufem import config as config

# Host allocator: route NumPy's data memory through the
# mmap+MADV_POPULATE_WRITE arena (native/hostmem.c). On the
# snapshot-restored build VMs, first-touch page faults run at ~9 MB/s
# while kernel-side population runs at GB/s — without this, large host
# preprocessing (mesh gen, lane planning, gather tables) is fault-bound.
# Silent no-op if the toolchain is missing; TPUFEM_NO_HOSTMEM disables.
from tpufem import hostmem as hostmem

hostmem.install()

__all__ = ["config", "hostmem", "__version__"]
