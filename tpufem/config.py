"""Global configuration: dtype policy and runtime flags.

The reference runs everything in float64 (PETSc default scalar;
``FEniCSx/mechanic2d/asym_elasto_damage_model.cc`` uses ``PetscScalar``).
On TPU, float64 is emulated and slow; the MXU wants f32/bf16. tpufem keeps
the *solve* dtype a policy choice:

- ``f64``: bit-faithful to the reference (CPU tests, accuracy harness).
- ``f32``: TPU fast path; CG tolerances loosened accordingly, optionally
  compensated (Kahan) reductions for dot products.

Replaces the reference's three config tiers (compile-time macro matrix,
CLI options, PETSc options DB — SURVEY.md §5.6) with one dataclass layer.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def enable_x64() -> None:
    """Enable float64 in JAX (call before any tracing)."""
    jax.config.update("jax_enable_x64", True)


def default_dtype():
    """Solve dtype: f64 when x64 is enabled, else f32."""
    return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32


# Index dtype for dofmaps / connectivity. int32 everywhere (meshes below
# 2B entities), matching dolfinx's local int32 indices.
INDEX_DTYPE = np.int32


@dataclasses.dataclass
class SolverConfig:
    """Krylov + Newton settings.

    Defaults mirror the reference:
    - CG rtol 1e-12, maxit 2000  (FEniCSx/...cc:718 ``KSPSetTolerances``)
    - Newton rtol 1e-7, atol 5e-8, max_it 10 (FEniCSx/...cc:709-713)
    - convergence convention 'r0' (MFEM) or 'du0' (dolfinx); see
      doc.tex:2065-2068 for the 6-vs-4 iteration consequence.
    """

    cg_rtol: float = 1.0e-12
    cg_atol: float = 0.0
    cg_maxit: int = 2000
    newton_rtol: float = 1.0e-7
    newton_atol: float = 5.0e-8
    newton_maxit: int = 10
    convergence: str = "r0"  # 'r0' | 'du0'
    # 'none' | 'jacobi' | 'chebyshev' | 'block_jacobi' | 'amg'
    preconditioner: str = "jacobi"
    block_size: int = 128  # block_jacobi patch size (dofs)
    # SA-AMG knobs (preconditioner='amg'): V-cycle smoother degree,
    # strength drop tolerance, dense-coarse size. The hierarchy is built
    # host-side from the Jacobian at the initial iterate and *frozen*
    # across Newton iterations (a frozen preconditioner — same fixed
    # point, mildly more CG iterations late in Newton; the reference
    # re-runs BoomerAMG setup per iteration because MPI setup is cheap
    # relative to its solve, ours is a host round-trip).
    amg_degree: int = 2
    amg_theta: float = 0.0
    amg_coarse_size: int = 512
    # geometric-MG (structured path, preconditioner='mg'): measured
    # V(3,3) with band [lmax/8, 1.1 lmax] contracts ~0.4/cycle on 2D
    # elasticity (vs 0.6 at the SA-AMG smoother settings)
    mg_degree: int = 3
    error_on_nonconvergence: bool = True
    verbose: bool = False


@dataclasses.dataclass
class Mechanic2DConfig:
    """The reference workload's compile-time macro matrix as a dataclass.

    Mirrors FEniCSx/mechanic2d/asym_elasto_damage_model.cc:1-26 defaults:
    MAX_REFINE=0, MAX_DAM=1., USE_VOLUME, USE_TRAC, random E field.
    """

    max_refine: int = 0
    max_dam: float = 1.0
    use_volume: bool = True
    use_trac: bool = True  # +0.01 imposed displacement (else -0.01)
    use_ecst: bool = False  # constant E=1e6 (auto-disabled under use_trac)
    mesh_path: Optional[str] = None  # default: bundled square.msh
    degree: int = 1  # displacement-space degree (BASELINE config 2: P2/Q2)
    output_dir: Optional[str] = None  # write VTU/XDMF fields when set
    solver: SolverConfig = dataclasses.field(default_factory=SolverConfig)

    def __post_init__(self):
        if self.use_trac:
            # Reference: #ifdef USE_TRAC → #undef USE_ECST (driver :20-24)
            self.use_ecst = False


def data_path(name: str) -> str:
    """Path to a bundled data file (meshes for tests)."""
    here = os.path.dirname(os.path.abspath(__file__))
    return os.path.join(here, "data", name)


def is_remote_device_platform() -> bool:
    """True when the default JAX platform dispatches through a remote
    tunnel (the axon TPU relay): per-dispatch round trips are
    multi-millisecond and host->device uploads are bandwidth-bound
    there, so one-shot preprocessing loops over big index tables can be
    cheaper on the host. Detected from the tunnel's environment, not by
    touching the runtime (initializing the backend just to ask would
    itself pay the tunnel cost)."""
    if not os.environ.get("PALLAS_AXON_POOL_IPS"):
        return False
    import jax

    plats = jax.config.jax_platforms
    return not plats or "axon" in str(plats)


def enable_persistent_cache(path: str = None) -> None:
    """Point JAX's persistent compilation cache at <repo>/.jax_cache.

    Remote (axon-tunnel) TPU compiles and this host's XLA:CPU compiles
    are both slow enough (tens of seconds for small graphs) that every
    entry-point run should reuse compiled executables across processes.
    Safe to call repeatedly; no-op if a cache dir is already configured.
    """
    import jax

    if jax.config.jax_compilation_cache_dir:
        return
    if path is None:
        here = os.path.dirname(os.path.abspath(__file__))
        path = os.path.join(os.path.dirname(here), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
