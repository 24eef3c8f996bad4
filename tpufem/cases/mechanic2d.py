"""mechanic2d — the reference study's full workload, TPU-native.

2D plane-strain asymmetric elasto-damage elasticity on a (polycrystal)
mesh: mesh read + refine, damage construction + smoothing, per-grain
Young's modulus from physical tags (glibc srand(6575) sequence,
bit-identical to the C++/Python references), volumetric load, Dirichlet
BCs, Newton–Krylov solve, DG0 strain/stress/energy postprocessing, and
the 16-phase profiling table.

Mirrors, phase by phase, ``FEniCSx/mechanic2d/asym_elasto_damage_model.cc``
(main at :105-1220) and ``MFEM/mechanic2d/asym_elasto_damage_model.cc``
(main at :956-1800); physics definitions from ``asym_ufl.py``.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from tpufem import config as tconfig
from tpufem.assemble import Assembler
from tpufem.cases import damage as damage_mod
from tpufem.config import Mechanic2DConfig
from tpufem.forms import EnergyFunctional, asym_damage_psi
from tpufem.forms.form import Coefficient, Term
from tpufem.la import jacobi_preconditioner
from tpufem.mesh import read_gmsh, refine_uniform
from tpufem.nls import NewtonSolver
from tpufem.perf import PhaseTimers
from tpufem.spaces import DirichletBC, FunctionSpace
from tpufem.spaces.bc import locate_dofs_geometrical
from tpufem.utils import GlibcRand

NU = 0.3  # Poisson ratio (FEniCSx/...cc:254)
EPS_GEOM = 1.0e-9  # coordinate predicate tolerance


def young_modulus_range(use_ecst: bool = False) -> np.ndarray:
    """200 semi-random E values in [5e6, 1e8] keyed by physical tag,
    glibc srand(6575) — bit-identical to FEniCSx/...cc:532-542."""
    rng = GlibcRand(6575)
    a = (1.0e8 - 5.0e6) / 199.0
    vals = np.array([a * (rng.rand() % 200) + 5.0e6 for _ in range(200)])
    if use_ecst:
        vals[:] = 1.0e6
    return vals


def volumetric_load(x: np.ndarray) -> np.ndarray:
    """f = ((1600 (y−.5)² − 500)·(−100000 (x−.5)³), 0)
    (doc.tex:226-232; FEniCSx/...cc:563-585)."""
    r = x[:, 0] - 0.5
    y = x[:, 1] - 0.5
    fx = (1600.0 * y * y - 500.0) * (-100000.0 * r * r * r)
    return np.stack([fx, np.zeros_like(fx)], axis=1)


@dataclasses.dataclass
class Mechanic2DResult:
    mesh: object
    V: FunctionSpace
    u: jnp.ndarray
    d: jnp.ndarray
    E_cell: jnp.ndarray
    strain: np.ndarray  # (nc, 3) [e11, e12, e22] at centroid
    stress: np.ndarray  # (nc, 3)
    energy: np.ndarray  # (nc,)
    newton_iterations: int
    krylov_iters: list
    residual_norms: list
    timers: PhaseTimers


def setup(cfg: Optional[Mechanic2DConfig] = None, mesh=None, timers=None):
    """Build the problem (mesh → assembler + coefficient arrays).

    Returns (assembler, coeffs dict, V, mesh, aux dict). Split from
    ``solve`` so benchmarks can time phases separately.
    """
    cfg = cfg or Mechanic2DConfig()
    tm = timers or PhaseTimers()
    dtype = tconfig.default_dtype()

    with tm.phase("2.1 Read mesh"):
        if mesh is None:
            path = cfg.mesh_path or tconfig.data_path("square.msh")
            mesh = read_gmsh(path)
    with tm.phase("2.2 Refine mesh"):
        for _ in range(cfg.max_refine):
            mesh = refine_uniform(mesh)

    with tm.phase("3.1 Define space"):
        # displacement space degree from config (1 = reference; 2 = the
        # P2/Q2 variant of BASELINE config 2); damage stays P1 on mesh
        # nodes (the smoothing algorithm is node-based)
        V = FunctionSpace.create(mesh, cfg.degree, bs=2)
        DS = FunctionSpace.create(mesh, 1, bs=1)  # damage (P1 scalar)
        ES = FunctionSpace.create(mesh, 0, bs=1)  # Young modulus (DG0)

    with tm.phase("3.2 Define damage"):
        tag_list = (
            damage_mod.SQUARE_DAMAGED_EDGE_TAGS
            if 1 in mesh.entity_tags and mesh.n_nodes < 1000
            else damage_mod.NEPER_DAMAGED_EDGE_TAGS
        )
        d0 = damage_mod.initial_damage(mesh, tag_list, cfg.max_dam)
        d = damage_mod.smooth_damage(
            mesh, jnp.asarray(d0, dtype=dtype),
            iterations=8 * (cfg.max_refine + 1),
        )
        d = jax.block_until_ready(d)

    with tm.phase("4.1 Material constant"):
        E_range = young_modulus_range(cfg.use_ecst)
        tags = (
            mesh.cell_tags
            if mesh.cell_tags is not None
            else np.zeros(mesh.n_cells, dtype=np.int64)
        )
        E_cell = jnp.asarray(E_range[tags % 200], dtype=dtype)

    with tm.phase("5.2 Neumann setting"):
        f_fn = None
        if cfg.use_volume:
            fvals = volumetric_load(V.dof_coords)
            f_vec = jnp.asarray(fvals.reshape(-1), dtype=dtype)
        else:
            f_vec = jnp.zeros(V.n_dofs, dtype=dtype)

    with tm.phase("5.1 Dirichlet setting"):
        left = locate_dofs_geometrical(
            V, lambda x: np.abs(x[:, 0]) < EPS_GEOM
        )
        right = locate_dofs_geometrical(
            V, lambda x: np.abs(x[:, 0] - 1.0) < EPS_GEOM
        )
        imp = 0.01 if cfg.use_trac else -0.01  # USE_TRAC (driver :642-646)
        bcs = [
            DirichletBC(V, left, [0.0, 0.0]),
            DirichletBC(V, right, [imp, 0.0]),
        ]

    with tm.phase("7.1 Nonlinear form creation"):
        # stiffness at quadrature degree 1, load at default (degree 2) —
        # the reference's Measure metadata split (asym_ufl.py:78-81)
        qdeg_stiff = 1 if cfg.degree == 1 else 2 * cfg.degree
        stiffness = Term(
            integrand=lambda qp: asym_damage_psi(
                qp.eps, qp.coeff("d"), qp.coeff("E"), NU
            ),
            degree=qdeg_stiff,
        )
        load = Term(
            integrand=lambda qp: -jnp.dot(qp.coeff("f"), qp.u),
            degree=cfg.degree + 1,
        )
        functional = EnergyFunctional(
            V,
            [stiffness, load],
            [Coefficient("d", DS), Coefficient("E", ES), Coefficient("f", V)],
        )
        asm = Assembler(functional, bcs)

    coeffs = {"d": d, "E": E_cell, "f": f_vec}
    aux = dict(cfg=cfg, DS=DS, ES=ES, timers=tm)
    return asm, coeffs, V, mesh, aux


def postprocess(asm: Assembler, u: jnp.ndarray, coeffs,
                batch: Optional[int] = None):
    """Centroid strain/stress/energy per cell as reduced vectors
    [t11, t12, t22] — the reference's three DG0 expressions
    (asym_ufl.py:86-97, interpolated at FEniCSx/...cc:909-941).

    ``batch``: evaluate in cell slabs of this size (lax.map) so the
    kernel's temporaries stay bounded at multi-million-cell meshes
    (same contract as Assembler.residual's ``batch``)."""
    func = asm.functional
    V = func.space
    x_cells = func.x_cells
    u_cells = func.gather(u)
    c_cells = func.gather_coeffs(coeffs)
    from tpufem.elements.quadrature import quadrature

    qpts, _ = quadrature(V.mesh.cell_type, 1)  # centroid for P1 triangles
    dN_ref = V.element.tabulate_grad(qpts)[0]  # (ndof, dim)
    dNg_ref = func.geom_element.tabulate_grad(qpts)[0]

    from tpufem.elements.geometry import inv as small_inv

    def per_cell(u_e, x_e, d_e, E_e):
        J = x_e.T @ jnp.asarray(dNg_ref, dtype=u_e.dtype)
        dN = jnp.asarray(dN_ref, dtype=u_e.dtype) @ small_inv(J)
        grad_u = u_e.reshape(-1, 2).T @ dN
        eps = 0.5 * (grad_u + grad_u.T)
        d_c = jnp.mean(d_e)  # P1 value at centroid = mean of vertices
        sig = jax.grad(lambda e: asym_damage_psi(e, d_c, E_e[0], NU))(eps)
        sig = 0.5 * (sig + sig.T)
        energy = jnp.sum(eps * sig)
        return (
            jnp.array([eps[0, 0], eps[0, 1], eps[1, 1]]),
            jnp.array([sig[0, 0], sig[0, 1], sig[1, 1]]),
            energy,
        )

    kernel = jax.vmap(
        per_cell, in_axes=(-1, -1, -1, -1), out_axes=(-1, -1, -1)
    )
    args = (u_cells, x_cells.astype(u.dtype), c_cells["d"], c_cells["E"])
    if batch and u_cells.shape[-1] > batch:
        from tpufem.assemble.assembler import _map_cell_slabs

        strain, stress, energy = _map_cell_slabs(
            lambda a: kernel(*a), args, batch
        )
    else:
        strain, stress, energy = kernel(*args)
    return np.asarray(strain).T, np.asarray(stress).T, np.asarray(energy)


def run(cfg: Optional[Mechanic2DConfig] = None, mesh=None) -> Mechanic2DResult:
    cfg = cfg or Mechanic2DConfig()
    tm = PhaseTimers()
    with tm.phase("1 Initialize"):
        tconfig.enable_persistent_cache()
        dtype = tconfig.default_dtype()

    asm, coeffs, V, mesh, aux = setup(cfg, mesh=mesh, timers=tm)

    with tm.phase("7.2 Solver creation"):
        solver = NewtonSolver(cfg.solver)

    with tm.phase("7.3 NonLinear resolution"):
        # jitted callback wrappers: tracing the vmapped grad/hessian
        # element pipeline costs ~0.7 s per transform on host — jit once
        # (asm passed as a pytree argument) so every later Newton
        # iteration hits the pjit trace cache instead of re-deriving
        rhs_j = jax.jit(lambda a, w, c: a.lifted_rhs(w, c))
        act_j = jax.jit(lambda a, w, c, v: a.constrained_action(w, c)(v))
        diag_j = jax.jit(lambda a, w, c: a.diagonal(w, c))
        res = solver.solve(
            jnp.zeros(V.n_dofs, dtype=dtype),
            rhs=lambda w: rhs_j(asm, w, coeffs),
            operator=lambda w: (lambda v: act_j(asm, w, coeffs, v)),
            precond=lambda w: jacobi_preconditioner(diag_j(asm, w, coeffs)),
        )
        u = jax.block_until_ready(res.u)

    with tm.phase("8.1 strain/stress computation"):
        strain, stress, energy = postprocess(asm, u, coeffs)

    with tm.phase("8 Outputs"):
        if cfg.output_dir is not None:
            # the reference's output phase: displacement + damage as
            # point fields, E/strain/stress/energy as cell fields
            # (FEniCSx/...cc:946-1032 writes XDMF/VTX per space)
            import os

            from tpufem.io import write_vtu, write_xdmf

            os.makedirs(cfg.output_dir, exist_ok=True)
            uu = np.asarray(u).reshape(-1, 2)
            point_data = {"u": uu, "d": np.asarray(coeffs["d"])}
            cell_data = {
                "E": np.asarray(coeffs["E"]),
                "strain": strain,
                "stress": stress,
                "energy": energy,
            }
            write_vtu(
                os.path.join(cfg.output_dir, "mechanic2d.vtu"),
                mesh, point_data=point_data, cell_data=cell_data,
            )
            write_xdmf(
                os.path.join(cfg.output_dir, "mechanic2d.xdmf"),
                mesh, point_data=point_data, cell_data=cell_data,
            )

    tm.finish()
    return Mechanic2DResult(
        mesh=mesh, V=V, u=u, d=coeffs["d"], E_cell=coeffs["E"],
        strain=strain, stress=stress, energy=energy,
        newton_iterations=res.iterations, krylov_iters=res.krylov_iters,
        residual_norms=res.residual_norms, timers=tm,
    )
