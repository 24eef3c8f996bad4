"""Facet (Neumann/traction) integral tests.

The reference's surface-load machinery (USE_SURF subdomains,
FEniCSx/mechanic2d/asym_elasto_damage_model.cc:589-608) validated against
the plane-strain uniaxial-traction analytic solution.
"""

import jax.numpy as jnp
import numpy as np

from tpufem.assemble import Assembler
from tpufem.config import SolverConfig
from tpufem.forms import EnergyFunctional, linear_elastic_psi
from tpufem.forms.form import FacetTerm, Term
from tpufem.la import jacobi_preconditioner
from tpufem.mesh import unit_square
from tpufem.mesh.topology import locate_entities_boundary
from tpufem.nls import NewtonSolver
from tpufem.spaces import DirichletBC, FunctionSpace
from tpufem.spaces.bc import locate_dofs_geometrical

E, NU = 1.0e6, 0.3


def test_uniaxial_traction_plane_strain():
    mesh = unit_square(8)
    V = FunctionSpace.create(mesh, 1, bs=2)
    t = 1000.0
    right = locate_entities_boundary(
        mesh, 1, lambda x: np.abs(x[:, 0] - 1) < 1e-12
    )
    stiff = Term(
        integrand=lambda qp: linear_elastic_psi(qp.eps, E, NU), degree=1
    )
    trac = FacetTerm(integrand=lambda f: -t * f.u[0], degree=2, facets=right)
    F = EnergyFunctional(V, [stiff], facet_terms=[trac])
    left_x = locate_dofs_geometrical(V, lambda x: np.abs(x[:, 0]) < 1e-12)
    bot_y = locate_dofs_geometrical(V, lambda x: np.abs(x[:, 1]) < 1e-12)
    bcs = [
        DirichletBC(V, left_x, 0.0, components=[0]),
        DirichletBC(V, bot_y, 0.0, components=[1]),
    ]
    asm = Assembler(F, bcs)
    res = NewtonSolver(SolverConfig()).solve(
        jnp.zeros(V.n_dofs),
        rhs=lambda w: asm.lifted_rhs(w, {}),
        operator=lambda w: asm.constrained_action(w, {}),
        precond=lambda w: jacobi_preconditioner(asm.diagonal(w, {})),
    )
    uu = np.asarray(res.u).reshape(-1, 2)
    exx = t * (1 - NU**2) / E
    eyy = -NU * (1 + NU) * t / E
    assert np.abs(uu[:, 0] - exx * V.dof_coords[:, 0]).max() < 1e-12
    assert np.abs(uu[:, 1] - eyy * V.dof_coords[:, 1]).max() < 1e-12


def test_pressure_normal_consistency():
    """Pressure on the whole boundary of a square with pinned corners:
    total facet-energy gradient must equal -p * outward flux integral,
    i.e. residual sums to zero by divergence theorem when u is affine."""
    mesh = unit_square(6)
    V = FunctionSpace.create(mesh, 1, bs=2)
    p = 500.0
    allb = locate_entities_boundary(mesh, 1, lambda x: np.ones(len(x), bool))
    term = FacetTerm(
        integrand=lambda f: p * jnp.dot(f.normal, f.u), degree=2, facets=allb
    )
    F = EnergyFunctional(V, [], facet_terms=[term])
    asm = Assembler(F, [])
    # residual at any u is the discrete p*n load; its sum over each
    # component must vanish (closed surface): sum n dGamma = 0
    u = jnp.zeros(V.n_dofs)
    r = np.asarray(asm.residual(u, {})).reshape(-1, 2)
    assert np.abs(r.sum(axis=0)).max() < 1e-10
    # and the total outward-flux energy of u = x is p * div(x) * vol = 2p
    ux = jnp.asarray(V.dof_coords.reshape(-1))
    en = float(asm.energy(ux, {}))
    assert np.isclose(en, 2.0 * p, rtol=1e-12)


def _traction_problem(n=8):
    mesh = unit_square(n)
    V = FunctionSpace.create(mesh, 1, bs=2)
    t = 1000.0
    right = locate_entities_boundary(
        mesh, 1, lambda x: np.abs(x[:, 0] - 1) < 1e-12
    )
    stiff = Term(
        integrand=lambda qp: linear_elastic_psi(qp.eps, E, NU), degree=1
    )
    trac = FacetTerm(integrand=lambda f: -t * f.u[0], degree=2, facets=right)
    F = EnergyFunctional(V, [stiff], facet_terms=[trac])
    left_x = locate_dofs_geometrical(V, lambda x: np.abs(x[:, 0]) < 1e-12)
    bot_y = locate_dofs_geometrical(V, lambda x: np.abs(x[:, 1]) < 1e-12)
    bcs = [
        DirichletBC(V, left_x, 0.0, components=[0]),
        DirichletBC(V, bot_y, 0.0, components=[1]),
    ]
    return mesh, V, F, bcs, t


def test_distributed_facet_solve_matches_flat():
    """Facet-loaded functional on DistributedProblem (the round-2
    silent-drop path, parallel/dist.py): the sharded Newton-Krylov must
    land on the flat solve / analytic plane-strain solution — boundary
    loads assemble on every path (VERDICT r2 item 4)."""
    from tpufem.parallel import DistributedProblem

    mesh, V, F, bcs, t = _traction_problem(8)
    cfg = SolverConfig(cg_rtol=1e-13, cg_maxit=4000)
    for n_shards in (2, 4):
        dp = DistributedProblem(F, bcs, n_shards)
        solve = dp.make_solver(cfg)
        u_loc, stats = solve(
            dp.shard_vector(np.zeros(V.n_dofs)),
            dp.shard_coeffs({}),
        )
        uu = dp.unshard_vector(u_loc).reshape(-1, 2)
        exx = t * (1 - NU**2) / E
        eyy = -NU * (1 + NU) * t / E
        assert np.abs(uu[:, 0] - exx * V.dof_coords[:, 0]).max() < 1e-10
        assert np.abs(uu[:, 1] - eyy * V.dof_coords[:, 1]).max() < 1e-10


def test_sharded_lane_engine_rejects_facets():
    """ShardedLaneEngine does not assemble facet terms yet — it must
    refuse loudly, never silently drop (the 'or raises' half of the
    every-path contract)."""
    import pytest

    from tpufem.lane.sharded import ShardedLaneEngine

    mesh, V, F, bcs, _t = _traction_problem(4)
    with pytest.raises(NotImplementedError):
        ShardedLaneEngine(F, bcs, 2)
