"""Distributed-layer tests on the 8-virtual-device CPU mesh — the TPU
analog of the reference's mpirun -np 8 runs (SURVEY.md §4).

Determinism/equivalence across device counts replaces the reference's
cross-rank validation: the sharded solve must agree with the
single-device solve to machine precision.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpufem.assemble import Assembler
from tpufem.config import SolverConfig
from tpufem.forms import EnergyFunctional, asym_damage_psi, linear_elastic_psi
from tpufem.forms.form import Coefficient, Term
from tpufem.mesh import unit_square
from tpufem.nls.newton_jit import make_newton_solver
from tpufem.parallel import DistributedProblem, partition_mesh
from tpufem.spaces import DirichletBC, FunctionSpace
from tpufem.spaces.bc import locate_dofs_geometrical

E, NU = 1.0e6, 0.3


def _problem(n=10):
    mesh = unit_square(n)
    V = FunctionSpace.create(mesh, 1, bs=2)
    DS = FunctionSpace.create(mesh, 1, bs=1)
    d_np = np.zeros(DS.n_dofs)
    d_np[DS.dof_coords[:, 1] > 0.6] = 0.4
    stiff = Term(
        integrand=lambda qp: asym_damage_psi(qp.eps, qp.coeff("d"), E, NU),
        degree=1,
    )
    F = EnergyFunctional(V, [stiff], [Coefficient("d", DS)])
    left = locate_dofs_geometrical(V, lambda x: np.abs(x[:, 0]) < 1e-12)
    right = locate_dofs_geometrical(V, lambda x: np.abs(x[:, 0] - 1) < 1e-12)
    bcs = [
        DirichletBC(V, left, [0.0, 0.0]),
        DirichletBC(V, right, [0.01, 0.0]),
    ]
    return mesh, V, F, bcs, {"d": jnp.asarray(d_np)}


def test_partition_covers_everything():
    mesh, V, F, bcs, coeffs = _problem(8)
    part = partition_mesh(V, 4)
    # every cell appears exactly once
    allc = part.cell_global[part.cell_mask]
    assert sorted(allc.tolist()) == list(range(mesh.n_cells))
    # every dof owned exactly once
    owned = part.local_to_global[part.owned_mask]
    assert sorted(owned.tolist()) == list(range(V.n_scalar_dofs))
    # ghosts reference real dofs
    gmask = (~part.owned_mask) & (part.local_to_global >= 0)
    assert (part.local_to_global[gmask] < V.n_scalar_dofs).all()


@pytest.mark.parametrize("n_shards", [2, 4, 8])
def test_distributed_matches_single_device(n_shards):
    mesh, V, F, bcs, coeffs = _problem(10)
    cfg = SolverConfig()
    asm = Assembler(F, bcs)
    res1 = make_newton_solver(asm, cfg)(jnp.zeros(V.n_dofs), coeffs)
    dp = DistributedProblem(F, bcs, n_shards)
    solve = dp.make_solver(cfg)
    u_loc, stats = solve(
        dp.shard_vector(np.zeros(V.n_dofs)), dp.shard_coeffs(coeffs)
    )
    u = dp.unshard_vector(u_loc)
    st = np.asarray(stats)[0]
    assert int(st[0]) == int(res1.newton_iters)
    err = np.abs(u - np.asarray(res1.u)).max()
    assert err < 1e-12, err


def test_distributed_determinism_across_shard_counts():
    mesh, V, F, bcs, coeffs = _problem(9)
    cfg = SolverConfig()
    sols = []
    for s in (2, 8):
        dp = DistributedProblem(F, bcs, s)
        u_loc, _ = dp.make_solver(cfg)(
            dp.shard_vector(np.zeros(V.n_dofs)), dp.shard_coeffs(coeffs)
        )
        sols.append(dp.unshard_vector(u_loc))
    assert np.abs(sols[0] - sols[1]).max() < 1e-12


def test_halo_roundtrip_identity():
    """scatter_fwd then read ghosts = owner values (the IndexMap
    contract, FEniCSx/...cc:390-397)."""
    mesh, V, F, bcs, coeffs = _problem(6)
    dp = DistributedProblem(F, bcs, 4)
    rng = np.random.default_rng(0)
    u_g = rng.normal(size=V.n_dofs)
    u_loc = np.asarray(dp.shard_vector(u_g))
    # shard_vector fills ghosts from global — unshard must return exactly
    np.testing.assert_allclose(dp.unshard_vector(u_loc), u_g)


def test_graft_entry_dryrun():
    import sys, os

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __graft_entry__ as g

    fn, args = g.entry()
    r, diag = jax.jit(fn)(*args)
    assert bool(jnp.isfinite(r).all()) and bool(jnp.isfinite(diag).all())
    g.dryrun_multichip(8)


def test_sharded_damage_smoothing_matches_single_device():
    """SURVEY §3.5: the damage-smoothing stencil as a multi-device
    integration test — owned-edge partial sums + scatter_rev(add) +
    owner max + scatter_fwd. Deterministic, and equal to the
    single-device loop to summation-order roundoff."""
    import tpufem.config as tconfig
    from tpufem.cases import damage as dm
    from tpufem.mesh import read_gmsh
    from tpufem.mesh.refine import refine_uniform

    mesh = refine_uniform(read_gmsh(tconfig.data_path("square.msh")))
    d0 = dm.initial_damage(mesh, (4,), 1.0)
    ref = np.asarray(dm.smooth_damage(mesh, jnp.asarray(d0), iterations=8))
    for S in (2, 8):
        got = np.asarray(
            dm.smooth_damage_sharded(mesh, d0, iterations=8, n_shards=S)
        )
        assert np.abs(got - ref).max() < 1e-14, S
    # deterministic: identical bits across repeated sharded runs
    again = np.asarray(
        dm.smooth_damage_sharded(mesh, d0, iterations=8, n_shards=8)
    )
    got8 = np.asarray(
        dm.smooth_damage_sharded(mesh, d0, iterations=8, n_shards=8)
    )
    assert (again == got8).all()


def test_sharded_smoothing_unstructured():
    from tpufem.cases import damage as dm
    from tpufem.cases.polycrystal import generate_polycrystal

    pm = generate_polycrystal(20, n_grains=8)
    d0 = np.zeros(pm.n_nodes)
    d0[np.abs(pm.x[:, 1] - 0.5) < 0.08] = 1.0
    ref = np.asarray(dm.smooth_damage(pm, jnp.asarray(d0), iterations=6))
    got = np.asarray(
        dm.smooth_damage_sharded(pm, d0, iterations=6, n_shards=8)
    )
    assert np.abs(got - ref).max() < 1e-14
