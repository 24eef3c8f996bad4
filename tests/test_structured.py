"""Structured fast-path tests: every op must match the unstructured
assembler on the same lattice mesh to roundoff, and the end-to-end solve
must be bit-identical."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpufem.assemble import Assembler
from tpufem.config import SolverConfig
from tpufem.forms import EnergyFunctional, asym_damage_psi
from tpufem.forms.form import Coefficient, Term
from tpufem.mesh import rectangle
from tpufem.nls.newton_jit import make_newton_solver
from tpufem.spaces import DirichletBC, FunctionSpace
from tpufem.spaces.bc import locate_dofs_geometrical
from tpufem.structured import StructuredGrid2D
from tpufem.structured.solve import make_grid_solver

E0, NU = 3.7e7, 0.3


@pytest.fixture(scope="module")
def problem():
    nx, ny = 7, 5
    mesh = rectangle(nx, ny)
    V = FunctionSpace.create(mesh, 1, bs=2)
    DS = FunctionSpace.create(mesh, 1, bs=1)
    ES = FunctionSpace.create(mesh, 0, bs=1)
    rng = np.random.default_rng(0)
    d = rng.uniform(0, 1, DS.n_dofs)
    E = rng.uniform(5e6, 1e8, mesh.n_cells)
    u = rng.normal(size=V.n_dofs) * 1e-3
    F = EnergyFunctional(
        V,
        [Term(lambda qp: asym_damage_psi(qp.eps, qp.coeff("d"),
                                         qp.coeff("E"), NU), 1)],
        [Coefficient("d", DS), Coefficient("E", ES)],
    )
    asm = Assembler(F, [])
    grid = StructuredGrid2D(
        nx=nx, ny=ny, hx=1 / nx, hy=1 / ny, bs=2,
        energy_density=lambda g, c: asym_damage_psi(
            0.5 * (g + g.T), c["d"], c["E"], NU
        ),
        field_kinds={"d": "vertex", "E": "cell"},
    )
    coeffs = {"d": jnp.asarray(d), "E": jnp.asarray(E)}
    fields = {
        "d": grid.vertex_grid(jnp.asarray(d)),
        "E": jnp.asarray(E.reshape(2, ny, nx)),
    }
    return asm, grid, coeffs, fields, jnp.asarray(u), V


def test_residual_matches(problem):
    asm, grid, coeffs, fields, u, V = problem
    ref = asm.residual(u, coeffs)
    got = grid.flatten(grid.residual(grid.unflatten(u), fields))
    assert float(jnp.abs(got - ref).max() / jnp.abs(ref).max()) < 1e-14


def test_diagonal_matches(problem):
    asm, grid, coeffs, fields, u, V = problem
    ref = asm.diagonal(u, coeffs)
    got = grid.flatten(grid.diagonal(grid.unflatten(u), fields))
    assert float(jnp.abs(got - ref).max() / jnp.abs(ref).max()) < 1e-14


def test_jvp_matches(problem):
    asm, grid, coeffs, fields, u, V = problem
    v = jnp.asarray(np.random.default_rng(1).normal(size=V.n_dofs))
    ref = asm.tangent_action(u, coeffs, v)
    got = grid.flatten(
        grid.tangent_action(grid.unflatten(u), fields, grid.unflatten(v))
    )
    assert float(jnp.abs(got - ref).max() / jnp.abs(ref).max()) < 1e-13


def test_energy_matches(problem):
    asm, grid, coeffs, fields, u, V = problem
    ref = float(asm.energy(u, coeffs))
    got = float(grid.energy(grid.unflatten(u), fields))
    assert abs(got - ref) < 1e-13 * abs(ref)


def test_load_matches(problem):
    asm, grid, coeffs, fields, u, V = problem
    f = jnp.asarray(np.random.default_rng(2).normal(size=V.n_dofs))
    F2 = EnergyFunctional(
        V.mesh and asm.functional.space,
        [Term(lambda qp: -jnp.dot(qp.coeff("f"), qp.u), 1)],
        [Coefficient("f", asm.functional.space)],
    )
    ref = -Assembler(F2, []).residual(jnp.zeros(V.n_dofs), {"f": f})
    got = grid.flatten(grid.load_residual(grid.unflatten(f)))
    assert float(jnp.abs(got - ref).max() / jnp.abs(ref).max()) < 1e-14


def test_end_to_end_solve_matches():
    nx = ny = 16
    mesh = rectangle(nx, ny)
    V = FunctionSpace.create(mesh, 1, bs=2)
    DS = FunctionSpace.create(mesh, 1, bs=1)
    d = np.zeros(DS.n_dofs)
    d[DS.dof_coords[:, 1] > 0.6] = 0.5
    F = EnergyFunctional(
        V,
        [Term(lambda qp: asym_damage_psi(qp.eps, qp.coeff("d"), E0, NU), 1)],
        [Coefficient("d", DS)],
    )
    bcs = [
        DirichletBC(V, locate_dofs_geometrical(
            V, lambda x: np.abs(x[:, 0]) < 1e-12), [0.0, 0.0]),
        DirichletBC(V, locate_dofs_geometrical(
            V, lambda x: np.abs(x[:, 0] - 1) < 1e-12), [0.01, 0.0]),
    ]
    asm = Assembler(F, bcs)
    r1 = make_newton_solver(asm, SolverConfig())(
        jnp.zeros(V.n_dofs), {"d": jnp.asarray(d)}
    )
    grid = StructuredGrid2D(
        nx=nx, ny=ny, hx=1 / nx, hy=1 / ny, bs=2,
        energy_density=lambda g, c: asym_damage_psi(
            0.5 * (g + g.T), c["d"], E0, NU
        ),
        field_kinds={"d": "vertex"},
    )
    free = np.ones((2, ny + 1, nx + 1))
    free[:, :, 0] = 0
    free[:, :, -1] = 0
    bcv = np.zeros((2, ny + 1, nx + 1))
    bcv[0, :, -1] = 0.01
    r2 = make_grid_solver(grid, SolverConfig())(
        jnp.zeros((2, ny + 1, nx + 1)),
        {"d": grid.vertex_grid(jnp.asarray(d))},
        jnp.asarray(free), jnp.asarray(bcv),
    )
    assert r2.converged
    err = float(jnp.abs(grid.flatten(r2.u) - r1.u).max())
    assert err < 1e-10, err


def test_sharded_grid_matches_single_device():
    """Row-sharded structured solve over 8 devices (recompute-at-seams
    halo via ppermute) must be bit-identical to the single-device path;
    27 rows over 8 shards exercises the padding masks."""
    from tpufem.structured.dist2d import DistStructuredGrid2D

    nx, ny = 20, 26
    grid = StructuredGrid2D(
        nx=nx, ny=ny, hx=1 / nx, hy=1 / ny, bs=2,
        energy_density=lambda g, c: asym_damage_psi(
            0.5 * (g + g.T), c["d"], E0, NU
        ),
        field_kinds={"d": "vertex"},
    )
    d = np.zeros((ny + 1, nx + 1))
    d[ny // 2 : ny // 2 + 3, :] = 0.5
    free = np.ones((2, ny + 1, nx + 1))
    free[:, :, 0] = 0
    free[:, :, -1] = 0
    bcv = np.zeros((2, ny + 1, nx + 1))
    bcv[0, :, -1] = 0.01
    cfg = SolverConfig()
    r1 = make_grid_solver(grid, cfg)(
        jnp.zeros((2, ny + 1, nx + 1)), {"d": jnp.asarray(d)},
        jnp.asarray(free), jnp.asarray(bcv),
    )
    dist = DistStructuredGrid2D(grid, 8)
    r2 = dist.make_solver(cfg)(
        jnp.zeros((2, ny + 1, nx + 1)), {"d": jnp.asarray(d)},
        jnp.asarray(free), jnp.asarray(bcv),
    )
    assert r2.converged
    assert np.abs(r2.u - np.asarray(r1.u)).max() < 1e-12


@pytest.mark.slow
def test_grid3d_matches_unstructured():
    from tpufem.mesh import box
    from tpufem.forms import linear_elastic_psi
    from tpufem.structured.grid3d import StructuredGrid3D

    nx, ny, nz = 4, 3, 5
    mesh = box(nx, ny, nz)
    V = FunctionSpace.create(mesh, 1, bs=3)
    DS = FunctionSpace.create(mesh, 1, bs=1)
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.normal(size=V.n_dofs) * 1e-3)
    d = rng.uniform(0, 1, DS.n_dofs)
    psi = lambda eps, dd: (1 - 0.5 * dd) * linear_elastic_psi(eps, E0, NU)
    F = EnergyFunctional(
        V, [Term(lambda qp: psi(qp.eps, qp.coeff("d")), 2)],
        [Coefficient("d", DS)],
    )
    asm = Assembler(F, [])
    grid = StructuredGrid3D(
        nx=nx, ny=ny, nz=nz, hx=1 / nx, hy=1 / ny, hz=1 / nz, bs=3,
        energy_density=lambda g, c: psi(0.5 * (g + g.T), c["d"]),
        field_kinds={"d": "vertex"},
    )
    fields = {"d": grid.vertex_grid(jnp.asarray(d))}
    coeffs = {"d": jnp.asarray(d)}
    u_g = grid.unflatten(u)
    r = grid.flatten(grid.residual(u_g, fields))
    ref = asm.residual(u, coeffs)
    assert float(jnp.abs(r - ref).max() / jnp.abs(ref).max()) < 1e-14
    dg = grid.flatten(grid.diagonal(u_g, fields))
    refd = asm.diagonal(u, coeffs)
    assert float(jnp.abs(dg - refd).max() / jnp.abs(refd).max()) < 1e-14


@pytest.mark.slow
def test_grid3d_solve():
    """3D elasticity pulled bar on the structured path; BC faces honored
    and solution matches the unstructured jitted solve."""
    from tpufem.cases.elasticity3d import Elasticity3DConfig, run as run3d
    from tpufem.forms import linear_elastic_psi
    from tpufem.structured.grid3d import StructuredGrid3D

    n = 5
    cfg3 = Elasticity3DConfig(n=n, E=E0)
    r1, V, mesh = run3d(cfg3)
    grid = StructuredGrid3D(
        nx=n, ny=n, nz=n, hx=1 / n, hy=1 / n, hz=1 / n, bs=3,
        energy_density=lambda g, c: linear_elastic_psi(
            0.5 * (g + g.T), E0, NU
        ),
        field_kinds={},
    )
    N1 = n + 1
    free = np.ones((3, N1, N1, N1))
    free[:, :, :, 0] = 0
    free[:, :, :, -1] = 0
    bcv = np.zeros((3, N1, N1, N1))
    bcv[0, :, :, -1] = cfg3.imposed
    r2 = make_grid_solver(grid, SolverConfig(cg_rtol=1e-10))(
        jnp.zeros((3, N1, N1, N1)), {}, jnp.asarray(free), jnp.asarray(bcv)
    )
    assert r2.converged
    err = float(jnp.abs(grid.flatten(r2.u) - r1.u).max())
    assert err < 1e-8, err
