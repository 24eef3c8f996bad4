"""Assembly tests: patch test, matrix vs matrix-free, BC semantics,
manufactured solution convergence."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpufem.assemble import Assembler
from tpufem.config import SolverConfig
from tpufem.forms import EnergyFunctional, linear_elastic_psi
from tpufem.forms.form import Coefficient, Term
from tpufem.la import cg, jacobi_preconditioner
from tpufem.mesh import unit_square
from tpufem.mesh.mesh import CellType
from tpufem.mesh.topology import locate_entities_boundary
from tpufem.nls import NewtonSolver
from tpufem.spaces import DirichletBC, FunctionSpace
from tpufem.spaces.bc import locate_dofs_geometrical

E, NU = 1.0e6, 0.3


def _elastic_assembler(mesh, bcs, degree=1, qdeg=None):
    V = FunctionSpace.create(mesh, degree, bs=2)
    t = Term(
        integrand=lambda qp: linear_elastic_psi(qp.eps, E, NU),
        degree=qdeg or max(1, 2 * (degree - 1)),
    )
    F = EnergyFunctional(V, [t])
    return V, Assembler(F, bcs(V) if callable(bcs) else bcs)


@pytest.mark.parametrize("degree", [1, 2])
@pytest.mark.parametrize("cell_type", [CellType.triangle, CellType.quad])
def test_patch_test(degree, cell_type):
    """Affine displacement imposed on the whole boundary is reproduced
    exactly in the interior — the fundamental FEM consistency check."""
    mesh = unit_square(4, cell_type=cell_type)
    V = FunctionSpace.create(mesh, degree, bs=2)
    A = np.array([[2e-3, 1e-3], [-5e-4, 3e-3]])
    g = V.dof_coords @ A.T
    bnodes = locate_dofs_geometrical(
        V,
        lambda x: (np.abs(x[:, 0]) < 1e-12) | (np.abs(x[:, 0] - 1) < 1e-12)
        | (np.abs(x[:, 1]) < 1e-12) | (np.abs(x[:, 1] - 1) < 1e-12),
    )
    qdeg = 1 if (cell_type == CellType.triangle and degree == 1) else 2 * degree
    t = Term(integrand=lambda qp: linear_elastic_psi(qp.eps, E, NU), degree=qdeg)
    asm = Assembler(EnergyFunctional(V, [t]), [DirichletBC(V, bnodes, g[bnodes])])
    res = NewtonSolver(SolverConfig()).solve(
        jnp.zeros(V.n_dofs),
        rhs=lambda w: asm.lifted_rhs(w, {}),
        operator=lambda w: asm.constrained_action(w, {}),
        precond=lambda w: jacobi_preconditioner(asm.diagonal(w, {})),
    )
    uu = np.asarray(res.u).reshape(-1, 2)
    assert np.abs(uu - g).max() < 1e-10


def test_matrix_equals_matrix_free():
    mesh = unit_square(5)
    V = FunctionSpace.create(mesh, 1, bs=2)
    left = locate_dofs_geometrical(V, lambda x: np.abs(x[:, 0]) < 1e-12)
    bcs = [DirichletBC(V, left, [0.0, 0.0])]
    t = Term(integrand=lambda qp: linear_elastic_psi(qp.eps, E, NU), degree=1)
    asm = Assembler(EnergyFunctional(V, [t]), bcs)
    u = jnp.zeros(V.n_dofs)
    v = jax.random.normal(jax.random.PRNGKey(0), (V.n_dofs,), dtype=jnp.float64)
    a1 = asm.constrained_action(u, {})(v)
    a2 = asm.matrix(u, {}).matvec(v)
    rel = float(jnp.abs(a1 - a2).max() / jnp.abs(a1).max())
    assert rel < 1e-13


def test_matrix_symmetric_spd():
    mesh = unit_square(4)
    V = FunctionSpace.create(mesh, 1, bs=2)
    left = locate_dofs_geometrical(V, lambda x: np.abs(x[:, 0]) < 1e-12)
    t = Term(integrand=lambda qp: linear_elastic_psi(qp.eps, E, NU), degree=1)
    asm = Assembler(EnergyFunctional(V, [t]), [DirichletBC(V, left, 0.0)])
    Adense = np.asarray(asm.matrix(jnp.zeros(V.n_dofs), {}).to_dense())
    assert np.abs(Adense - Adense.T).max() < 1e-9 * np.abs(Adense).max()
    w = np.linalg.eigvalsh(Adense)
    assert w.min() > 0  # SPD with bc rows at +1


def test_diagonal_matches_matrix():
    mesh = unit_square(4)
    V = FunctionSpace.create(mesh, 1, bs=2)
    left = locate_dofs_geometrical(V, lambda x: np.abs(x[:, 0]) < 1e-12)
    t = Term(integrand=lambda qp: linear_elastic_psi(qp.eps, E, NU), degree=1)
    asm = Assembler(EnergyFunctional(V, [t]), [DirichletBC(V, left, 0.0)])
    u = jnp.zeros(V.n_dofs)
    d1 = np.asarray(asm.diagonal(u, {}))
    d2 = np.asarray(asm.matrix(u, {}).diagonal())
    np.testing.assert_allclose(d1, d2, rtol=1e-12)


def test_residual_is_gradient_of_energy():
    """F(u) must be the exact gradient of Π(u) — the property that makes
    all four reference derivation variants redundant."""
    mesh = unit_square(3)
    V = FunctionSpace.create(mesh, 1, bs=2)
    t = Term(integrand=lambda qp: linear_elastic_psi(qp.eps, E, NU), degree=1)
    asm = Assembler(EnergyFunctional(V, [t]), [])
    u = jax.random.normal(jax.random.PRNGKey(1), (V.n_dofs,), dtype=jnp.float64) * 1e-3
    r = asm.residual(u, {})
    g = jax.grad(lambda w: asm.energy(w, {}))(u)
    np.testing.assert_allclose(np.asarray(r), np.asarray(g), rtol=1e-12)


def test_manufactured_solution_convergence():
    """u = (sin(pi x) sin(pi y), 0) with matching body force: P1 converges
    at O(h^2) in the max norm of nodal error."""
    A_exact = lambda x: np.stack(
        [np.sin(np.pi * x[:, 0]) * np.sin(np.pi * x[:, 1]), 0 * x[:, 0]], axis=1
    )
    lam = E * NU / ((1 + NU) * (1 - 2 * NU))
    mu = E / (2 * (1 + NU))

    def body_force(x):
        # -div(sigma) for u = (sin sin, 0)
        s, c = np.sin, np.cos
        px, py = np.pi * x[:, 0], np.pi * x[:, 1]
        pi2 = np.pi**2
        # grad u: ux_x = pi c s ; ux_y = pi s c
        # sigma = lam tr(eps) I + 2 mu eps
        # f = -div sigma
        fx = pi2 * s(px) * s(py) * (lam + 2 * mu) + mu * pi2 * s(px) * s(py)
        fy = -(lam + mu) * pi2 * c(px) * c(py)
        return np.stack([fx, fy], axis=1)

    errs = []
    for n in (8, 16, 32):
        mesh = unit_square(n)
        V = FunctionSpace.create(mesh, 1, bs=2)
        f_np = body_force(V.dof_coords).reshape(-1)
        f = jnp.asarray(f_np)
        stiff = Term(
            integrand=lambda qp: linear_elastic_psi(qp.eps, E, NU), degree=2
        )
        load = Term(integrand=lambda qp: -jnp.dot(qp.coeff("f"), qp.u), degree=4)
        func = EnergyFunctional(V, [stiff, load], [Coefficient("f", V)])
        bnodes = locate_dofs_geometrical(
            V,
            lambda x: (np.abs(x[:, 0]) < 1e-12) | (np.abs(x[:, 0] - 1) < 1e-12)
            | (np.abs(x[:, 1]) < 1e-12) | (np.abs(x[:, 1] - 1) < 1e-12),
        )
        asm = Assembler(func, [DirichletBC(V, bnodes, 0.0)])
        coeffs = {"f": f}
        res = NewtonSolver(SolverConfig(cg_rtol=1e-13)).solve(
            jnp.zeros(V.n_dofs),
            rhs=lambda w: asm.lifted_rhs(w, coeffs),
            operator=lambda w: asm.constrained_action(w, coeffs),
            precond=lambda w: jacobi_preconditioner(asm.diagonal(w, coeffs)),
        )
        uu = np.asarray(res.u).reshape(-1, 2)
        errs.append(np.abs(uu - A_exact(V.dof_coords)).max())
    rate1 = np.log2(errs[0] / errs[1])
    rate2 = np.log2(errs[1] / errs[2])
    assert rate2 > 1.7, (errs, rate1, rate2)  # O(h^2)


def test_cg_solves_spd_system():
    rng = np.random.default_rng(0)
    n = 50
    B = rng.normal(size=(n, n))
    A = B @ B.T + n * np.eye(n)
    x_true = rng.normal(size=n)
    b = jnp.asarray(A @ x_true)
    Aj = jnp.asarray(A)
    res = cg(lambda v: Aj @ v, b, rtol=1e-14)
    assert bool(res.converged)
    assert np.abs(np.asarray(res.x) - x_true).max() < 1e-9
