"""Preconditioner tests: Jacobi, Chebyshev, block-Jacobi, lambda-max."""

import jax
import jax.numpy as jnp
import numpy as np

from tpufem.assemble import Assembler
from tpufem.config import SolverConfig
from tpufem.forms import EnergyFunctional, linear_elastic_psi
from tpufem.forms.form import Term
from tpufem.la.block_jacobi import BlockJacobiPlan
from tpufem.la.cg import cg
from tpufem.la.precond import (
    chebyshev_preconditioner,
    estimate_lambda_max,
    jacobi_preconditioner,
)
from tpufem.mesh import unit_square
from tpufem.mesh.reorder import sfc_reorder
from tpufem.nls.newton_jit import make_newton_solver
from tpufem.spaces import DirichletBC, FunctionSpace
from tpufem.spaces.bc import locate_dofs_geometrical

E, NU = 1.0e6, 0.3


def _system(n=24):
    mesh = sfc_reorder(unit_square(n))
    V = FunctionSpace.create(mesh, 1, bs=2)
    left = locate_dofs_geometrical(V, lambda x: np.abs(x[:, 0]) < 1e-12)
    t = Term(lambda qp: linear_elastic_psi(qp.eps, E, NU), 1)
    asm = Assembler(EnergyFunctional(V, [t]), [DirichletBC(V, left, [0.0, 0.0])])
    mat = asm.matrix(jnp.zeros(V.n_dofs), {})
    rng = np.random.default_rng(0)
    b = jnp.asarray(rng.normal(size=V.n_dofs)) * asm.free_mask(jnp.float64)
    return asm, mat, b


def test_lambda_max_estimate():
    asm, mat, b = _system(12)
    diag = mat.diagonal()
    lmax = float(estimate_lambda_max(mat.matvec, diag, mat.n_rows, iters=30))
    # true lambda max of D^-1 A
    A = np.asarray(mat.to_dense())
    Dinv = np.diag(1.0 / np.asarray(diag))
    true = np.abs(np.linalg.eigvals(Dinv @ A)).max()
    assert abs(lmax - true) / true < 0.05


def test_block_jacobi_beats_point_jacobi():
    asm, mat, b = _system(24)
    r1 = cg(mat.matvec, b, M=jacobi_preconditioner(mat.diagonal()),
            rtol=1e-10, maxit=20000)
    plan = BlockJacobiPlan.build(asm.pattern, 128)
    r2 = cg(mat.matvec, b, M=plan.preconditioner(mat), rtol=1e-10, maxit=20000)
    assert bool(r1.converged) and bool(r2.converged)
    assert int(r2.iters) < 0.6 * int(r1.iters)
    np.testing.assert_allclose(
        np.asarray(r1.x), np.asarray(r2.x), atol=1e-8 * float(jnp.abs(r1.x).max())
    )


def test_block_jacobi_nondivisible_size():
    # n_dofs not divisible by B: padding path
    asm, mat, b = _system(11)
    assert mat.n_rows % 100 != 0
    plan = BlockJacobiPlan.build(asm.pattern, 100)
    r = cg(mat.matvec, b, M=plan.preconditioner(mat), rtol=1e-10, maxit=20000)
    assert bool(r.converged)


def test_chebyshev_preconditioner_accelerates():
    asm, mat, b = _system(16)
    diag = mat.diagonal()
    r1 = cg(mat.matvec, b, M=jacobi_preconditioner(diag), rtol=1e-10,
            maxit=20000)
    lmax = estimate_lambda_max(mat.matvec, diag, mat.n_rows)
    M = chebyshev_preconditioner(mat.matvec, diag, degree=4, lmax=lmax)
    r2 = cg(mat.matvec, b, M=M, rtol=1e-10, maxit=20000)
    assert bool(r2.converged)
    assert int(r2.iters) < 0.5 * int(r1.iters)  # fewer (costlier) iters


def test_newton_with_block_jacobi():
    mesh = sfc_reorder(unit_square(12))
    V = FunctionSpace.create(mesh, 1, bs=2)
    left = locate_dofs_geometrical(V, lambda x: np.abs(x[:, 0]) < 1e-12)
    right = locate_dofs_geometrical(V, lambda x: np.abs(x[:, 0] - 1) < 1e-12)
    t = Term(lambda qp: linear_elastic_psi(qp.eps, E, NU), 1)
    asm = Assembler(
        EnergyFunctional(V, [t]),
        [DirichletBC(V, left, [0.0, 0.0]), DirichletBC(V, right, [0.01, 0.0])],
    )
    for pc in ("jacobi", "block_jacobi"):
        cfg = SolverConfig(preconditioner=pc, block_size=64)
        res = make_newton_solver(asm, cfg)(jnp.zeros(V.n_dofs), {})
        assert bool(res.converged), pc


def test_chunked_solver_matches_jit():
    """newton_chunked (bounded executions) must reproduce newton_jit."""
    from tpufem.forms import asym_damage_psi
    from tpufem.forms.form import Coefficient
    from tpufem.nls.newton_chunked import make_chunked_solver

    mesh = sfc_reorder(unit_square(16))
    V = FunctionSpace.create(mesh, 1, bs=2)
    DS = FunctionSpace.create(mesh, 1, bs=1)
    d = np.zeros(DS.n_dofs)
    d[DS.dof_coords[:, 1] > 0.6] = 0.4
    F = EnergyFunctional(
        V,
        [Term(lambda qp: asym_damage_psi(qp.eps, qp.coeff("d"), E, NU), 1)],
        [Coefficient("d", DS)],
    )
    left = locate_dofs_geometrical(V, lambda x: np.abs(x[:, 0]) < 1e-12)
    right = locate_dofs_geometrical(V, lambda x: np.abs(x[:, 0] - 1) < 1e-12)
    asm = Assembler(
        F, [DirichletBC(V, left, [0.0, 0.0]), DirichletBC(V, right, [0.01, 0.0])]
    )
    coeffs = {"d": jnp.asarray(d)}
    for pc in ("jacobi", "block_jacobi"):
        cfg = SolverConfig(preconditioner=pc, block_size=64)
        r1 = make_newton_solver(asm, cfg)(jnp.zeros(V.n_dofs), coeffs)
        r2 = make_chunked_solver(asm, cfg, cg_chunk=37)(
            jnp.zeros(V.n_dofs), coeffs
        )
        assert r2.converged
        assert float(jnp.abs(r1.u - r2.u).max()) < 1e-8, pc
