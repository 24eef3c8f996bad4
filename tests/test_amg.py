"""SA-AMG preconditioner tests: hierarchy construction, RBM nullspace,
iteration counts vs Jacobi, and Newton-driver integration.

The reference rides hypre BoomerAMG + near-nullspace rigid-body modes
(FEniCSx/mechanic2d/asym_elasto_damage_model.cc:720-813); these tests
pin our smoothed-aggregation equivalent to the same role: cut elasticity
CG iterations by an order of magnitude without changing the solution.
"""

import jax
import jax.numpy as jnp
import numpy as np

from tpufem.assemble import Assembler
from tpufem.config import SolverConfig
from tpufem.forms import EnergyFunctional, asym_damage_psi, linear_elastic_psi
from tpufem.forms.form import Coefficient, Term
from tpufem.la import amg
from tpufem.la.cg import cg
from tpufem.la.precond import jacobi_preconditioner
from tpufem.mesh import unit_square
from tpufem.nls.newton_jit import make_newton_solver
from tpufem.spaces import DirichletBC, FunctionSpace
from tpufem.spaces.bc import locate_dofs_geometrical

E, NU = 1.0e6, 0.3


def _elastic_system(n=32, law="linear"):
    mesh = unit_square(n)
    V = FunctionSpace.create(mesh, 1, bs=2)
    if law == "linear":
        t = Term(lambda qp: linear_elastic_psi(qp.eps, E, NU), 1)
        F = EnergyFunctional(V, [t])
        coeffs = {}
    else:
        DS = FunctionSpace.create(mesh, 1, bs=1)
        d = np.zeros(DS.n_dofs)
        d[(DS.dof_coords[:, 1] > 0.45) & (DS.dof_coords[:, 1] < 0.55)] = 0.8
        t = Term(lambda qp: asym_damage_psi(qp.eps, qp.coeff("d"), E, NU), 1)
        F = EnergyFunctional(V, [t], [Coefficient("d", DS)])
        coeffs = {"d": jnp.asarray(d)}
    left = locate_dofs_geometrical(V, lambda x: np.abs(x[:, 0]) < 1e-12)
    right = locate_dofs_geometrical(V, lambda x: np.abs(x[:, 0] - 1) < 1e-12)
    bcs = [DirichletBC(V, left, [0.0, 0.0]),
           DirichletBC(V, right, [0.01, 0.0])]
    asm = Assembler(F, bcs)
    return asm, V, coeffs


def test_rigid_body_modes_span_nullspace():
    """A_unconstrained @ RBM = 0 (the modes really are the nullspace)."""
    mesh = unit_square(8)
    V = FunctionSpace.create(mesh, 1, bs=2)
    t = Term(lambda qp: linear_elastic_psi(qp.eps, E, NU), 1)
    asm = Assembler(EnergyFunctional(V, [t]), [])  # no BCs
    mat = asm.matrix(jnp.zeros(V.n_dofs), {})
    B = amg.rigid_body_modes(V.dof_coords, 2)
    assert B.shape == (V.n_dofs, 3)
    for k in range(3):
        r = np.asarray(mat.matvec(jnp.asarray(B[:, k])))
        assert np.abs(r).max() < 1e-6 * E, f"mode {k} not in nullspace"


def test_rbm_3d_count():
    B = amg.rigid_body_modes(np.random.default_rng(0).normal(size=(10, 3)), 3)
    assert B.shape == (30, 6)
    # translations + rotations are linearly independent
    assert np.linalg.matrix_rank(B) == 6


def test_aggregation_covers_and_coarsens():
    asm, V, coeffs = _elastic_system(16)
    mat = asm.matrix(asm.set_bc(jnp.zeros(V.n_dofs)), coeffs)
    A = amg.ell_to_scipy(mat)
    S = amg._node_strength_graph(A, 2, 0.0)
    agg, n_agg = amg.aggregate(S)
    n_nodes = V.n_scalar_dofs
    assert agg.shape == (n_nodes,)
    assert (agg >= 0).all() and agg.max() == n_agg - 1
    # 2D aggregates average ~5-9 nodes
    assert n_nodes / 12 < n_agg < n_nodes / 2


def test_amg_cuts_iterations_vs_jacobi():
    asm, V, coeffs = _elastic_system(32, law="damage")
    u0 = asm.set_bc(jnp.zeros(V.n_dofs))
    b = asm.lifted_rhs(u0, coeffs)
    mat = asm.matrix(u0, coeffs)
    fm = np.asarray(asm.free_mask(jnp.float64))
    hier = amg.build_hierarchy(
        amg.ell_to_scipy(mat), V.dof_coords, 2, free_mask=fm
    )
    assert len(hier.levels) >= 2  # actually multilevel
    res_j = cg(mat.matvec, b, M=jacobi_preconditioner(mat.diagonal()),
               rtol=1e-10, maxit=20000)
    res_a = cg(mat.matvec, b, M=amg.amg_preconditioner(hier),
               rtol=1e-10, maxit=2000)
    assert int(res_a.iters) * 8 < int(res_j.iters), (
        f"AMG {int(res_a.iters)} vs Jacobi {int(res_j.iters)}"
    )
    assert int(res_a.iters) < 60
    # same solution
    scale = float(jnp.max(jnp.abs(res_j.x)))
    assert float(jnp.max(jnp.abs(res_a.x - res_j.x))) < 1e-8 * max(scale, 1.0)


def test_amg_scalar_poisson():
    """bs=1 path: constant-vector nullspace."""
    mesh = unit_square(24)
    V = FunctionSpace.create(mesh, 1, bs=1)

    def poisson(qp):
        g = qp.grad_u  # (1, gdim) scalar gradient
        return 0.5 * jnp.sum(g * g)

    t = Term(poisson, 1)
    bnd = locate_dofs_geometrical(
        V, lambda x: (np.abs(x[:, 0]) < 1e-12) | (np.abs(x[:, 0] - 1) < 1e-12)
    )
    asm = Assembler(EnergyFunctional(V, [t]), [DirichletBC(V, bnd, [0.0])])
    u0 = jnp.zeros(V.n_dofs)
    mat = asm.matrix(u0, {})
    rng = np.random.default_rng(3)
    b = jnp.asarray(rng.normal(size=V.n_dofs)) * asm.free_mask(jnp.float64)
    fm = np.asarray(asm.free_mask(jnp.float64))
    hier = amg.build_hierarchy(
        amg.ell_to_scipy(mat), V.dof_coords, 1, free_mask=fm
    )
    res = cg(mat.matvec, b, M=amg.amg_preconditioner(hier), rtol=1e-10,
             maxit=500)
    assert bool(res.converged)
    assert int(res.iters) < 40


def test_newton_jit_amg_matches_jacobi():
    """Full jitted Newton-Krylov with the AMG preconditioner converges to
    the same solution with far fewer total CG iterations."""
    asm, V, coeffs = _elastic_system(24, law="damage")
    u0 = jnp.zeros(V.n_dofs)
    s_j = make_newton_solver(
        asm, SolverConfig(cg_rtol=1e-12, preconditioner="jacobi")
    )(u0, coeffs)
    s_a = make_newton_solver(
        asm, SolverConfig(cg_rtol=1e-12, preconditioner="amg")
    )(u0, coeffs)
    assert bool(s_a.converged)
    assert int(s_a.total_cg_iters) * 5 < int(s_j.total_cg_iters)
    err = float(jnp.max(jnp.abs(s_a.u - s_j.u)))
    assert err < 1e-9


def test_newton_chunked_amg():
    from tpufem.nls.newton_chunked import make_chunked_solver

    asm, V, coeffs = _elastic_system(16, law="damage")
    u0 = jnp.zeros(V.n_dofs)
    cfg = SolverConfig(cg_rtol=1e-12, preconditioner="amg")
    res = make_chunked_solver(asm, cfg, cg_chunk=25)(u0, coeffs)
    assert res.converged
    ref = make_newton_solver(
        asm, SolverConfig(cg_rtol=1e-12, preconditioner="jacobi")
    )(u0, coeffs)
    assert float(jnp.max(jnp.abs(res.u - ref.u))) < 1e-9


def test_du0_convention_jit_and_chunked():
    """The dolfinx 'du0' convention (scale = residual after first
    correction) takes more Newton iterations than 'r0' (doc.tex:2065-2068)
    and is now honoured by the jitted and chunked drivers."""
    from tpufem.nls.newton_chunked import make_chunked_solver

    asm, V, coeffs = _elastic_system(12, law="damage")
    u0 = jnp.zeros(V.n_dofs)
    r_r0 = make_newton_solver(
        asm, SolverConfig(cg_rtol=1e-13, convergence="r0")
    )(u0, coeffs)
    r_du0 = make_newton_solver(
        asm, SolverConfig(cg_rtol=1e-13, convergence="du0")
    )(u0, coeffs)
    assert bool(r_du0.converged)
    assert int(r_du0.newton_iters) >= int(r_r0.newton_iters)
    c_du0 = make_chunked_solver(
        asm, SolverConfig(cg_rtol=1e-13, convergence="du0"), cg_chunk=50
    )(u0, coeffs)
    assert c_du0.converged
    assert c_du0.newton_iters == int(r_du0.newton_iters)
    assert float(jnp.max(jnp.abs(c_du0.u - r_du0.u))) < 1e-9
