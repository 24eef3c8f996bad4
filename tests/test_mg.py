"""Geometric-multigrid tests for the structured fast path (structured.mg2d):
transfer-operator exactness, Galerkin consistency, scale invariance (the
E=1e6 coarse-mask regression), contraction, and solver integration."""

import jax
import pytest
import jax.numpy as jnp
import numpy as np

from tpufem.config import SolverConfig
from tpufem.forms import asym_damage_psi, linear_elastic_psi
from tpufem.structured import StructuredGrid2D
from tpufem.structured import mg2d
from tpufem.structured.solve import make_grid_solver

E, NU = 1.0e6, 0.3


def _grid(n, law="linear"):
    if law == "linear":
        return StructuredGrid2D(
            nx=n, ny=n, hx=1 / n, hy=1 / n, bs=2,
            energy_density=lambda g, c: linear_elastic_psi(
                0.5 * (g + g.T), E, NU
            ),
            field_kinds={},
        )
    return StructuredGrid2D(
        nx=n, ny=n, hx=1 / n, hy=1 / n, bs=2,
        energy_density=lambda g, c: asym_damage_psi(
            0.5 * (g + g.T), c["d"], E, NU
        ),
        field_kinds={"d": "vertex"},
    )


def _bc(n):
    free = np.ones((2, n + 1, n + 1))
    free[:, :, 0] = 0.0
    free[:, :, -1] = 0.0
    bcv = np.zeros((2, n + 1, n + 1))
    bcv[0, :, -1] = 0.01
    return jnp.asarray(free), jnp.asarray(bcv)


def test_prolong_restrict_adjoint():
    rng = np.random.default_rng(0)
    c = jnp.asarray(rng.normal(size=(2, 9, 13)))
    f = jnp.asarray(rng.normal(size=(2, 17, 25)))
    lhs = float(jnp.vdot(mg2d.prolong(c), f))
    rhs = float(jnp.vdot(c, mg2d.restrict(f)))
    assert abs(lhs - rhs) < 1e-12 * abs(lhs)


def test_coarse_operator_is_galerkin():
    """Rediscretized coarse operator == P^T A P exactly (nested P1)."""
    n = 8
    gf = _grid(n)
    gc = mg2d.coarsen_grid(gf)
    shape_f = (2, n + 1, n + 1)
    shape_c = (2, n // 2 + 1, n // 2 + 1)
    nf, nc = 2 * (n + 1) ** 2, 2 * (n // 2 + 1) ** 2
    uf, uc = jnp.zeros(shape_f), jnp.zeros(shape_c)

    def dense(op, nn, shape):
        return np.asarray(
            jax.lax.map(
                jax.jit(lambda e: op(e.reshape(shape)).ravel()),
                jnp.eye(nn),
            )
        ).T

    Af = dense(lambda v: gf.tangent_action(uf, {}, v), nf, shape_f)
    Ac = dense(lambda v: gc.tangent_action(uc, {}, v), nc, shape_c)
    P = dense(mg2d.prolong, nc, shape_c)
    G = P.T @ Af @ P
    assert np.abs(G - Ac).max() < 1e-10 * np.abs(Ac).max()


@pytest.mark.slow
def test_vcycle_contracts_and_is_scale_invariant():
    """V(3,3) stationary iteration contracts (<0.55/cycle) and the factor
    is independent of E — regression for the unmasked-coarse-bc bug where
    restricted residual on identity-scale Dirichlet rows produced O(1)
    spurious corrections against an O(E) operator."""
    n = 32
    facs = {}
    for Eval in (1.0, 1.0e6):
        grid = StructuredGrid2D(
            nx=n, ny=n, hx=1 / n, hy=1 / n, bs=2,
            energy_density=lambda g, c, _E=Eval: linear_elastic_psi(
                0.5 * (g + g.T), _E, NU
            ),
            field_kinds={},
        )
        free, _ = _bc(n)
        u0 = jnp.zeros((2, n + 1, n + 1))
        grids, data = mg2d.build_mg2d(grid, u0, {}, free, coarse_dofs=200)
        assert len(data.levels) >= 2  # genuinely multilevel

        def A(v):
            av = grid.tangent_action(u0, {}, v * free)
            return av * free + v * (1 - free)

        rng = np.random.default_rng(0)
        b = jnp.asarray(rng.normal(size=(2, n + 1, n + 1))) * free
        x = jnp.zeros_like(b)
        norms = []
        for _ in range(5):
            r = b - A(x)
            norms.append(float(jnp.sqrt(jnp.vdot(r, r))))
            x = x + mg2d.vcycle(grids, data, r)
        facs[Eval] = norms[-1] / norms[-2]
        assert facs[Eval] < 0.55, f"E={Eval}: factor {facs[Eval]}"
    assert abs(facs[1.0] - facs[1.0e6]) < 0.02


@pytest.mark.slow
def test_grid_solver_mg_matches_jacobi():
    """make_grid_solver(preconditioner='mg') reproduces the Jacobi-CG
    solution at a fraction of the iterations."""
    n = 64
    grid = _grid(n, law="damage")
    yy = np.linspace(0, 1, n + 1)[:, None]
    d = jnp.asarray(
        np.broadcast_to(
            np.where((yy > 0.45) & (yy < 0.55), 0.8, 0.0), (n + 1, n + 1)
        ) * 1.0
    )
    free, bcv = _bc(n)
    u0 = jnp.zeros((2, n + 1, n + 1))
    res_j = make_grid_solver(
        grid, SolverConfig(cg_rtol=1e-12, cg_maxit=20000), cg_chunk=200
    )(u0, {"d": d}, free, bcv)
    res_m = make_grid_solver(
        grid,
        SolverConfig(cg_rtol=1e-12, cg_maxit=2000, preconditioner="mg"),
        cg_chunk=10,
    )(u0, {"d": d}, free, bcv)
    assert res_m.converged
    assert res_m.newton_iters == res_j.newton_iters
    assert res_m.total_cg_iters * 10 < res_j.total_cg_iters
    assert float(jnp.max(jnp.abs(res_m.u - res_j.u))) < 1e-12


@pytest.mark.slow
def test_mixed_precision_reaches_f64_accuracy():
    """VERDICT round-2 item 5 (the 1e-10 gate): f64 Newton residuals +
    f32 MG-CG inner solves converge to the all-f64 solution — Newton is
    the defect-correction loop, so the f32 step error washes out.
    Reference accuracy context: all-double PETSc, CG rtol 1e-12
    (doc.tex:2252-2257); BASELINE gate 1e-10 on displacements."""
    import jax.numpy as jnp

    n = 64
    grid = _grid(n, law="damage")
    yy = np.linspace(0, 1, n + 1)[:, None]
    d = jnp.asarray(
        np.broadcast_to(
            np.where((yy > 0.45) & (yy < 0.55), 0.8, 0.0), (n + 1, n + 1)
        ) * 1.0
    )
    free, bcv = _bc(n)
    u0 = jnp.zeros((2, n + 1, n + 1))
    ref = make_grid_solver(
        grid,
        SolverConfig(cg_rtol=1e-13, newton_rtol=1e-12, newton_atol=1e-13,
                     preconditioner="mg", newton_maxit=20,
                     error_on_nonconvergence=False),
        cg_chunk=10,
    )(u0, {"d": d}, free, bcv)
    mix = make_grid_solver(
        grid,
        SolverConfig(cg_rtol=1e-6, newton_rtol=1e-12, newton_atol=1e-13,
                     preconditioner="mg", newton_maxit=40,
                     error_on_nonconvergence=False),
        cg_chunk=10,
        inner_dtype=jnp.float32,
    )(u0, {"d": d}, free, bcv)
    du = float(jnp.max(jnp.abs(mix.u - ref.u)))
    un = float(jnp.max(jnp.abs(ref.u)))
    assert du / un < 1e-10, du / un


@pytest.mark.slow
def test_mg3d_transfers_and_solver():
    """3D trilinear transfers are exact adjoints and Galerkin-consistent
    (nested Q1); preconditioner='mg' on a StructuredGrid3D cuts CG
    iterations with an identical solution."""
    from tpufem.structured import mg3d
    from tpufem.structured.grid3d import StructuredGrid3D

    rng = np.random.default_rng(0)
    c = jnp.asarray(rng.normal(size=(3, 5, 7, 9)))
    f = jnp.asarray(rng.normal(size=(3, 9, 13, 17)))
    lhs = float(jnp.vdot(mg3d.prolong(c), f))
    rhs = float(jnp.vdot(c, mg3d.restrict(f)))
    assert abs(lhs - rhs) < 1e-12 * abs(lhs)

    def mk(nn, h):
        return StructuredGrid3D(
            nx=nn, ny=nn, nz=nn, hx=h, hy=h, hz=h, bs=3,
            energy_density=lambda g, cf: linear_elastic_psi(
                0.5 * (g + g.T), E, NU
            ),
            field_kinds={},
        )

    gf, gc = mk(4, 0.25), mk(2, 0.5)
    sf, sc = (3, 5, 5, 5), (3, 3, 3, 3)
    nf, ncd = 3 * 125, 3 * 27

    def dense(op, nn, shape):
        return np.asarray(
            jax.lax.map(
                jax.jit(lambda e: op(e.reshape(shape)).ravel()),
                jnp.eye(nn),
            )
        ).T

    Af = dense(lambda v: gf.tangent_action(jnp.zeros(sf), {}, v), nf, sf)
    Ac = dense(lambda v: gc.tangent_action(jnp.zeros(sc), {}, v), ncd, sc)
    P = dense(mg3d.prolong, ncd, sc)
    assert np.abs(P.T @ Af @ P - Ac).max() < 1e-10 * np.abs(Ac).max()

    # n=12 keeps the MG-vs-Jacobi iteration gap decisive while the
    # interpret-mode Pallas smoothers stay affordable on the 1-core
    # host (n=16 measured 357 s of suite wall time)
    n = 12
    grid = mk(n, 1.0 / n)
    free = np.ones((3, n + 1, n + 1, n + 1))
    free[:, :, :, 0] = 0.0
    free[:, :, :, -1] = 0.0
    bcv = np.zeros((3, n + 1, n + 1, n + 1))
    bcv[0, :, :, -1] = 0.01
    u0 = jnp.zeros((3, n + 1, n + 1, n + 1))
    rj = make_grid_solver(
        grid, SolverConfig(cg_rtol=1e-10, cg_maxit=20000), cg_chunk=100
    )(u0, {}, jnp.asarray(free * 1.0), jnp.asarray(bcv * 1.0))
    rm = make_grid_solver(
        grid, SolverConfig(cg_rtol=1e-10, preconditioner="mg"), cg_chunk=10
    )(u0, {}, jnp.asarray(free * 1.0), jnp.asarray(bcv * 1.0))
    assert rm.total_cg_iters * 4 < rj.total_cg_iters
    assert float(jnp.max(jnp.abs(rm.u - rj.u))) < 1e-11
