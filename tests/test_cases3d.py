"""BASELINE configs 3 & 4: 3D hex elasticity (matrix-free Chebyshev-CG)
and Neo-Hookean hyperelasticity (AD consistent tangents)."""

import jax
import pytest
import jax.numpy as jnp
import numpy as np

from tpufem.cases.elasticity3d import Elasticity3DConfig, run as run3d
from tpufem.cases.neohookean import NeoHookeanConfig, run as run_nh
from tpufem.config import SolverConfig
from tpufem.forms import neo_hookean_psi
from tpufem.mesh.mesh import CellType


def test_elasticity3d_hex_matrix_free():
    cfg = Elasticity3DConfig(n=6)
    res, V, mesh = run3d(cfg)
    assert bool(res.converged)
    uu = np.asarray(res.u).reshape(-1, 3)
    # BC faces respected
    left = np.abs(V.dof_coords[:, 0]) < 1e-12
    right = np.abs(V.dof_coords[:, 0] - 1) < 1e-12
    np.testing.assert_allclose(uu[left], 0.0, atol=1e-12)
    np.testing.assert_allclose(uu[right, 0], cfg.imposed, atol=1e-12)
    # pulled bar: interior x-displacement monotone-ish in x and bounded
    assert uu[:, 0].min() > -1e-3 and uu[:, 0].max() <= cfg.imposed + 1e-12


@pytest.mark.slow
def test_elasticity3d_hex_vs_tet():
    """Same problem on hex and tet meshes must agree at the O(h²)
    discretization level."""
    rh, Vh, _ = run3d(Elasticity3DConfig(n=6))
    rt, Vt, _ = run3d(
        Elasticity3DConfig(n=6, cell_type=CellType.tetra)
    )
    from tpufem.cases.compare import compare_fields

    cmp = compare_fields(
        Vh.dof_coords,
        np.asarray(rh.u).reshape(-1, 3),
        Vt.dof_coords,
        np.asarray(rt.u).reshape(-1, 3),
    )
    # same nodes (structured): elements differ → small discretization gap
    assert cmp.linf_per_component.max() < 2e-3 * 0.01 / 0.01  # ~2e-3 abs


def test_neo_hookean_newton_converges_finite_strain():
    cfg = NeoHookeanConfig(n=4, dim=3, stretch=0.2)
    res, V, mesh = run_nh(cfg)
    assert bool(res.converged)
    assert int(res.newton_iters) >= 2  # genuinely nonlinear
    uu = np.asarray(res.u).reshape(-1, 3)
    right = np.abs(V.dof_coords[:, 0] - 1) < 1e-12
    np.testing.assert_allclose(uu[right, 0], 0.2, atol=1e-12)


def test_neo_hookean_2d():
    cfg = NeoHookeanConfig(n=6, dim=2, stretch=0.1)
    res, V, mesh = run_nh(cfg)
    assert bool(res.converged)


def test_hessian_tangent_matches_jacfwd_jacrev():
    """jax.hessian (fwd-over-rev) and jacfwd∘jacfwd — the two nesting
    orders MFEM's dual numbers realize (admfem.hpp:672-699) — must agree."""
    E, NU = 1e6, 0.3
    g = jax.random.normal(jax.random.PRNGKey(0), (3, 3), dtype=jnp.float64) * 0.1
    f = lambda x: neo_hookean_psi(x, E, NU)
    h1 = jax.hessian(f)(g)
    h2 = jax.jacfwd(jax.jacfwd(f))(g)
    np.testing.assert_allclose(np.asarray(h1), np.asarray(h2), rtol=1e-12)
