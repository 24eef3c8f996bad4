"""Pallas fused-kernel tests (interpreter mode on CPU).

The kernel must match the XLA structured path (itself validated against
the unstructured assembler) across sizes, block splits, and BC-driven
states — including the ghost-row masking at slab seams.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

import tpufem.structured.pallas2d as p2d
from tpufem.forms import asym_damage_psi
from tpufem.structured import StructuredGrid2D

E, NU = 1.0e6, 0.3


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    orig = pl.pallas_call

    def interp(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    monkeypatch.setattr(p2d.pl, "pallas_call", interp)


def _grid(nx, ny):
    return StructuredGrid2D(
        nx=nx, ny=ny, hx=1 / nx, hy=1 / ny, bs=2,
        energy_density=lambda g, c: asym_damage_psi(
            0.5 * (g + g.T), c["d"], E, NU
        ),
        field_kinds={"d": "vertex"},
    )


@pytest.mark.parametrize(
    "nx,ny,br",
    [(13, 9, 8), (16, 16, 8), (7, 30, 16), (40, 12, 8)],
)
def test_matches_xla_structured(nx, ny, br):
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.normal(size=(2, ny + 1, nx + 1)).astype(np.float32) * 1e-3)
    d = jnp.asarray(rng.uniform(0, 1, (ny + 1, nx + 1)).astype(np.float32))
    pal = p2d.make_residual_kernel(nx, ny, 1 / nx, 1 / ny, E, NU,
                                   block_rows=br)
    r_pal = np.asarray(pal(u, d))
    r_ref = np.asarray(_grid(nx, ny).residual(u, {"d": d}))
    err = np.abs(r_pal - r_ref).max() / np.abs(r_ref).max()
    assert err < 2e-6, err


def test_zero_state_zero_residual():
    nx = ny = 12
    pal = p2d.make_residual_kernel(nx, ny, 1 / nx, 1 / ny, E, NU,
                                   block_rows=8)
    u = jnp.zeros((2, ny + 1, nx + 1), jnp.float32)
    d = jnp.full((ny + 1, nx + 1), 0.5, jnp.float32)
    r = np.asarray(pal(u, d))
    np.testing.assert_allclose(r, 0.0)


def test_bc_driven_state():
    """Linear ramp in x: residual nonzero only at the clamped columns
    (interior equilibrium of a uniform strain state)."""
    nx = ny = 16
    pal = p2d.make_residual_kernel(nx, ny, 1 / nx, 1 / ny, E, NU,
                                   block_rows=8)
    x = np.linspace(0, 0.01, nx + 1)[None, :]
    u = np.zeros((2, ny + 1, nx + 1), np.float32)
    u[0] = x
    d = np.zeros((ny + 1, nx + 1), np.float32)
    r = np.asarray(pal(jnp.asarray(u), jnp.asarray(d)))
    interior = r[:, 1:-1, 1:-1]
    assert np.abs(interior).max() < 1e-3 * np.abs(r).max()


@pytest.mark.slow
def test_pallas3d_matvec_matches():
    """3D constant-stencil matvec (interpret mode) vs the AD tangent,
    including anisotropic cells and boundary masks."""
    import tpufem.structured.pallas3d as p3d
    from tpufem.forms import linear_elastic_psi
    from tpufem.structured.grid3d import StructuredGrid3D

    grid = StructuredGrid3D(
        nx=9, ny=7, nz=11, hx=0.1, hy=0.2, hz=0.15, bs=3,
        energy_density=lambda g, c: linear_elastic_psi(
            0.5 * (g + g.T), E, NU
        ),
        field_kinds={},
    )
    mv = p3d.make_linear_matvec(grid, E, NU, block_z=4)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(3, 12, 8, 10)).astype(np.float32))
    y = np.asarray(mv(x))
    ref = np.asarray(
        grid.tangent_action(jnp.zeros_like(x), {}, x)
    ).astype(np.float32)
    err = np.abs(y - ref).max() / np.abs(ref).max()
    assert err < 5e-6, err


def test_pallas3d_analytic_cell_matrix():
    """Analytic f64 Ke equals the f64 AD Hessian of the same energy."""
    import tpufem.structured.pallas3d as p3d
    from tpufem.forms import linear_elastic_psi
    from tpufem.structured.grid3d import StructuredGrid3D

    grid = StructuredGrid3D(
        nx=3, ny=3, nz=3, hx=0.11, hy=0.23, hz=0.31, bs=3,
        energy_density=lambda g, c: linear_elastic_psi(
            0.5 * (g + g.T), E, NU
        ),
        field_kinds={},
    )
    Ke_np = p3d._cell_matrix(grid, E, NU)
    energy = grid._cell_energy_with_coeffs()
    Ke_ad = np.asarray(jax.hessian(lambda u: energy(u, {}))(jnp.zeros((8, 3))))
    assert np.abs(Ke_np - Ke_ad).max() / np.abs(Ke_ad).max() < 1e-14


def test_stress_jvp_matches_ad():
    """Hand-derived spectral tangent action vs jax.jvp of grad(psi)."""
    from tpufem.forms.potentials import lame_parameters
    import tpufem.structured.pallas2d as p2d_mod

    lam, mu = (float(v) for v in lame_parameters(E, NU))
    rng = np.random.default_rng(0)
    eps = rng.normal(size=(2000, 3)).astype(np.float32) * 1e-3
    tan = rng.normal(size=(2000, 3)).astype(np.float32) * 1e-3
    dd = rng.uniform(0, 1, 2000).astype(np.float32)

    def sig_of(e, d):
        m = jnp.array([[e[0], e[2]], [e[2], e[1]]])
        g = jax.grad(lambda x: asym_damage_psi(x, d, E, NU))(m)
        g = 0.5 * (g + g.T)
        return jnp.array([g[0, 0], g[1, 1], 2 * g[0, 1]])

    ad = jax.vmap(
        lambda e, t, d: jax.jvp(lambda x: sig_of(x, d), (e,), (t,))[1]
    )(jnp.asarray(eps), jnp.asarray(tan), jnp.asarray(dd))
    hand = p2d_mod._stress_jvp(
        eps[:, 0], eps[:, 1], eps[:, 2],
        tan[:, 0], tan[:, 1], tan[:, 2], dd, lam, mu,
    )
    hand = np.stack([np.asarray(h) for h in hand], axis=1)
    ref = np.stack(
        [np.asarray(ad[:, 0]), np.asarray(ad[:, 1]), np.asarray(ad[:, 2]) / 2],
        axis=1,
    )
    assert np.abs(hand - ref).max() / np.abs(ref).max() < 1e-5


def test_tangent_kernel_matches_ad_jvp():
    """Fused Pallas tangent kernel (interpret) vs grid2d AD jvp."""
    import tpufem.structured.pallas2d as p2d_mod

    nx, ny = 13, 9
    grid = StructuredGrid2D(
        nx=nx, ny=ny, hx=1 / nx, hy=1 / ny, bs=2,
        energy_density=lambda g, c: asym_damage_psi(
            0.5 * (g + g.T), c["d"], E, NU
        ),
        field_kinds={"d": "vertex"},
    )
    jvp_k = p2d_mod.make_tangent_kernel(nx, ny, 1 / nx, 1 / ny, E, NU,
                                        block_rows=8)
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.normal(size=(2, ny + 1, nx + 1)).astype(np.float32) * 1e-3)
    v = jnp.asarray(rng.normal(size=(2, ny + 1, nx + 1)).astype(np.float32))
    d = jnp.asarray(rng.uniform(0, 1, (ny + 1, nx + 1)).astype(np.float32))
    got = np.asarray(jvp_k(u, d, v))
    ref = np.asarray(grid.tangent_action(u, {"d": d}, v))
    assert np.abs(got - ref).max() / np.abs(ref).max() < 5e-6
