"""Constitutive law tests — the variant-redundancy gate (SURVEY.md §4.3).

The reference validates its physics by requiring four independent
derivations (UFL-diff, SymPy, SymPy-symmetrized, hand-spectral) to agree
bit-for-bit (doc.tex:2251-2258); MFEM's AD-vs-hand gate is ~1e-15
(doc.tex:2215-2220). Here the two independent derivations are
jax.grad(asym_damage_psi) and the hand-coded spectral stress.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpufem.forms import (
    asym_damage_psi,
    asym_damage_stress_manual,
    lame_parameters,
    linear_elastic_psi,
    neo_hookean_psi,
)

E, NU = 3.7e7, 0.3


def _random_strains(n, scale=1e-3, seed=0):
    key = jax.random.PRNGKey(seed)
    e = jax.random.normal(key, (n, 2, 2), dtype=jnp.float64) * scale
    return 0.5 * (e + jnp.swapaxes(e, 1, 2))


def test_ad_stress_matches_manual_spectral():
    eps = _random_strains(1024)
    d = jax.random.uniform(jax.random.PRNGKey(1), (1024,), dtype=jnp.float64)
    sig_ad = jax.vmap(jax.grad(lambda e, dd: asym_damage_psi(e, dd, E, NU)))(
        eps, d
    )
    sig_ad = 0.5 * (sig_ad + jnp.swapaxes(sig_ad, 1, 2))
    sig_man = jax.vmap(lambda e, dd: asym_damage_stress_manual(e, dd, E, NU))(
        eps, d
    )
    rel = float(jnp.abs(sig_ad - sig_man).max() / jnp.abs(sig_man).max())
    assert rel < 1e-14  # the reference's AD-vs-hand level (doc.tex:2215)


def test_undamaged_reduces_to_linear_elasticity():
    eps = _random_strains(256, seed=3)
    psi_dam = jax.vmap(lambda e: asym_damage_psi(e, 0.0, E, NU))(eps)
    psi_lin = jax.vmap(lambda e: linear_elastic_psi(e, E, NU))(eps)
    np.testing.assert_allclose(psi_dam, psi_lin, rtol=1e-14)


def test_damage_only_affects_tension():
    # pure compression state: eigenvalues both negative → damage inert
    eps_c = jnp.array([[-1e-3, 2e-4], [2e-4, -8e-4]])
    for d in (0.0, 0.5, 1.0):
        assert np.isclose(
            float(asym_damage_psi(eps_c, d, E, NU)),
            float(asym_damage_psi(eps_c, 0.0, E, NU)),
        )
    # pure tension with full damage → zero energy
    eps_t = jnp.array([[1e-3, 0.0], [0.0, 2e-3]])
    assert float(asym_damage_psi(eps_t, 1.0, E, NU)) < 1e-20


def test_gradients_finite_at_degenerate_states():
    """The where/sqrt NaN trap (SURVEY.md §7.3 item 2): grad and hessian
    must be finite at eps=0 and at spherical strain (coalescent
    eigenvalues), where the reference's generated code divides by
    sqrt(0)."""
    g = jax.grad(lambda e: asym_damage_psi(e, 0.5, E, NU))
    h = jax.hessian(lambda e: asym_damage_psi(e, 0.5, E, NU))
    for eps in [
        jnp.zeros((2, 2)),
        1e-3 * jnp.eye(2),   # spherical tension
        -1e-3 * jnp.eye(2),  # spherical compression
    ]:
        assert bool(jnp.isfinite(g(eps)).all()), eps
        assert bool(jnp.isfinite(h(eps)).all()), eps
    # zero strain: stress must be exactly zero
    np.testing.assert_allclose(np.asarray(g(jnp.zeros((2, 2)))), 0.0)


def test_spherical_strain_value_is_smooth_limit():
    # approaching spherical strain, psi must converge to the coalescent
    # value (no jump where the reference would NaN)
    d = 0.7
    base = 2e-3 * jnp.eye(2)
    psi0 = float(asym_damage_psi(base, d, E, NU))
    for t in [1e-5, 1e-8, 1e-11]:
        pert = base + jnp.array([[t, 0], [0, -t]])
        assert abs(float(asym_damage_psi(pert, d, E, NU)) - psi0) < 1e-3 * abs(
            psi0
        )


def test_consistent_tangent_symmetry():
    eps = _random_strains(64, seed=5)
    d = jax.random.uniform(jax.random.PRNGKey(6), (64,), dtype=jnp.float64)
    H = jax.vmap(jax.hessian(lambda e, dd: asym_damage_psi(e, dd, E, NU)))(
        eps, d
    )
    # major symmetry of the tangent: H_ijkl = H_klij
    Ht = jnp.transpose(H, (0, 3, 4, 1, 2))
    np.testing.assert_allclose(np.asarray(H), np.asarray(Ht), atol=1e-8)


def test_neo_hookean_zero_at_identity():
    g = jnp.zeros((3, 3))
    assert float(neo_hookean_psi(g, E, NU)) == 0.0
    # stress-free reference configuration
    P = jax.grad(lambda gu: neo_hookean_psi(gu, E, NU))(g)
    np.testing.assert_allclose(np.asarray(P), 0.0, atol=1e-10)
    # consistency with linear elasticity for small strains (the NH energy
    # differs at O(eps^3), i.e. relative O(eps))
    eps = 1e-5 * jnp.array([[1.0, 0.5, 0.0], [0.5, -2.0, 0.3], [0.0, 0.3, 0.7]])
    psi_nh = float(neo_hookean_psi(eps, E, NU))
    psi_le = float(linear_elastic_psi(eps, E, NU))
    assert abs(psi_nh - psi_le) < 1e-3 * abs(psi_le)


def test_lame():
    lam, mu = lame_parameters(1.0, 0.25)
    assert np.isclose(mu, 0.4)
    assert np.isclose(lam, 0.4)
