"""Constitutive energy densities.

All functions map (strain-like tensor, coefficients) → scalar energy
density and are differentiated by JAX: σ = jax.grad(ψ) w.r.t. the strain
argument, consistent tangent = jax.hessian. Branches are jnp.where chains
(TPU has no divergent control flow); every sqrt argument is clamped on the
untaken branch to keep gradients NaN-free — the where-trap the reference
dodges symbolically by switching to the symmetric potential when
i1=i2=0 (doc.tex:925-931, ``asym_ufl.py:50-53``).
"""

from __future__ import annotations

import jax.numpy as jnp


def lame_parameters(E, nu):
    """Plane-strain/3D Lamé parameters from Young modulus + Poisson ratio
    (asym_ufl.py:26-27)."""
    mu = E / (2.0 * (1.0 + nu))
    lam = E * nu / ((1.0 + nu) * (1.0 - 2.0 * nu))
    return lam, mu


def linear_elastic_psi(eps, E, nu):
    """Isotropic linear elasticity: ψ = λ/2 tr(ε)² + μ ε:ε.

    Written with index arithmetic (no jnp.trace/sum on the matrix) so
    it accepts both jnp arrays and the forms.smat.SMat scalar
    containers the lane engine's reduced/fused physics paths use."""
    lam, mu = lame_parameters(E, nu)
    n = eps.shape[0]
    tr = eps[0, 0]
    for i in range(1, n):
        tr = tr + eps[i, i]
    frob = None
    for i in range(n):
        for j in range(n):
            t = eps[i, j] * eps[i, j]
            frob = t if frob is None else frob + t
    return 0.5 * lam * tr * tr + mu * frob


def asym_damage_psi(eps, d, E, nu):
    """Asymmetric traction/compression elasto-damage free energy (2D).

    ψ(ε,d) = (1−α d) λ/2 tr(ε)² + μ Σᵢ (1−αᵢ d) Λᵢ²  with α,αᵢ ∈ {0,1}
    switching on the sign of tr(ε) and of the strain eigenvalues Λᵢ
    (doc.tex:188-203; UFL version asym_ufl.py:37-53). Damage acts only on
    tension-like modes.

    ``eps``: (2,2) symmetric strain. Branch structure matches the
    reference exactly: the symmetric damaged potential is used when
    i1 = i2 = 0 (zero strain); everywhere else the spectral form. The
    sqrt discriminant is clamped via jnp.where so jax.grad/jax.hessian
    stay finite at ε = 0 and at spherical strain (eigenvalue coalescence),
    where the reference's generated code divides by sqrt(0).
    """
    lam, mu = lame_parameters(E, nu)
    e11, e22 = eps[0, 0], eps[1, 1]
    e12 = 0.5 * (eps[0, 1] + eps[1, 0])
    i1 = e11 + e22
    # discriminant of the 2x2 symmetric eigenproblem (always >= 0)
    delta = (e11 - e22) ** 2 + 4.0 * e12 * e12
    sq = e11 * e11 + e22 * e22 + 2.0 * e12 * e12  # ε:ε

    # symmetric (all-mode) damage branch: ψ = (1−d)(λ/2 i1² + μ ε:ε)
    psi_sym = (1.0 - d) * (0.5 * lam * i1 * i1 + mu * sq)

    # spectral branch — clamp sqrt argument on the degenerate set
    degen = delta == 0.0
    delta_safe = jnp.where(degen, 1.0, delta)
    r = jnp.sqrt(delta_safe)
    r = jnp.where(degen, 0.0, r)
    eig1 = 0.5 * (i1 + r)
    eig2 = 0.5 * (i1 - r)
    a1 = jnp.where(eig1 < 0.0, 0.0, 1.0)
    a2 = jnp.where(eig2 < 0.0, 0.0, 1.0)
    a = jnp.where(i1 < 0.0, 0.0, 1.0)
    psi_asym = (
        0.5 * lam * i1 * i1 * (1.0 - a * d)
        + mu * ((1.0 - a1 * d) * eig1 * eig1 + (1.0 - a2 * d) * eig2 * eig2)
    )

    # reference selection: zero strain (i1=0 and i2=0 ⇔ delta=0 and i1=0)
    # → symmetric form (asym_ufl.py:53). We extend it to the whole
    # coalescent set delta==0 where the spectral derivative is singular;
    # there a1=a2=a and both forms coincide analytically.
    return jnp.where(degen, psi_sym_at_coalescence(lam, mu, i1, sq, d, a), psi_asym)


def psi_sym_at_coalescence(lam, mu, i1, sq, d, a):
    """ψ on the eigenvalue-coalescent set (Λ₁=Λ₂=i1/2): smooth limit of the
    spectral form; equals the symmetric form when i1=0 (zero strain)."""
    return 0.5 * lam * i1 * i1 * (1.0 - a * d) + mu * (1.0 - a * d) * sq


def asym_damage_stress_manual(eps, d, E, nu):
    """Hand-derived spectral stress σ = ∂ψ/∂ε — the 'manual' variant.

    Mirrors the closed-form eigen-decomposition stress of
    ``asym_manual.py:35-88`` and MFEM's hand-coded ``asym_stress``
    (MFEM/mechanic2d/asym_elasto_damage_model.cc:205-329). Kept as an
    independent derivation for the variant-redundancy test (SURVEY.md §4.3):
    it must agree with jax.grad(asym_damage_psi) to machine precision.
    """
    lam, mu = lame_parameters(E, nu)
    e11, e22 = eps[0, 0], eps[1, 1]
    e12 = 0.5 * (eps[0, 1] + eps[1, 0])
    i1 = e11 + e22
    delta = (e11 - e22) ** 2 + 4.0 * e12 * e12
    degen = delta == 0.0
    delta_safe = jnp.where(degen, 1.0, delta)
    r = jnp.sqrt(delta_safe)

    eig1 = 0.5 * (i1 + jnp.where(degen, 0.0, r))
    eig2 = 0.5 * (i1 - jnp.where(degen, 0.0, r))
    a1 = jnp.where(eig1 < 0.0, 0.0, 1.0)
    a2 = jnp.where(eig2 < 0.0, 0.0, 1.0)
    a = jnp.where(i1 < 0.0, 0.0, 1.0)

    # eigenvector projectors: P1 = (eps - eig2 I)/(eig1-eig2), P2 = I - P1
    inv_r = jnp.where(degen, 0.0, 1.0 / r)
    I2 = jnp.eye(2, dtype=eps.dtype)
    S = jnp.array([[e11, e12], [e12, e22]], dtype=eps.dtype)
    P1 = jnp.where(degen, 0.5 * I2, (S - eig2 * I2) * inv_r)
    P2 = I2 - P1

    sig_vol = lam * i1 * (1.0 - a * d) * I2
    sig_dev = 2.0 * mu * (
        (1.0 - a1 * d) * eig1 * P1 + (1.0 - a2 * d) * eig2 * P2
    )
    return sig_vol + sig_dev


def neo_hookean_psi(grad_u, E, nu):
    """Compressible neo-Hookean energy (BASELINE.json config 4):
    ψ = μ/2 (I_C − tr I − 2 ln J) + λ/2 (ln J)², F = I + ∇u.

    The consistent tangent the reference derives with dual numbers
    (``admfem.hpp`` Hessian path) comes from jax.hessian here.

    Written against the polymorphic small-matrix helpers
    (forms.smat.trace/matmul/det/add_identity) so the same code runs on
    real jnp matrices (flat Assembler) AND on the lane engine's SMat
    scalar containers — putting large deformation on the fused/reduced
    TPU kernels.
    """
    from tpufem.forms import smat

    lam, mu = lame_parameters(E, nu)
    dim = grad_u.shape[0]
    F = smat.add_identity(grad_u)
    Ic = smat.trace(smat.matmul(F.T, F))
    detF = smat.det(F)
    # clamp for AD safety under inverted trial states
    J_safe = jnp.maximum(detF, 1e-12)
    lnJ = jnp.log(J_safe)
    return 0.5 * mu * (Ic - dim - 2.0 * lnJ) + 0.5 * lam * lnJ * lnJ
