"""Preconditioners: Jacobi and Chebyshev-smoothed Jacobi.

Stand-ins for hypre BoomerAMG (FEniCSx/mechanic2d/
asym_elasto_damage_model.cc:720-813; MFEM/...cc:1503-1517) per the build
plan (SURVEY.md §7.3 item 4): start Jacobi/Chebyshev, add an AMG-style
multilevel hierarchy later. Both are pure jnp → free to fuse with the CG
body.
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp


def jacobi_preconditioner(diag: jnp.ndarray) -> Callable:
    """M ≈ A⁻¹ as 1/diag (guarded)."""
    inv = jnp.where(diag != 0.0, 1.0 / diag, 1.0)

    def M(r):
        return inv * r

    return M


def estimate_lambda_max(A: Callable, diag: jnp.ndarray, n: int, *,
                        iters: int = 12, key=None) -> jnp.ndarray:
    """Power iteration estimate of λmax(D⁻¹A) for Chebyshev bounds.

    Deterministic start vector (alternating signs) so the estimate is
    reproducible across runs/devices; ~12 iterations give the 2–5%
    accuracy Chebyshev needs.
    """
    inv_d = jnp.where(diag != 0.0, 1.0 / diag, 1.0)
    v0 = jnp.where(
        jnp.arange(n) % 2 == 0, 1.0, -1.0
    ).astype(diag.dtype)
    v0 = v0 / jnp.linalg.norm(v0)

    def body(_, v):
        w = inv_d * A(v)
        return w / jnp.linalg.norm(w)

    import jax

    v = jax.lax.fori_loop(0, iters, body, v0)
    w = inv_d * A(v)
    return jnp.vdot(v, w) / jnp.vdot(v, v)


def chebyshev_iterate(A: Callable, inv_d, lmax, b, x, *, degree: int,
                      lmin_ratio: float = 1.0 / 30.0,
                      lmax_scale: float = 1.1):
    """degree-step Chebyshev iteration on D^-1 A targeting the smoother
    band [lmin_ratio*lmax_scale*lmax, lmax_scale*lmax], starting from x.

    The shared smoother of the multilevel preconditioners (la.amg V-cycle
    and structured.mg2d); a fixed polynomial in A, hence a *linear*,
    symmetric operation — safe inside plain CG.
    """
    import jax.numpy as jnp

    lam_max = lmax_scale * lmax
    lam_min = lmin_ratio * lam_max
    theta = 0.5 * (lam_max + lam_min)
    delta = 0.5 * (lam_max - lam_min)
    sigma = theta / delta
    rho = 1.0 / sigma
    res = inv_d * (b - A(x))
    d = res / theta
    for _ in range(degree):
        x = x + d
        res = res - inv_d * A(d)
        rho_new = 1.0 / (2.0 * sigma - rho)
        d = rho_new * rho * d + (2.0 * rho_new / delta) * res
        rho = rho_new
    return x


def chebyshev_preconditioner(
    A: Callable, diag: jnp.ndarray, *, degree: int = 4,
    lmax_scale: float = 1.1, lmin_ratio: float = 0.25,
    lmax: float | None = None,
) -> Callable:
    """Chebyshev polynomial of the Jacobi-scaled operator.

    Approximates A⁻¹ with a fixed-degree Chebyshev recurrence on
    D⁻¹A, assuming eigenvalues in [lmin_ratio·λmax, lmax_scale·λmax].
    λmax of D⁻¹A defaults to 2.0 (upper bound for SPD FEM operators with
    Jacobi scaling); pass a measured value for tighter clustering.
    """
    inv_d = jnp.where(diag != 0.0, 1.0 / diag, 1.0)
    lam_max = (lmax if lmax is not None else 2.0) * lmax_scale
    lam_min = lam_max * lmin_ratio
    theta = 0.5 * (lam_max + lam_min)
    delta = 0.5 * (lam_max - lam_min)

    def M(r):
        sigma = theta / delta
        rho_old = 1.0 / sigma
        x = jnp.zeros_like(r)
        res = inv_d * r
        d_k = res / theta
        for _ in range(degree):
            x = x + d_k
            res = res - inv_d * A(d_k)
            rho_new = 1.0 / (2.0 * sigma - rho_old)
            d_k = rho_new * rho_old * d_k + (2.0 * rho_new / delta) * res
            rho_old = rho_new
        return x

    return M
