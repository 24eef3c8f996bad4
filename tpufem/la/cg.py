"""Preconditioned conjugate gradients, jit/scan-compatible.

Mirrors the reference's KSP CG configuration: rtol 1e-12, max 2000
iterations (FEniCSx/mechanic2d/asym_elasto_damage_model.cc:718) /
mfem::CGSolver (MFEM/...cc:1502, 1525-1528). Implemented as a
lax.while_loop so the whole Newton-Krylov solve stays inside one XLA
program; dot products become psum over the device mesh under shard_map.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp


class CGResult(NamedTuple):
    x: jnp.ndarray
    iters: jnp.ndarray  # int32
    residual_norm: jnp.ndarray
    converged: jnp.ndarray  # bool


def cg(
    A: Callable,
    b: jnp.ndarray,
    x0: Optional[jnp.ndarray] = None,
    *,
    M: Optional[Callable] = None,
    rtol: float = 1.0e-12,
    atol: float = 0.0,
    maxit: int = 2000,
    dot: Optional[Callable] = None,
) -> CGResult:
    """Solve A x = b with (preconditioned) CG.

    ``A`` and ``M`` are linear maps (callables). ``dot`` overrides the
    inner product — the distributed layer passes a psum-reducing dot.
    """
    if x0 is None:
        x0 = jnp.zeros_like(b)
    if M is None:
        M = lambda v: v
    if dot is None:
        dot = lambda a, c: jnp.dot(a, c, precision=jax.lax.Precision.HIGHEST)

    r0 = b - A(x0)
    z0 = M(r0)
    rz0 = dot(r0, z0)
    bnorm = jnp.sqrt(dot(b, b))
    # PETSc-style: relative to ||b||
    tol2 = jnp.maximum(rtol * bnorm, atol) ** 2

    def cond(state):
        _, r, _, _, rz, k = state
        rr = dot(r, r)
        return (rr > tol2) & (k < maxit)

    def body(state):
        x, r, z, p, rz, k = state
        Ap = A(p)
        alpha = rz / dot(p, Ap)
        x = x + alpha * p
        r = r - alpha * Ap
        z = M(r)
        rz_new = dot(r, z)
        beta = rz_new / rz
        p = z + beta * p
        return (x, r, z, p, rz_new, k + 1)

    state = (x0, r0, z0, z0, rz0, jnp.zeros((), jnp.int32))
    x, r, _, _, _, k = jax.lax.while_loop(cond, body, state)
    rr = jnp.sqrt(dot(r, r))
    return CGResult(x=x, iters=k, residual_norm=rr, converged=rr * rr <= tol2)
