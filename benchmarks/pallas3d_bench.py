"""Pallas 3D constant-stencil matvec + full CG solve at 10M DoF.

The config-3 target: <5 s end-to-end 10M-DoF 3D elasticity.

Usage: python benchmarks/pallas3d_bench.py [n=148]
"""

import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
sys.path.insert(0, "/root/repo")


def main():
    from tpufem.forms import linear_elastic_psi
    from tpufem.structured.grid3d import StructuredGrid3D
    from tpufem.structured.pallas3d import make_linear_matvec

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 148
    N1 = n + 1
    ndofs = 3 * N1**3
    E, NU = 1.0e6, 0.3
    grid = StructuredGrid3D(
        nx=n, ny=n, nz=n, hx=1 / n, hy=1 / n, hz=1 / n, bs=3,
        energy_density=lambda g, c: linear_elastic_psi(
            0.5 * (g + g.T), E, NU
        ),
        field_kinds={},
    )
    mv = make_linear_matvec(grid, E, NU, block_z=2)

    # on-chip correctness at small n
    gs = StructuredGrid3D(
        nx=12, ny=12, nz=12, hx=1 / 12, hy=1 / 12, hz=1 / 12, bs=3,
        energy_density=grid.energy_density, field_kinds={},
    )
    mvs = make_linear_matvec(gs, E, NU, block_z=2)
    rng = np.random.default_rng(0)
    xs = jnp.asarray(rng.normal(size=(3, 13, 13, 13)).astype(np.float32))
    err = float(
        jnp.abs(
            mvs(xs) - gs.tangent_action(jnp.zeros_like(xs), {}, xs)
        ).max()
        / jnp.abs(mvs(xs)).max()
    )
    print(f"on-chip correctness (n=12): rel err {err:.2e}", flush=True)

    # chained matvec throughput
    x0 = jnp.asarray(
        rng.normal(size=(3, N1, N1, N1)).astype(np.float32) * 1e-3
    )

    @jax.jit
    def chain(x, iters):
        def body(_, v):
            return v * 0.5 + 1e-7 * mv(v)

        return jax.lax.fori_loop(0, iters, body, x)

    t0 = time.perf_counter()
    y = chain(x0, 2)
    float(np.asarray(y)[0, 0, 0, 0])
    print(f"matvec compile: {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    y = chain(x0, 5)
    float(np.asarray(y)[0, 0, 0, 0])
    ta = time.perf_counter() - t0
    t0 = time.perf_counter()
    y = chain(x0, 1005)
    float(np.asarray(y)[0, 0, 0, 0])
    tb = time.perf_counter() - t0
    per = max(tb - ta, 1e-9) / 1000
    print(
        f"pallas 3D matvec: {per*1e3:.3f} ms -> {ndofs/per/1e6:.0f} MDoF/s",
        flush=True,
    )

    # full CG solve (pulled bar), chunked with the pallas operator
    free = np.ones((3, N1, N1, N1), dtype=np.float32)
    free[:, :, :, 0] = 0.0
    free[:, :, :, -1] = 0.0
    freej = jnp.asarray(free)
    bcv = np.zeros((3, N1, N1, N1), dtype=np.float32)
    bcv[0, :, :, -1] = 0.01
    u0 = jnp.asarray(bcv)  # BCs in initial guess, delta solve

    diag = grid.diagonal(jnp.zeros_like(u0), {})
    diag = diag * freej + (1.0 - freej)
    dinv = jnp.where(diag != 0, 1.0 / diag, 1.0)

    @jax.jit
    def rhs(u):
        return -grid.residual(u, {}) * freej

    @partial(jax.jit, static_argnums=(0,))
    def cg_chunk(nsteps, state):
        def A(v):
            return mv(v * freej) * freej + v * (1.0 - freej)

        def dot(a, b):
            return jnp.vdot(a, b)

        def body(_, st):
            x, r, z, p, rz = st
            Ap = A(p)
            alpha = rz / dot(p, Ap)
            x = x + alpha * p
            r = r - alpha * Ap
            z = dinv * r
            rz_new = dot(r, z)
            p = z + (rz_new / rz) * p
            return (x, r, z, p, rz_new)

        st = jax.lax.fori_loop(0, nsteps, body, state)
        return st, jnp.sqrt(jnp.vdot(st[1], st[1]))

    b = rhs(u0)
    bnorm = float(jnp.sqrt(jnp.vdot(b, b)))
    z0 = dinv * b
    state = (jnp.zeros_like(b), b, z0, z0, jnp.vdot(b, z0))
    # warm-up compile of the chunk
    _s, _r = cg_chunk(100, state)
    float(_r)
    t0 = time.perf_counter()
    state = (jnp.zeros_like(b), b, z0, z0, jnp.vdot(b, z0))
    k = 0
    tol = 1e-6 * bnorm
    while k < 2000:
        state, rr = cg_chunk(100, state)
        k += 100
        if float(rr) < tol:
            break
    t_solve = time.perf_counter() - t0
    print(
        f"e2e CG solve ({ndofs/1e6:.1f}M dofs): {t_solve:.3f} s, "
        f"cg={k} rel={float(rr)/bnorm:.2e}",
        flush=True,
    )


if __name__ == "__main__":
    main()
