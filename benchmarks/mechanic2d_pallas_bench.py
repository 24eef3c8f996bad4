"""Flagship nonlinear workload with BOTH Pallas kernels: residual +
consistent-tangent CG operator, at 2.1M DoF.

Usage: python benchmarks/mechanic2d_pallas_bench.py [n=1024]
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
    from tpufem.forms import asym_damage_psi
    from tpufem.structured import StructuredGrid2D
    from tpufem.structured.pallas2d import (
        make_residual_kernel,
        make_tangent_kernel,
    )

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    nx = ny = n
    ndofs = 2 * (n + 1) ** 2
    E, NU = 1.0e6, 0.3
    grid = StructuredGrid2D(
        nx=nx, ny=ny, hx=1 / nx, hy=1 / ny, bs=2,
        energy_density=lambda g, c: asym_damage_psi(
            0.5 * (g + g.T), c["d"], E, NU
        ),
        field_kinds={"d": "vertex"},
    )
    res_k = make_residual_kernel(nx, ny, 1 / nx, 1 / ny, E, NU,
                                 block_rows=64)
    jvp_k = make_tangent_kernel(nx, ny, 1 / nx, 1 / ny, E, NU,
                                block_rows=64)

    # on-chip correctness of the tangent kernel at small n
    ns = 64
    gs = StructuredGrid2D(
        nx=ns, ny=ns, hx=1 / ns, hy=1 / ns, bs=2,
        energy_density=grid.energy_density, field_kinds={"d": "vertex"},
    )
    jvp_s = make_tangent_kernel(ns, ns, 1 / ns, 1 / ns, E, NU,
                                block_rows=32)
    rng = np.random.default_rng(0)
    us = jnp.asarray(rng.normal(size=(2, ns + 1, ns + 1)).astype(np.float32) * 1e-3)
    vs = jnp.asarray(rng.normal(size=(2, ns + 1, ns + 1)).astype(np.float32))
    ds = jnp.asarray(rng.uniform(0, 1, (ns + 1, ns + 1)).astype(np.float32))
    ref = gs.tangent_action(us, {"d": ds}, vs)
    err = float(jnp.abs(jvp_s(us, ds, vs) - ref).max() / jnp.abs(ref).max())
    print(f"on-chip tangent correctness (n={ns}): {err:.2e}", flush=True)

    yy = np.linspace(0, 1, ny + 1)[:, None]
    d = jnp.asarray(
        np.broadcast_to(
            np.where((yy > 0.45) & (yy < 0.55), 0.8, 0.0), (ny + 1, nx + 1)
        ).astype(np.float32)
    )
    free = np.ones((2, ny + 1, nx + 1), dtype=np.float32)
    free[:, :, 0] = 0.0
    free[:, :, -1] = 0.0
    freej = jnp.asarray(free)
    bcv = np.zeros((2, ny + 1, nx + 1), dtype=np.float32)
    bcv[0, :, -1] = 0.01
    u_init = jnp.asarray(bcv)

    diag_fn = jax.jit(
        lambda u, d: grid.diagonal(u, {"d": d}) * freej + (1.0 - freej)
    )

    @jax.jit
    def rhs(u, d):
        return -res_k(u, d) * freej

    @partial(jax.jit, static_argnums=(0,))
    def cg_chunk(nsteps, u_lin, d, dinv, state):
        def A(v):
            av = jvp_k(u_lin, d, v * freej)
            return av * freej + v * (1.0 - freej)

        def body(_, st):
            x, r, z, p, rz = st
            Ap = A(p)
            alpha = rz / jnp.vdot(p, Ap)
            x = x + alpha * p
            r = r - alpha * Ap
            z = dinv * r
            rz_new = jnp.vdot(r, z)
            p = z + (rz_new / rz) * p
            return (x, r, z, p, rz_new)

        st = jax.lax.fori_loop(0, nsteps, body, state)
        return st, jnp.sqrt(jnp.vdot(st[1], st[1]))

    def solve(dd):
        u = u_init
        total_cg = 0
        r0 = None
        for it in range(1, 11):
            b = rhs(u, dd)
            bn = float(jnp.sqrt(jnp.vdot(b, b)))
            if r0 is None:
                r0 = bn
            if bn < max(1e-4 * r0, 1e-2):
                return u, it - 1, total_cg, bn, r0
            dinv = 1.0 / diag_fn(u, dd)
            z0 = dinv * b
            st = (jnp.zeros_like(b), b, z0, z0, jnp.vdot(b, z0))
            tol = 1e-5 * bn
            k = 0
            while k < 6000:
                st, rr = cg_chunk(500, u, dd, dinv, st)
                k += 500
                if float(rr) < tol:
                    break
            u = u + st[0] * freej
            total_cg += k
            print(f"  Newton {it}: |r|={bn:.4e} cg={k}", flush=True)
        return u, it, total_cg, bn, r0

    t0 = time.perf_counter()
    solve(d)
    print(f"first solve (incl compiles): {time.perf_counter()-t0:.1f}s",
          flush=True)
    t0 = time.perf_counter()
    u, newton, cg, bn, r0 = solve(d * (1 + 1e-6))
    t_solve = time.perf_counter() - t0
    print(
        f"mechanic2d-physics PALLAS e2e ({ndofs/1e6:.1f}M dofs): "
        f"{t_solve:.3f} s newton={newton} cg={cg} rel={bn/r0:.2e}",
        flush=True,
    )


if __name__ == "__main__":
    main()
