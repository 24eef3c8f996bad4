"""Assembly-throughput microbenchmark with honest timing.

On the remote-TPU runtime ``block_until_ready`` does not reliably
synchronize; the only trustworthy protocol is: chain the work inside one
jitted fori_loop (each pass consumes the previous result, so nothing can
be cached or elided), materialize one scalar on host, and difference two
chain lengths to cancel dispatch/transfer overhead.

Usage: python benchmarks/assembly_bench.py [n=724]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
sys.path.insert(0, "/root/repo")


def timed(label, fn, *args):
    t0 = time.perf_counter()
    out = fn(*args)
    val = float(np.asarray(out).ravel()[0])  # true materialization
    dt = time.perf_counter() - t0
    print(f"{label}: {dt:.3f}s ({val:.3e})", flush=True)
    return dt


def main():
    from tpufem.assemble import Assembler
    from tpufem.forms import EnergyFunctional, asym_damage_psi
    from tpufem.forms.form import Coefficient, Term
    from tpufem.mesh import unit_square
    from tpufem.mesh.reorder import sfc_reorder
    from tpufem.spaces import FunctionSpace

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 724
    mesh = sfc_reorder(unit_square(n))
    V = FunctionSpace.create(mesh, 1, bs=2)
    DS = FunctionSpace.create(mesh, 1, bs=1)
    d = np.full(DS.n_dofs, 0.3)
    F = EnergyFunctional(
        V,
        [Term(lambda qp: asym_damage_psi(qp.eps, qp.coeff("d"), 1e6, 0.3), 1)],
        [Coefficient("d", DS)],
    )
    asm = Assembler(F, [])
    asm.pattern
    dd = jnp.asarray(d, dtype=jnp.float32)
    u0 = jnp.zeros(V.n_dofs, dtype=jnp.float32)
    print(f"n={n}: {V.n_dofs} dofs, {mesh.n_cells} cells", flush=True)

    @jax.jit
    def chain_res(asm_, u, d, iters):
        def body(_, u):
            r = asm_.residual(u, {"d": d})
            return u + 1e-12 * r

        return jax.lax.fori_loop(0, iters, body, u)

    @jax.jit
    def chain_mat(asm_, u, d, iters):
        def body(_, u):
            m = asm_.matrix(u, {"d": d})
            return u + 1e-12 * m.vals[0]

        return jax.lax.fori_loop(0, iters, body, u)

    timed("residual chain x3 (compile)", chain_res, asm, u0, dd, 3)
    d1 = timed("residual chain x10", chain_res, asm, u0, dd, 10)
    d2 = timed("residual chain x60", chain_res, asm, u0, dd, 60)
    per = (d2 - d1) / 50
    print(f"TRUE residual: {per*1e3:.3f} ms -> {V.n_dofs/per/1e6:.0f} MDoF/s",
          flush=True)

    timed("matrix chain x3 (compile)", chain_mat, asm, u0, dd, 3)
    d1 = timed("matrix chain x10", chain_mat, asm, u0, dd, 10)
    d2 = timed("matrix chain x40", chain_mat, asm, u0, dd, 40)
    per = (d2 - d1) / 30
    print(f"TRUE matrix: {per*1e3:.3f} ms -> {V.n_dofs/per/1e6:.0f} MDoF/s",
          flush=True)


if __name__ == "__main__":
    main()
