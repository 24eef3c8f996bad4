"""Q2-hex fused vs staged lane kernels on the real chip (VERDICT r4
item 7 done-criterion: parity test + measured fused-vs-staged speedup).

The fused gather+physics+scatter kernel streams a ~2300-row geometry
block per cell; round 5 sized its sub-block kb to a 4 MB VMEM budget
(engine.py:164-187) instead of hard-gating Q2 hex to the staged path.
This measures what that bought at scale — the analog of the reference's
H1 generic-vs-specialized 2.7x (doc.tex:1587-1590).

Usage: python benchmarks/q2hex_bench.py [n=40]
"""

import copy
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
sys.path.insert(0, "/root/repo")

import jax.numpy as jnp
import numpy as np

from benchmarks.lane_bench import slope_time


def main():
    from tpufem.forms import EnergyFunctional, linear_elastic_psi
    from tpufem.forms.form import Term
    from tpufem.lane import LaneEngine
    from tpufem.mesh import box
    from tpufem.mesh.mesh import CellType
    from tpufem.spaces import DirichletBC, FunctionSpace
    from tpufem.spaces.bc import locate_dofs_geometrical

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    t0 = time.time()
    mesh = box(n, n, n, cell_type=CellType.hexahedron)
    V = FunctionSpace.create(mesh, 2, bs=3)
    ndofs = V.n_dofs
    t = Term(lambda qp: linear_elastic_psi(qp.eps, 1.0e6, 0.3), 3)
    F = EnergyFunctional(V, [t])
    left = locate_dofs_geometrical(V, lambda x: np.abs(x[:, 0]) < 1e-12)
    right = locate_dofs_geometrical(V, lambda x: np.abs(x[:, 0] - 1) < 1e-12)
    bcs = [DirichletBC(V, left, [0.0, 0.0, 0.0]),
           DirichletBC(V, right, [0.01, 0.0, 0.0])]
    print(f"mesh+space: {time.time()-t0:.1f}s ({ndofs/1e6:.2f}M dofs, "
          f"{mesh.n_cells/1e3:.0f}k Q2 hexes)", flush=True)
    t0 = time.time()
    eng = LaneEngine(F, bcs, fused=True)
    p = eng.plan
    print(f"plan: {time.time()-t0:.1f}s G={p.G} wg={p.wg} kc={p.kc} "
          f"fused={eng._fused} kb={eng._fused_kb}", flush=True)
    assert eng._fused, "Q2 hex fell back to staged — VMEM budget regressed"

    dtype = jnp.float32
    eng32 = jax.tree.map(
        lambda a: a.astype(dtype) if a.dtype == jnp.float64 else a, eng
    )
    u0 = eng32.bc_lane.astype(dtype)
    cc = {}

    @jax.jit
    def chain_r(e, x, iters):
        def body(_, xx):
            return xx * 0.9999 + e.residual(xx, cc) * 1e-9

        return jax.lax.fori_loop(0, iters, body, x)

    results = {}
    for fused in (False, True):
        e = copy.copy(eng32)
        object.__setattr__(e, "_fused", fused)
        path = "fused " if fused else "staged"
        per = slope_time(f"Q2-hex residual ({path})", chain_r, (e,), u0,
                         (16, 116), chunk=50)
        results[path.strip()] = per
        print(f"  -> {ndofs/per/1e9:.3f} GDoF/s", flush=True)
    print(f"fused-vs-staged speedup: "
          f"{results['staged']/results['fused']:.2f}x", flush=True)


if __name__ == "__main__":
    main()
