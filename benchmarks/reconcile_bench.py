"""Reconcile the r03 789-vs-1280 MDoF/s polycrystal fused-residual gap
(VERDICT round-3 item 1).

Hypothesis: the slope protocol's (64, 2064) difference carries only
~5 s of device-work signal while the tunnel round trip varies by
seconds, so single-shot slopes have +-0.5 ms/iter error bars — enough
to span the whole discrepancy. This script measures, in ONE session:

  - N repeated slopes at delta=2000 (the r03 protocol)
  - N repeated slopes at delta=8000 (4x the signal)

for the polycrystal fused residual, printing every raw (ta, tb) pair so
the dispatch-overhead variance is visible, plus min/median per protocol.

Usage: python benchmarks/reconcile_bench.py [n=1024] [reps=5]
"""

import statistics
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
sys.path.insert(0, "/root/repo")

import jax.numpy as jnp
import numpy as np


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5

    from tpufem.cases.polycrystal import generate_polycrystal
    from tpufem.forms import EnergyFunctional, asym_damage_psi
    from tpufem.forms.form import Coefficient, Term
    from tpufem.lane import LaneEngine
    from tpufem.spaces import DirichletBC, FunctionSpace
    from tpufem.spaces.bc import locate_dofs_geometrical

    t0 = time.perf_counter()
    mesh = generate_polycrystal(n, n_grains=200)
    V = FunctionSpace.create(mesh, 1, bs=2)
    DS = FunctionSpace.create(mesh, 1, bs=1)
    ndofs = V.n_dofs
    d = np.zeros(DS.n_dofs, np.float32)
    d[np.abs(DS.dof_coords[:, 1] - 0.5) < 0.03] = 0.8
    term = Term(
        lambda qp: asym_damage_psi(qp.eps, qp.coeff("d"), 1.0e6, 0.3), 1
    )
    F = EnergyFunctional(V, [term], [Coefficient("d", DS)])
    left = locate_dofs_geometrical(V, lambda x: np.abs(x[:, 0]) < 1e-12)
    eng = LaneEngine(F, [DirichletBC(V, left, [0.0, 0.0])], fused=True,
                     store_dtype=np.float32)
    cc = jax.tree.map(
        lambda a: a.astype(jnp.float32),
        eng.prepare_coeffs({"d": jnp.asarray(d)}),
    )
    u0 = eng.bc_lane.astype(jnp.float32)
    print(f"setup: {ndofs} dofs, {time.perf_counter()-t0:.1f}s",
          flush=True)

    @jax.jit
    def chain(e, c, x, iters):
        def body(_, xx):
            return xx * 0.9999 + e.residual(xx, c) * 1e-9

        return jax.lax.fori_loop(0, iters, body, x)

    def run(r):
        t0 = time.perf_counter()
        xx = chain(eng, cc, u0, r)
        float(np.asarray(xx).ravel()[0])
        return time.perf_counter() - t0

    t0 = time.perf_counter()
    run(2)
    print(f"compile: {time.perf_counter()-t0:.1f}s", flush=True)

    for lo, hi in ((64, 2064), (64, 8064)):
        delta = hi - lo
        slopes = []
        for i in range(reps):
            ta, tb = run(lo), run(hi)
            dt = max(tb - ta, 1e-9) / delta
            slopes.append(dt)
            print(f"delta={delta}: ta={ta:.2f}s tb={tb:.2f}s "
                  f"-> {dt*1e3:.3f} ms/iter ({ndofs/dt/1e6:.0f} MDoF/s)",
                  flush=True)
        mn, md = min(slopes), statistics.median(slopes)
        print(f"delta={delta} SUMMARY: min {mn*1e3:.3f} ms "
              f"({ndofs/mn/1e6:.0f} MDoF/s), median {md*1e3:.3f} ms "
              f"({ndofs/md/1e6:.0f} MDoF/s)", flush=True)


if __name__ == "__main__":
    main()
