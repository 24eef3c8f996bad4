"""Unstructured lane-engine benchmark: residual assembly + tangent
action at ~2.1M DoF on the asym elasto-damage physics.

The VERDICT round-2 target: >=1 GDoF/s residual assembly on an
*unstructured* ~2M-DoF triangle mesh (the round-1 gather path managed
~5-15 MDoF/s). The mesh here is generate.rectangle's triangulation fed
through the generic unstructured pipeline (read->plan->assemble); the
engine never sees its regularity.

Usage: python benchmarks/lane_bench.py [n=1024] [wg_own=16]
Timing per memory/axon-tpu-runtime-gotchas.md (chained, slope protocol).
"""

import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
sys.path.insert(0, "/root/repo")

import jax.numpy as jnp
import numpy as np


def slope_time(label, chain, args, x0, reps=(64, 2064), chunk=None):
    # the axon tunnel's per-dispatch round trip is 2-3 s and varies by
    # seconds run-to-run; the chain-length difference must put several
    # seconds of real device work between the two runs or the slope is
    # noise (negative values observed at 192-iteration differences)
    """chain(*args, x, iters) jitted with everything an argument (closure
    constants rematerialize per call on this runtime).

    ``chunk``: split each chain into dispatches of at most this many
    iterations, fed back-to-back without host sync (one materialization
    at the end). Long *single* executions (>~20 s) fault this runtime's
    TPU worker — required for slow per-iter kernels (3D lane)."""
    x = chain(*args, x0, 1)
    float(np.asarray(x).ravel()[0])

    def run(r):
        t0 = time.perf_counter()
        xx = x0
        if chunk:
            left = r
            while left > 0:
                step = min(chunk, left)
                xx = chain(*args, xx, step)
                left -= step
        else:
            xx = chain(*args, xx, r)
        float(np.asarray(xx).ravel()[0])
        return time.perf_counter() - t0

    ta, tb = run(reps[0]), run(reps[1])
    per = max(tb - ta, 1e-9) / (reps[1] - reps[0])
    print(f"{label}: {per*1e3:8.3f} ms/iter", flush=True)
    return per


def main():
    from tpufem.forms import EnergyFunctional, asym_damage_psi
    from tpufem.forms.form import Coefficient, Term
    from tpufem.lane import LaneEngine
    from tpufem.mesh import unit_square
    from tpufem.spaces import DirichletBC, FunctionSpace
    from tpufem.spaces.bc import locate_dofs_geometrical

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    wg_own = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    E, NU = 1.0e6, 0.3

    t0 = time.time()
    mesh = unit_square(n)
    V = FunctionSpace.create(mesh, 1, bs=2)
    DS = FunctionSpace.create(mesh, 1, bs=1)
    ndofs = V.n_dofs
    d = np.zeros(DS.n_dofs, np.float32)
    d[(DS.dof_coords[:, 1] > 0.45) & (DS.dof_coords[:, 1] < 0.55)] = 0.8
    t = Term(lambda qp: asym_damage_psi(qp.eps, qp.coeff("d"), E, NU), 1)
    F = EnergyFunctional(V, [t], [Coefficient("d", DS)])
    left = locate_dofs_geometrical(V, lambda x: np.abs(x[:, 0]) < 1e-12)
    right = locate_dofs_geometrical(V, lambda x: np.abs(x[:, 0] - 1) < 1e-12)
    bcs = [DirichletBC(V, left, [0.0, 0.0]),
           DirichletBC(V, right, [0.01, 0.0])]
    print(f"mesh+space: {time.time()-t0:.1f}s  ({ndofs/1e6:.2f}M dofs)",
          flush=True)

    t0 = time.time()
    eng = LaneEngine(F, bcs, wg_own=wg_own)
    p = eng.plan
    print(
        f"plan: {time.time()-t0:.1f}s  G={p.G} wg={p.wg} kc={p.kc} "
        f"R={p.R} copies={len(p.copy_dst_rows)} "
        f"({len(p.copy_dst_rows)/p.n_nodes:.2f}x) "
        f"passes={len(eng.owner_shifts)}",
        flush=True,
    )

    dtype = jnp.float32
    cc = jax.tree.map(
        lambda a: a.astype(dtype), eng.prepare_coeffs({"d": jnp.asarray(d)})
    )
    eng32 = jax.tree.map(
        lambda a: a.astype(dtype) if a.dtype == jnp.float64 else a, eng
    )
    u0 = eng32.bc_lane.astype(dtype)

    @jax.jit
    def chain_r(e, c, x, iters):
        def body(_, xx):
            return xx * 0.9999 + e.residual(xx, c) * 1e-9

        return jax.lax.fori_loop(0, iters, body, x)

    @jax.jit
    def chain_t(e, c, ul, x, iters):
        def body(_, xx):
            return xx * 0.9999 + e.tangent_action(ul, c, xx) * 1e-9

        return jax.lax.fori_loop(0, iters, body, x)

    per_r = slope_time("lane residual  ", chain_r, (eng32, cc), u0)
    print(f"  -> {ndofs/per_r/1e9:.2f} GDoF/s residual assembly", flush=True)
    per_t = slope_time("lane tangent   ", chain_t, (eng32, cc, u0), u0)
    print(f"  -> {ndofs/per_t/1e9:.2f} GDoF/s tangent action", flush=True)


if __name__ == "__main__":
    main()
