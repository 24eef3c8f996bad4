"""Attribute the fused-lane residual time to its pipeline stages, on
the regular-tri AND jittered-polycrystal meshes at the same DoF count.

Round-3 driver for VERDICT item 1 (polycrystal fused assembly 0.69 ->
>=1 GDoF/s): the spill/teleport planner equalized cell padding (1.016
both), so the remaining 2.5x regular-vs-jittered gap must live in the
copy machinery — wg_copy 32 vs 16, 8 vs 4 owner/refresh passes, R 1.33x
(measured by this script's plan dump). This bench times, per mesh:

  fused    lane_fused_elem alone (gather + physics + scatter partials)
  ownref   _owner_refresh alone (owner-sum passes + refresh passes + tail)
  full     residual() = fused + ownref

Usage: python benchmarks/lane_attrib_bench.py [n=1024] [wg_own=32]
Timing per memory/axon-tpu-runtime-gotchas.md (chained slope protocol).
"""

import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
sys.path.insert(0, "/root/repo")

import jax.numpy as jnp
import numpy as np

from benchmarks.lane_bench import slope_time


def build(meshname, n, wg_own):
    from tpufem.cases.polycrystal import generate_polycrystal
    from tpufem.forms import EnergyFunctional, asym_damage_psi
    from tpufem.forms.form import Coefficient, Term
    from tpufem.lane import LaneEngine
    from tpufem.mesh import unit_square
    from tpufem.spaces import DirichletBC, FunctionSpace
    from tpufem.spaces.bc import locate_dofs_geometrical

    mesh = (generate_polycrystal(n) if meshname == "poly"
            else unit_square(n))
    V = FunctionSpace.create(mesh, 1, bs=2)
    DS = FunctionSpace.create(mesh, 1, bs=1)
    E, NU = 1.0e6, 0.3
    term = Term(
        integrand=lambda qp: asym_damage_psi(qp.eps, qp.coeff("d"), E, NU),
        degree=1,
    )
    F = EnergyFunctional(V, [term], [Coefficient("d", DS)])
    left = locate_dofs_geometrical(V, lambda x: np.abs(x[:, 0]) < 1e-12)
    bcs = [DirichletBC(V, left, [0.0, 0.0])]
    eng = LaneEngine(F, bcs, wg_own=wg_own, fused=True,
                     store_dtype=np.float32)
    d = np.zeros(DS.n_dofs)
    d[DS.dof_coords[:, 1] > 0.6] = 0.4
    cc = eng.prepare_coeffs({"d": jnp.asarray(d, jnp.float32)})
    p = eng.plan
    print(f"{meshname}: ndofs={V.n_dofs} G={p.G} kc={p.kc} wg={p.wg} "
          f"wg_copy={p.wg_copy} R={p.R} passes={len(p.owner_passes)}"
          f"/{len(p.refresh_passes)} tail={len(p.tail_copy_slot)} "
          f"fused_kb={eng._fused_kb} owner_wrs={eng.owner_wrs} "
          f"refresh_wrs={eng.refresh_wrs}", flush=True)
    return eng, cc, V.n_dofs


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    wg_own = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    import os

    meshes = os.environ.get("MESHES", "tri,poly").split(",")
    stages = os.environ.get("STAGES", "fused,ownref,full").split(",")

    from functools import partial

    from tpufem.lane.kernels import lane_fused_elem

    for meshname in meshes:
        eng, cc, ndofs = build(meshname, n, wg_own)
        p = eng.plan
        bs = eng.bs
        cds = eng._fused_cds(cc, jnp.float32)

        @partial(jax.jit, static_argnums=(3,))
        def chain_fused(e, cd, x, iters):
            def body(_, xx):
                part = lane_fused_elem(
                    (xx,), e.gather_starts, e.gather_idx, cd,
                    e._elem_grad_block, wr=e.plan.wg, nv=e.plan.nv,
                    k_block=e._fused_kb,
                )
                return jnp.transpose(part, (1, 0, 2, 3)).reshape(
                    bs, e.plan.R, 128
                )
            return jax.lax.fori_loop(0, iters, body, x)

        @partial(jax.jit, static_argnums=(2,))
        def chain_ownref(e, x, iters):
            def body(_, xx):
                return e._owner_refresh(
                    xx.reshape(bs, e.plan.G, e.plan.wg, 128)
                )
            return jax.lax.fori_loop(0, iters, body, x)

        @partial(jax.jit, static_argnums=(3,))
        def chain_full(e, c, x, iters):
            def body(_, xx):
                return xx * 0.9999 + e.residual(xx, c) * 1e-9
            return jax.lax.fori_loop(0, iters, body, x)

        u0 = jnp.asarray(
            eng.to_lane(np.random.default_rng(0).normal(
                size=ndofs) * 1e-3),
            jnp.float32,
        )
        # SINGLE dispatch per run: every dispatch pays the tunnel's
        # 2-3 s RTT sequentially, so chunked chains contaminate the
        # slope with (n_dispatch_delta * RTT) / iter_delta — measured
        # ~4 ms/iter of phantom time at chunk=512 (memory:
        # axon-tpu-runtime-gotchas; bench.py runs one dispatch too)
        reps = (64, 2064)
        res = {}
        if "fused" in stages:
            res["fused"] = slope_time(
                f"{meshname} fused-elem ", chain_fused, (eng, cds), u0,
                reps)
        if "ownref" in stages:
            res["ownref"] = slope_time(
                f"{meshname} owner+refresh", chain_ownref, (eng,), u0,
                reps)
        if "full" in stages:
            res["full"] = slope_time(
                f"{meshname} full residual", chain_full, (eng, cc), u0,
                reps)
            print(f"  -> {ndofs/res['full']/1e9:.2f} GDoF/s", flush=True)


if __name__ == "__main__":
    main()
