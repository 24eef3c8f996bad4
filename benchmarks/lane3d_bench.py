"""3D unstructured lane-engine benchmark: P1 tetrahedra at ~2M DoF,
linear elasticity (pulled bar), residual + tangent + Jacobi-CG step.

Exercises the 3D lane plan (4-node simplices, gdim 3) at scale — the
reduced-variable physics and windowed kernels are dimension-generic.

Usage: python benchmarks/lane3d_bench.py [n=87]
"""

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

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 87
    E, NU = 1.0e6, 0.3
    t0 = time.time()
    mesh = box(n, n, n, cell_type=CellType.tetra)
    V = FunctionSpace.create(mesh, 1, bs=3)
    ndofs = V.n_dofs
    t = Term(lambda qp: linear_elastic_psi(qp.eps, E, NU), 1)
    F = EnergyFunctional(V, [t])
    left = locate_dofs_geometrical(V, lambda x: np.abs(x[:, 0]) < 1e-12)
    right = locate_dofs_geometrical(V, lambda x: np.abs(x[:, 0] - 1) < 1e-12)
    bcs = [DirichletBC(V, left, [0.0, 0.0, 0.0]),
           DirichletBC(V, right, [0.01, 0.0, 0.0])]
    print(f"mesh+space: {time.time()-t0:.1f}s "
          f"({ndofs/1e6:.2f}M dofs, {mesh.n_cells/1e6:.2f}M tets)",
          flush=True)
    t0 = time.time()
    eng = LaneEngine(F, bcs, fused=True,
                     wg_own=int(__import__("os").environ.get("WGOWN", "32")))
    p = eng.plan
    print(f"plan: {time.time()-t0:.1f}s G={p.G} wg={p.wg} kc={p.kc} "
          f"copies={len(p.copy_dst_rows)/p.n_nodes:.2f}x "
          f"passes={len(eng.owner_shifts)} "
          f"reduced={'yes' if eng._red_res is not None else 'no'}",
          flush=True)

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

    @jax.jit
    def chain_t(e, ul, x, iters):
        # make_tangent is the CG hot path: fused tangent_action when
        # available, else gather hoisted out of the loop
        tang = e.make_tangent(ul, cc)

        def body(_, xx):
            return xx * 0.9999 + tang(xx) * 1e-9

        return jax.lax.fori_loop(0, iters, body, x)

    # ~24 ms/iter: chunk dispatches to ~6 s of device work each (the
    # runtime faults on single executions past ~20 s). Measure both
    # lane paths (staged select-kernel pipeline vs fused
    # gather+physics+scatter with the k_block sub-block grid axis);
    # jit caches the engine pytree by aux identity, so flip _fused on
    # a fresh shallow copy (see bench.py).
    import copy
    import os

    paths = os.environ.get("PATHS", "staged,fused").split(",")
    meas = os.environ.get("MEAS", "residual,tangent").split(",")
    reps = (64, 1064)
    for fused in (False, True):
        if ("fused" if fused else "staged") not in paths:
            continue
        if fused and not eng32._fused:
            # engine fell back at construction (fused_geom=None) —
            # forcing _fused=True would crash, not measure (ADVICE r2)
            print("3D lane fused path unavailable on this engine; "
                  "skipping", flush=True)
            continue
        e = copy.copy(eng32)
        object.__setattr__(e, "_fused", fused)
        path = "fused " if fused else "staged"
        if "residual" in meas:
            pr = slope_time(f"3D lane residual ({path})", chain_r, (e,),
                            u0, reps, chunk=256)
            print(f"  -> {ndofs/pr/1e9:.2f} GDoF/s residual", flush=True)
        if "tangent" in meas:
            pt = slope_time(f"3D lane tangent  ({path})", chain_t,
                            (e, u0), u0, reps, chunk=256)
            print(f"  -> {ndofs/pt/1e9:.2f} GDoF/s tangent (CG path)",
                  flush=True)


if __name__ == "__main__":
    main()
