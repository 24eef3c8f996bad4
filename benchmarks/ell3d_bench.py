"""3D CG-operator head-to-head: assembled-ELL SpMV vs fused matrix-free JVP.

VERDICT r4 item 4: the 3D fused gather+physics+scatter tangent sits at
~10.5 ms/iter (0.20 GDoF/s) at 2.04M DoF and the remaining gap to the
0.5 target is architectural (select cost per DoF ~6x the 2D's). The
reference assembles its Jacobian ONCE per Newton step and runs ~400 CG
iterations against the stored matrix (FEniCSx/mechanic2d/
asym_elasto_damage_model.cc:852-867 — MatAssembly + KSPSolve); the TPU
analog is the ELL operator (tpufem/assemble/pattern.py:EllMatrix), whose
matvec is a dense (width, n) gather + multiply + axis-0 reduction that
rides HBM bandwidth instead of the lane select pipeline.

This bench measures, on the SAME 2.04M-DoF P1-tet elasticity problem as
lane3d_bench.py:
  - fused lane JVP per-iteration time (today's CG hot path),
  - ELL pattern build (host, once per mesh),
  - ELL assembly time (device, once per Newton step),
  - ELL matvec per-iteration time,
  - parity of the two constrained operators,
and reports the breakeven CG-iteration count plus the effective
per-iteration time at the reference's ~400 iters/Newton.

Usage: python benchmarks/ell3d_bench.py [n=87] [mode=both|ell|fused]

MEASURED CONCLUSION (round 5, v5e via the axon tunnel): the assembled
path LOSES by ~80x and the fused architecture is justified. The root
cause is isolated in benchmarks/gather_probe_ell.py: XLA's dynamic 1D
gather on this TPU sustains 0.11 Gelem/s (~1 GB/s apparent) regardless
of W (8 vs 45) and regardless of index locality (random vs RCM-banded
+-24k) — arbitrary gathers do not ride HBM bandwidth on TPU, they
serialize in the vector unit. An ELL matvec at 2.1M rows x width 45
needs 94M gathered elements -> ~840 ms/iter against the fused JVP's
10.4 ms. The lane engine's windowed Pallas selects exist precisely to
sidestep this (ADVICE/STATUS r4: select cost IS the 3D bottleneck, and
stored element matrices would not remove it since physics measures ~2%
of the fused kernel). Parity of the two constrained operators is
asserted here at small n (1e-7 class, f32).
"""

import os
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
sys.path.insert(0, "/root/repo")

import jax.numpy as jnp
import numpy as np

from benchmarks.lane_bench import slope_time


def build_problem(n):
    from tpufem.forms import EnergyFunctional, linear_elastic_psi
    from tpufem.forms.form import Term
    from tpufem.mesh import box
    from tpufem.mesh.mesh import CellType
    from tpufem.spaces import DirichletBC, FunctionSpace
    from tpufem.spaces.bc import locate_dofs_geometrical

    E, NU = 1.0e6, 0.3
    mesh = box(n, n, n, cell_type=CellType.tetra)
    V = FunctionSpace.create(mesh, 1, bs=3)
    t = Term(lambda qp: linear_elastic_psi(qp.eps, E, NU), 1)
    F = EnergyFunctional(V, [t])
    left = locate_dofs_geometrical(V, lambda x: np.abs(x[:, 0]) < 1e-12)
    right = locate_dofs_geometrical(V, lambda x: np.abs(x[:, 0] - 1) < 1e-12)
    bcs = [DirichletBC(V, left, [0.0, 0.0, 0.0]),
           DirichletBC(V, right, [0.01, 0.0, 0.0])]
    return mesh, V, F, bcs


def parity_check(n=12):
    """ELL constrained matvec vs matrix-free constrained JVP, small mesh."""
    from tpufem.assemble import Assembler

    _, V, F, bcs = build_problem(n)
    asm = Assembler(F, bcs)
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.standard_normal(V.n_dofs))
    v = jnp.asarray(rng.standard_normal(V.n_dofs))
    asm.pattern
    mat = asm.matrix(u, {})
    y_ell = np.asarray(mat.matvec(v))
    y_jvp = np.asarray(asm.constrained_action(u, {})(v))
    rel = np.linalg.norm(y_ell - y_jvp) / np.linalg.norm(y_jvp)
    print(f"parity (n={n}, {V.n_dofs} dofs): |ELL - JVP| rel = {rel:.2e}",
          flush=True)
    assert rel < 1e-5, rel
    return rel


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 87
    mode = sys.argv[2] if len(sys.argv) > 2 else "both"

    parity_check()

    t0 = time.time()
    mesh, V, F, bcs = build_problem(n)
    ndofs = V.n_dofs
    print(f"mesh+space: {time.time()-t0:.1f}s "
          f"({ndofs/1e6:.2f}M dofs, {mesh.n_cells/1e6:.2f}M tets)",
          flush=True)

    dtype = jnp.float32
    per_jvp = None
    if mode in ("both", "fused"):
        from tpufem.lane import LaneEngine

        t0 = time.time()
        eng = LaneEngine(F, bcs, fused=True)
        print(f"lane plan: {time.time()-t0:.1f}s", flush=True)
        eng32 = jax.tree.map(
            lambda a: a.astype(dtype) if a.dtype == jnp.float64 else a, eng
        )
        u0 = eng32.bc_lane.astype(dtype)
        cc = {}

        @jax.jit
        def chain_t(e, ul, x, iters):
            tang = e.make_tangent(ul, cc)

            def body(_, xx):
                return xx * 0.9999 + tang(xx) * 1e-9

            return jax.lax.fori_loop(0, iters, body, x)

        per_jvp = slope_time("3D fused JVP", chain_t, (eng32, u0), u0,
                             (64, 1064), chunk=256)
        print(f"  -> {ndofs/per_jvp/1e9:.2f} GDoF/s", flush=True)
        del eng, eng32, u0  # free plan tables before the ELL phase

    if mode == "fused":
        return

    from tpufem.assemble import Assembler

    asm = Assembler(F, bcs)
    t0 = time.time()
    asm.pattern
    pat_s = time.time() - t0
    pat = asm._pattern
    K = int(asm._nnz_plan.idx.shape[0])
    print(f"pattern: {pat_s:.1f}s host (nnz={pat.nnz/1e6:.1f}M, "
          f"width={pat.ell_width}, plan K={K}, "
          f"idx {asm._nnz_plan.idx.nbytes/1e9:.2f} GB)", flush=True)

    rng = np.random.default_rng(1)
    u = jnp.asarray(rng.standard_normal(ndofs), dtype=dtype)
    batch = 1 << 19

    mat_fn = jax.jit(lambda uu: asm.matrix(uu, {}, batch=batch))
    t0 = time.time()
    mat = jax.block_until_ready(mat_fn(u))
    print(f"assembly (compile+run): {time.time()-t0:.1f}s", flush=True)
    asm_times = []
    for _ in range(3):
        t0 = time.time()
        mat = jax.block_until_ready(mat_fn(u))
        asm_times.append(time.time() - t0)
    asm_s = min(asm_times)
    print(f"assembly per Newton: {asm_s:.2f}s (min of 3: "
          f"{[f'{t:.2f}' for t in asm_times]})", flush=True)

    vals, cols = mat.vals, mat.cols
    print(f"ELL operator: vals {vals.nbytes/1e9:.2f} GB + "
          f"cols {cols.nbytes/1e9:.2f} GB, width {vals.shape[0]}",
          flush=True)

    @jax.jit
    def chain_mv(vv, cc_, x, iters):
        def body(_, xx):
            y = jnp.sum(vv * xx[cc_], axis=0)
            return xx * 0.9999 + y * 1e-9

        return jax.lax.fori_loop(0, iters, body, x)

    x0 = jnp.asarray(rng.standard_normal(ndofs), dtype=dtype)
    per_mv = slope_time("3D ELL matvec", chain_mv, (vals, cols), x0,
                        (64, 4064), chunk=1024)
    print(f"  -> {ndofs/per_mv/1e9:.2f} GDoF/s", flush=True)

    if per_jvp is not None:
        gain = per_jvp - per_mv
        if gain > 0:
            breakeven = asm_s / gain
            print(f"breakeven: {breakeven:.0f} CG iters "
                  f"(JVP {per_jvp*1e3:.2f} ms vs matvec {per_mv*1e3:.2f} ms"
                  f" + {asm_s:.2f}s assembly)", flush=True)
        for iters in (100, 400):
            eff = per_mv + asm_s / iters
            print(f"effective @ {iters} iters/Newton: ELL "
                  f"{eff*1e3:.2f} ms/iter ({ndofs/eff/1e9:.2f} GDoF/s) "
                  f"vs fused {per_jvp*1e3:.2f} ms/iter "
                  f"({ndofs/per_jvp/1e9:.2f} GDoF/s)", flush=True)


if __name__ == "__main__":
    main()
