"""Sweep the lane layout's bin height (wg_own) on-chip.

The fused kernel's gather/scatter work per owned dof scales ~ wg/wg_own
(window rows per owned row). 2D lanes are x-strips ~8 nodes wide at
n=1024, so wg_own=16 bins are 8x2 nodes (aspect 4:1, copy-heavy) while
wg_own=64 bins are 8x8 (square): plan stats at n=512 polycrystal give
cost ratios 2.50 / 2.00 / 1.75 for wg_own 16/32/64. This measures the
real fused residual+tangent rate per wg_own.

Usage: python benchmarks/wg_sweep.py [n=1024] [jitter=1] [wg_own...=16 32 64]
"""

import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
sys.path.insert(0, "/root/repo")

import jax.numpy as jnp
import numpy as np


def main():
    from tpufem.cases.polycrystal import generate_polycrystal
    from tpufem.forms import EnergyFunctional, asym_damage_psi
    from tpufem.forms.form import Coefficient, Term
    from tpufem.lane import LaneEngine
    from tpufem.mesh import unit_square
    from tpufem.spaces import DirichletBC, FunctionSpace
    from tpufem.spaces.bc import locate_dofs_geometrical

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    jitter = bool(int(sys.argv[2])) if len(sys.argv) > 2 else True
    wgs = [int(a) for a in sys.argv[3:]] or [16, 32, 64]

    t0 = time.perf_counter()
    mesh = (generate_polycrystal(n, n_grains=200) if jitter
            else unit_square(n))
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
    bcs = [DirichletBC(V, left, [0.0, 0.0])]
    kind = "polycrystal" if jitter else "regular-tri"
    print(f"{kind}: {ndofs/1e6:.2f}M dofs, mesh "
          f"{time.perf_counter()-t0:.1f}s", flush=True)

    for wg_own in wgs:
        t0 = time.perf_counter()
        eng = LaneEngine(F, bcs, fused=True, wg_own=wg_own)
        p = eng.plan
        cc = jax.tree.map(
            lambda a: a.astype(jnp.float32),
            eng.prepare_coeffs({"d": jnp.asarray(d)}),
        )
        eng32 = jax.tree.map(
            lambda a: a.astype(jnp.float32)
            if a.dtype == jnp.float64 else a,
            eng,
        )
        u0 = eng32.bc_lane.astype(jnp.float32)
        print(f"wg_own={wg_own}: plan {time.perf_counter()-t0:.1f}s "
              f"G={p.G} wg={p.wg} kc={p.kc} R={p.R} "
              f"copies={len(p.copy_dst_rows)/p.n_nodes:.2f}x "
              f"passes={len(p.owner_passes)}", flush=True)

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

        for label, chain, args in (
            ("residual", chain_r, (eng32, cc)),
            ("tangent ", chain_t, (eng32, cc, u0)),
        ):
            try:
                x = chain(*args, u0, 2)
                float(np.asarray(x).ravel()[0])

                def run(r):
                    t0 = time.perf_counter()
                    xx = chain(*args, u0, r)
                    float(np.asarray(xx).ravel()[0])
                    return time.perf_counter() - t0

                ta, tb = run(64), run(2064)
                per = max(tb - ta, 1e-9) / 2000
                print(f"  {label}: {per*1e3:7.3f} ms -> "
                      f"{ndofs/per/1e6:7.1f} MDoF/s", flush=True)
            except Exception as e:
                print(f"  {label}: FAILED {type(e).__name__}: {e}",
                      flush=True)


if __name__ == "__main__":
    main()
