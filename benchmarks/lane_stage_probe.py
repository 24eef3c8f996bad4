"""Per-stage timing of the lane residual pipeline at ~2.1M DoF:
gather / physics / scatter+owner+refresh, chained separately.
Usage: python benchmarks/lane_stage_probe.py [n=1024] [wg_own=16]
"""

import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
sys.path.insert(0, "/root/repo")

import jax.numpy as jnp
import numpy as np


def slope(label, chain, args, x0, reps=(64, 2064)):
    x = chain(*args, x0, 1)
    float(np.asarray(x).ravel()[0])

    def run(r):
        t0 = time.perf_counter()
        xx = chain(*args, x0, r)
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

    mesh = unit_square(n)
    V = FunctionSpace.create(mesh, 1, bs=2)
    DS = FunctionSpace.create(mesh, 1, bs=1)
    d = np.zeros(DS.n_dofs, np.float32)
    d[(DS.dof_coords[:, 1] > 0.45) & (DS.dof_coords[:, 1] < 0.55)] = 0.8
    t = Term(lambda qp: asym_damage_psi(qp.eps, qp.coeff("d"), 1e6, 0.3), 1)
    F = EnergyFunctional(V, [t], [Coefficient("d", DS)])
    left = locate_dofs_geometrical(V, lambda x: np.abs(x[:, 0]) < 1e-12)
    eng = LaneEngine(F, [DirichletBC(V, left, [0.0, 0.0])], wg_own=wg_own)
    cc = jax.tree.map(lambda a: a.astype(jnp.float32),
                      eng.prepare_coeffs({"d": jnp.asarray(d)}))
    eng = jax.tree.map(
        lambda a: a.astype(jnp.float32) if a.dtype == jnp.float64 else a, eng
    )
    u0 = eng.bc_lane.astype(jnp.float32)
    print(f"ready: {V.n_dofs/1e6:.2f}M dofs", flush=True)

    nd = eng.plan.nv * eng.bs
    M = eng.plan.G * eng.plan.kc * 128
    ev0 = jnp.zeros((nd, M), jnp.float32)

    @jax.jit
    def c_gather(e, x, iters):
        def body(_, xx):
            g = e._gather_cells(xx)
            return xx * 0.9999 + g[:2].reshape(
                2, e.plan.G * e.plan.kc, 128
            )[:, : e.plan.R, :] * 1e-9
        return jax.lax.fori_loop(0, iters, body, x)

    @jax.jit
    def c_phys(e, c, g0, iters):
        fn, xarg, xax = e._elem_args(jnp.float32)
        gr = jax.vmap(jax.grad(fn), in_axes=(-1,) + xax + (-1,), out_axes=-1)

        def body(_, gg):
            ev = gr(gg, xarg, c)
            return gg * 0.9999 + ev * 1e-9
        return jax.lax.fori_loop(0, iters, body, g0)

    @jax.jit
    def c_scatter(e, ev, iters):
        def body(_, xx):
            r = e._scatter_cells(xx)
            big = jnp.zeros_like(xx)
            big = big.at[:, : e.plan.R // 2, :].set(r[:, : e.plan.R // 2, :])
            return xx * 0.9999 + big * 1e-9
        return jax.lax.fori_loop(0, iters, body, ev.reshape(nd, M))

    # scatter chain needs matching shapes: feed (nd, M) and fold r back in
    @jax.jit
    def c_scatter2(e, x, iters):
        # x is (bs, R, 128); build fake element vectors by broadcast and
        # time scatter+owner+refresh alone
        def body(_, xx):
            ev = jnp.broadcast_to(
                xx.reshape(eng.bs, -1)[:, :1], (eng.bs, M)
            ) * jnp.ones((eng.plan.nv, 1, 1), xx.dtype)
            ev = ev.reshape(nd, M) * 0.5
            r = e._scatter_cells(ev)
            return xx * 0.9999 + r * 1e-9
        return jax.lax.fori_loop(0, iters, body, x)

    g0 = eng._gather_cells(u0)
    slope("gather          ", c_gather, (eng,), u0)
    slope("physics (grad)  ", c_phys, (eng, cc), g0)
    slope("scatter+owner   ", c_scatter2, (eng,), u0)

    @jax.jit
    def c_res(e, c, x, iters):
        def body(_, xx):
            return xx * 0.9999 + e.residual(xx, c) * 1e-9
        return jax.lax.fori_loop(0, iters, body, x)

    slope("full residual   ", c_res, (eng, cc), u0)


if __name__ == "__main__":
    main()
