"""Stage-by-stage timing of the lane residual at ~2.1M DoF: which of
gather / physics / scatter / owner-sum / refresh dominates?

Usage: python benchmarks/lane_stage_probe.py [n=1024]
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
    from tpufem.forms import EnergyFunctional, asym_damage_psi
    from tpufem.forms.form import Coefficient, Term
    from tpufem.lane import LaneEngine
    from tpufem.lane.plan import N_LANES
    from tpufem.mesh import unit_square
    from tpufem.spaces import DirichletBC, FunctionSpace
    from tpufem.spaces.bc import locate_dofs_geometrical

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    E, NU = 1.0e6, 0.3
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
    eng = LaneEngine(F, bcs)
    p = eng.plan
    print(
        f"{ndofs/1e6:.2f}M dofs  G={p.G} wg={p.wg} kc={p.kc} R={p.R} "
        f"M={p.G*p.kc*N_LANES/1e6:.2f}M slots ({p.n_cells/1e6:.2f}M cells) "
        f"copies={len(p.copy_dst_rows)/p.n_nodes:.2f}x "
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

    # stage 1: gather only
    @jax.jit
    def chain_g(e, x, iters):
        def body(_, xx):
            g = e._gather_cells(xx)
            # fold back to state shape cheaply (sum over nd -> per-slot)
            bs = xx.shape[0]
            s = g.reshape(p.nv, bs, p.G, p.kc, N_LANES).sum(axis=(0, 3))
            pad = jnp.zeros((bs, p.G, p.wg - 1, N_LANES), xx.dtype)
            full = jnp.concatenate([s[:, :, None, :], pad], axis=2)
            return xx * 0.9999 + full.reshape(bs, p.R, N_LANES) * 1e-9

        return jax.lax.fori_loop(0, iters, body, x)

    # stage 2: gather + physics (grad), fold without scatter
    @jax.jit
    def chain_gp(e, c, x, iters):
        def body(_, xx):
            u_cells = e._gather_cells(xx)
            fn, xarg, xax = e._elem_args(xx.dtype)
            gfun = jax.vmap(jax.grad(fn), in_axes=(-1,) + xax + (-1,),
                            out_axes=-1)
            ev = gfun(u_cells, xarg, c)
            bs = xx.shape[0]
            s = ev.reshape(p.nv, bs, p.G, p.kc, N_LANES).sum(axis=(0, 3))
            pad = jnp.zeros((bs, p.G, p.wg - 1, N_LANES), xx.dtype)
            full = jnp.concatenate([s[:, :, None, :], pad], axis=2)
            return xx * 0.9999 + full.reshape(bs, p.R, N_LANES) * 1e-9

        return jax.lax.fori_loop(0, iters, body, x)

    # stage 3: gather + physics + bin scatter, skip owner/refresh
    @jax.jit
    def chain_gps(e, c, x, iters):
        def body(_, xx):
            u_cells = e._gather_cells(xx)
            fn, xarg, xax = e._elem_args(xx.dtype)
            gfun = jax.vmap(jax.grad(fn), in_axes=(-1,) + xax + (-1,),
                            out_axes=-1)
            ev = gfun(u_cells, xarg, c)
            from tpufem.lane.kernels import lane_scatter

            bs = xx.shape[0]
            e4 = ev.reshape(p.nv, bs, p.G, p.kc, N_LANES)
            src = jnp.transpose(e4, (1, 2, 0, 3, 4)).reshape(
                bs, p.G * p.nv * p.kc, N_LANES
            )
            part = lane_scatter(
                src, e.scatter_starts, e.dest_idx,
                sk=p.nv * p.kc, k_out=p.wg,
            )
            part = jnp.transpose(part, (1, 0, 2, 3))
            return xx * 0.9999 + part.reshape(bs, p.R, N_LANES) * 1e-9

        return jax.lax.fori_loop(0, iters, body, x)

    # full residual
    @jax.jit
    def chain_r(e, c, x, iters):
        def body(_, xx):
            return xx * 0.9999 + e.residual(xx, c) * 1e-9

        return jax.lax.fori_loop(0, iters, body, x)

    reps = (64, 1064)
    tg = slope_time("gather             ", chain_g, (eng32,), u0, reps)
    tgp = slope_time("gather+physics     ", chain_gp, (eng32, cc), u0, reps)
    tgps = slope_time("gather+phys+scatter", chain_gps, (eng32, cc), u0, reps)
    tr = slope_time("full residual      ", chain_r, (eng32, cc), u0, reps)
    print(
        f"breakdown: gather {tg*1e3:.2f} | physics {+(tgp-tg)*1e3:.2f} | "
        f"scatter {(tgps-tgp)*1e3:.2f} | owner+refresh {(tr-tgps)*1e3:.2f} "
        f"ms", flush=True,
    )
    print(f"residual: {ndofs/tr/1e9:.2f} GDoF/s", flush=True)


if __name__ == "__main__":
    main()
