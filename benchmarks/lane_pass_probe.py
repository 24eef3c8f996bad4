"""Isolate the owner-sum / refresh pass cost inside the lane residual.

Variants at ~2.1M DoF:
  A  scatter only (no owner, no refresh)      [baseline 2.5 ms]
  B  + owner passes, no refresh
  C  + owner + refresh (= full residual)
  D  rolls only (8x jnp.roll of the state, no kernels)
  E  owner passes without the roll (pp=0 on all) — isolates the shift
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
    from tpufem.lane.kernels import lane_gather, lane_scatter
    from tpufem.lane.plan import N_LANES
    from tpufem.mesh import unit_square
    from tpufem.spaces import DirichletBC, FunctionSpace
    from tpufem.spaces.bc import locate_dofs_geometrical

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    E, NU = 1.0e6, 0.3
    mesh = unit_square(n)
    V = FunctionSpace.create(mesh, 1, bs=2)
    DS = FunctionSpace.create(mesh, 1, bs=1)
    d = np.zeros(DS.n_dofs, np.float32)
    t = Term(lambda qp: asym_damage_psi(qp.eps, qp.coeff("d"), E, NU), 1)
    F = EnergyFunctional(V, [t], [Coefficient("d", DS)])
    left = locate_dofs_geometrical(V, lambda x: np.abs(x[:, 0]) < 1e-12)
    bcs = [DirichletBC(V, left, [0.0, 0.0])]
    eng = LaneEngine(F, bcs)
    p = eng.plan
    print(f"G={p.G} wg={p.wg} wg_own={p.wg_own} wg_copy={p.wg_copy} "
          f"passes={len(eng.owner_shifts)} "
          f"shifts={list(zip(eng.owner_shifts, [0]*len(eng.owner_shifts)))}",
          flush=True)

    dtype = jnp.float32
    cc = jax.tree.map(
        lambda a: a.astype(dtype), eng.prepare_coeffs({"d": jnp.asarray(d)})
    )
    eng32 = jax.tree.map(
        lambda a: a.astype(dtype) if a.dtype == jnp.float64 else a, eng
    )
    u0 = eng32.bc_lane.astype(dtype) + 1e-3
    bs = 2

    def elem_vectors(e, c, xx):
        u_cells = e._gather_cells(xx)
        fn, xarg, xax = e._elem_args(xx.dtype)
        gfun = jax.vmap(jax.grad(fn), in_axes=(-1,) + xax + (-1,),
                        out_axes=-1)
        return gfun(u_cells, xarg, c)

    def scatter_part(e, ev):
        e4 = ev.reshape(p.nv, bs, p.G, p.kc, N_LANES)
        src = jnp.transpose(e4, (1, 2, 0, 3, 4)).reshape(
            bs, p.G * p.nv * p.kc, N_LANES
        )
        part = lane_scatter(
            src, e.scatter_starts, e.dest_idx, sk=p.nv * p.kc, k_out=p.wg,
        )
        return jnp.transpose(part, (1, 0, 2, 3))  # (bs, G, wg, 128)

    def owner_sum(e, part, roll=True):
        flat = part.reshape(bs, p.R, N_LANES)
        extra = jnp.zeros((bs, p.G, p.wg_own, N_LANES), flat.dtype)
        for pp, st, oidx in zip(e.owner_shifts, e._owner_starts,
                                e._owner_idx):
            rolled = jnp.roll(flat, pp, axis=-1) if roll else flat
            add = lane_gather(rolled, st, oidx, wr=p.wg_copy, sum_v=True)
            extra = extra + jnp.transpose(add, (1, 0, 2, 3))
        part = part.at[:, :, : p.wg_own, :].add(extra)
        return part.reshape(bs, p.R, N_LANES)

    def mk_chain(stage):
        @jax.jit
        def chain(e, c, x, iters):
            def body(_, xx):
                ev = elem_vectors(e, c, xx)
                part = scatter_part(e, ev)
                if stage == "A":
                    out = part.reshape(bs, p.R, N_LANES)
                elif stage == "B":
                    out = owner_sum(e, part)
                elif stage == "E":
                    out = owner_sum(e, part, roll=False)
                elif stage == "C":
                    out = e.refresh_copies(owner_sum(e, part))
                elif stage == "D":
                    out = part.reshape(bs, p.R, N_LANES)
                    for pp in e.owner_shifts + e.refresh_shifts:
                        out = out + jnp.roll(out, pp, axis=-1) * 1e-9
                return xx * 0.9999 + out * 1e-9

            return jax.lax.fori_loop(0, iters, body, x)

        return chain

    reps = (64, 1064)
    for stage in ["A", "B", "C", "D", "E"]:
        slope_time(f"stage {stage}", mk_chain(stage), (eng32, cc), u0, reps)


if __name__ == "__main__":
    main()
