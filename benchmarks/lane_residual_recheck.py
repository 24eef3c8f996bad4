"""Head-to-head: eng.residual vs the manually inlined pipeline (they are
the same ops) — chasing a 17.7 vs 3.45 ms discrepancy between probes."""

import sys

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
    from tpufem.mesh import unit_square
    from tpufem.spaces import DirichletBC, FunctionSpace
    from tpufem.spaces.bc import locate_dofs_geometrical

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    E, NU = 1.0e6, 0.3
    mesh = unit_square(n)
    V = FunctionSpace.create(mesh, 1, bs=2)
    DS = FunctionSpace.create(mesh, 1, bs=1)
    d = np.zeros(DS.n_dofs, np.float32)
    d[(DS.dof_coords[:, 1] > 0.45) & (DS.dof_coords[:, 1] < 0.55)] = 0.8
    t = Term(lambda qp: asym_damage_psi(qp.eps, qp.coeff("d"), E, NU), 1)
    F = EnergyFunctional(V, [t], [Coefficient("d", DS)])
    left = locate_dofs_geometrical(V, lambda x: np.abs(x[:, 0]) < 1e-12)
    right = locate_dofs_geometrical(V, lambda x: np.abs(x[:, 0] - 1) < 1e-12)
    bcs = [DirichletBC(V, left, [0.0, 0.0]),
           DirichletBC(V, right, [0.01, 0.0])]
    eng = LaneEngine(F, bcs)

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
    def chain_inline(e, c, x, iters):
        def body(_, xx):
            u_cells = e._gather_cells(xx)
            fn, xarg, xax = e._elem_args(xx.dtype)
            gfun = jax.vmap(jax.grad(fn), in_axes=(-1,) + xax + (-1,),
                            out_axes=-1)
            ev = gfun(u_cells, xarg, c)
            return xx * 0.9999 + e._scatter_cells(ev) * 1e-9

        return jax.lax.fori_loop(0, iters, body, x)

    reps = (64, 1064)
    for _ in range(2):
        slope_time("eng.residual", chain_r, (eng32, cc), u0, reps)
        slope_time("inline      ", chain_inline, (eng32, cc), u0, reps)


if __name__ == "__main__":
    main()
