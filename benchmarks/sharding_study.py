"""Shard-count study on the polycrystal workload: partition quality and
cross-device exactness of the sharded lane engine.

The reference's headline artifact is an MPI strong-scaling table
(doc.tex:439-441, np=1..128). On this machine multi-chip hardware is
virtual (xla_force_host_platform_device_count), so wall-clock scaling
is not meaningful — what IS checkable is everything that determines it:

- partition quality per shard count (edge cut, halo volume, imbalance:
  the numbers METIS prints for the reference, doc.tex:390-410), for
  both RCB and Morton-SFC partitioners;
- static comm volume of the owner/ghost protocol (all_to_all payload
  per exchange);
- bit-level agreement of the sharded Newton-Krylov solve with the
  single-device lane engine (the reference's np-invariance check).

Usage:  python benchmarks/sharding_study.py [n=64] [shards="1,2,4,8"]
(CPU: forces the virtual device mesh; run before importing jax
elsewhere.)
"""

import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
).strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)  # f64: the np-invariance check
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import numpy as np
    import jax.numpy as jnp

    import tpufem  # installs the host allocator
    from tpufem.cases.polycrystal import damage_seed_nodes, generate_polycrystal
    from tpufem.cases.damage import smooth_damage
    from tpufem.config import SolverConfig
    from tpufem.forms import EnergyFunctional, asym_damage_psi
    from tpufem.forms.form import Coefficient, Term
    from tpufem.lane import LaneEngine
    from tpufem.lane.sharded import ShardedLaneEngine
    from tpufem.parallel.partition import (
        partition_quality, rcb_partition, sfc_partition,
    )
    from tpufem.spaces import DirichletBC, FunctionSpace
    from tpufem.spaces.bc import locate_dofs_geometrical

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    shard_counts = (
        [int(s) for s in sys.argv[2].split(",")] if len(sys.argv) > 2
        else [1, 2, 4, 8]
    )

    mesh = generate_polycrystal(n, n_grains=50)
    V = FunctionSpace.create(mesh, 1, bs=2)
    DS = FunctionSpace.create(mesh, 1, bs=1)
    d0 = np.zeros(DS.n_dofs)
    d0[damage_seed_nodes(mesh)] = 1.0
    # cap the band at 0.8: the study checks shard-invariance, not
    # near-singular-tangent robustness (that's the e2e's job — the
    # d=1 band there rides the two-level PC + backtracking)
    d = np.minimum(np.asarray(smooth_damage(mesh, d0, iterations=4)), 0.8)
    t = Term(lambda qp: asym_damage_psi(qp.eps, qp.coeff("d"), 1.0e6, 0.3), 1)
    F = EnergyFunctional(V, [t], [Coefficient("d", DS)])
    left = locate_dofs_geometrical(V, lambda x: np.abs(x[:, 0]) < 1e-12)
    right = locate_dofs_geometrical(V, lambda x: np.abs(x[:, 0] - 1) < 1e-12)
    bcs = [DirichletBC(V, left, [0.0, 0.0]),
           DirichletBC(V, right, [0.01, 0.0])]
    coeffs = {"d": jnp.asarray(d)}
    print(f"mesh: {mesh.n_cells} cells, {V.n_dofs} dofs "
          f"({mesh.cell_tags.max() + 1} grains)")

    # --- partition quality table ------------------------------------------------
    print(f"\n{'S':>3} {'method':>6} {'edge_cut':>9} {'halo':>8} "
          f"{'imbalance':>9}")
    for S in shard_counts:
        if S == 1:
            continue
        for name, part_fn in (("rcb", rcb_partition),
                              ("sfc", sfc_partition)):
            part = part_fn(mesh, S)
            q = partition_quality(mesh, part)
            print(f"{S:>3} {name:>6} {q['edge_cut']:>9} "
                  f"{q['halo_nodes']:>8} {q['imbalance']:>9.3f}")

    # --- exactness across shard counts -------------------------------------------
    cfg = SolverConfig(cg_rtol=1e-8, newton_rtol=1e-6, cg_maxit=4000)
    interp = jax.default_backend() == "cpu"  # Pallas interpret off-TPU
    eng1 = LaneEngine(F, bcs, wg_own=8, interpret=interp)
    cc1 = eng1.prepare_coeffs(coeffs)
    u1, info1 = eng1.make_solver(cfg)(eng1.bc_lane, cc1)
    u1_flat = np.asarray(eng1.from_lane(u1))
    print(f"\nsingle-device: newton={info1['newton_iters']} "
          f"cg={info1['total_cg_iters']} |r|={info1['final_residual']:.3e}")

    for S in shard_counts:
        if S == 1:
            continue
        seng = ShardedLaneEngine(F, bcs, S, wg_own=8, interpret=interp)
        scc = seng.prepare_coeffs(coeffs)
        us, infos = seng.make_solver(cfg)(seng.to_lane(np.zeros(V.n_dofs)),
                                          scc)
        us_flat = np.asarray(seng.from_lane(us))
        dmax = np.abs(us_flat - u1_flat).max()
        umax = np.abs(u1_flat).max()
        print(f"S={S}: newton={infos['newton_iters']} "
              f"cg={infos['total_cg_iters']} "
              f"max|u_S - u_1| = {dmax:.3e} ({dmax/umax:.2e} rel)")
        assert dmax < 1e-8 * umax, "sharded solve diverged from single"
    print("\nSHARDING-STUDY-OK")


if __name__ == "__main__":
    main()
