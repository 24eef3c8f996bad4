"""f64-gold CPU solve of the flagship polycrystal for the 1e-10 gate.

BASELINE.md: "match displacement and energy norms to 1e-10 on
mechanic2d" (doc.tex:2215-2257). The mixed-precision TPU e2e is
validated against an INDEPENDENT all-f64 solve of the same problem:
flat Assembler + SA-AMG-preconditioned Newton-Krylov on the CPU — a
different assembly path, different preconditioner, different hardware.

Usage:
  python benchmarks/gold_f64_cpu.py gold [n=1024]   # CPU f64 -> npz
  python benchmarks/gold_f64_cpu.py mixed [n=1024]  # TPU mixed -> npz
  python benchmarks/gold_f64_cpu.py compare [n=1024]

Artifacts: /tmp/poly_gold_<n>.npz, /tmp/poly_mixed_<n>.npz
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def _problem(n):
    import jax.numpy as jnp

    from tpufem.cases import mechanic2d
    from tpufem.cases.damage import smooth_damage
    from tpufem.cases.polycrystal import (
        damage_seed_nodes, generate_polycrystal,
    )
    from tpufem.forms import EnergyFunctional, asym_damage_psi
    from tpufem.forms.form import Coefficient, Term
    from tpufem.spaces import DirichletBC, FunctionSpace
    from tpufem.spaces.bc import locate_dofs_geometrical

    mesh = generate_polycrystal(n, n_grains=200)
    V = FunctionSpace.create(mesh, 1, bs=2)
    DS = FunctionSpace.create(mesh, 1, bs=1)
    P0 = FunctionSpace.create(mesh, 0, bs=1)
    E_range = mechanic2d.young_modulus_range()
    E_cell = E_range[np.asarray(mesh.cell_tags, dtype=np.int64) % 200]
    d0 = np.zeros(DS.n_dofs)
    d0[damage_seed_nodes(mesh, n_chains=30)] = 1.0
    d = np.asarray(smooth_damage(mesh, d0, iterations=8))
    NU = 0.3
    stiff = Term(
        lambda qp: asym_damage_psi(qp.eps, qp.coeff("d"),
                                   qp.coeff("E"), NU), 1,
    )
    F = EnergyFunctional(
        V, [stiff], [Coefficient("d", DS), Coefficient("E", P0)]
    )
    left = locate_dofs_geometrical(V, lambda x: np.abs(x[:, 0]) < 1e-12)
    right = locate_dofs_geometrical(
        V, lambda x: np.abs(x[:, 0] - 1) < 1e-12
    )
    bcs = [DirichletBC(V, left, [0.0, 0.0]),
           DirichletBC(V, right, [0.01, 0.0])]
    coeffs = {"d": jnp.asarray(d), "E": jnp.asarray(E_cell)}
    # volumetric load as a constant residual vector (USE_VOLUME parity;
    # exact — the term is linear in u; cases/polycrystal.py r5)
    from tpufem.assemble import Assembler

    fvals = mechanic2d.volumetric_load(V.dof_coords)
    load = Term(
        lambda qp: -jnp.dot(qp.coeff("f"), qp.u), 2,
    )
    F_load = EnergyFunctional(V, [load], [Coefficient("f", V)])
    r_load = np.asarray(Assembler(F_load, []).residual(
        jnp.zeros(V.n_dofs, dtype=jnp.float64),
        {"f": jnp.asarray(fvals.reshape(-1), dtype=jnp.float64)},
        batch=262144,
    ))
    return mesh, V, F, bcs, coeffs, d, E_cell, r_load


def gold(n):
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from tpufem.assemble import Assembler
    from tpufem.config import SolverConfig
    from tpufem.la import amg

    t0 = time.perf_counter()
    mesh, V, F, bcs, coeffs, d, E_cell, r_load = _problem(n)
    print(f"setup {time.perf_counter()-t0:.0f}s, "
          f"{V.n_dofs/1e6:.2f}M dofs", flush=True)
    asm = Assembler(F, bcs)
    rl = jnp.asarray(r_load)
    from tpufem.nls import NewtonSolver

    cfg = SolverConfig(
        newton_rtol=1e-12, newton_atol=1e-30, cg_rtol=1e-13,
        cg_maxit=4000, newton_maxit=20, verbose=True,
    )
    solver = NewtonSolver(cfg)
    batch = 262144
    rhs_j = jax.jit(lambda a, w, c: a.lifted_rhs(
        w, c, r=a.residual(w, c, batch=262144) + rl))
    act_j = jax.jit(lambda a, w, c, v: a.constrained_action(w, c)(v))

    fm = np.asarray(asm.free_mask(jnp.float64))

    def precond(w):
        t1 = time.perf_counter()
        mat = asm.matrix(w, coeffs, batch=batch)
        hier = amg.build_hierarchy(
            amg.ell_to_scipy(mat), V.dof_coords, 2, free_mask=fm
        )
        print(f"  amg setup {time.perf_counter()-t1:.0f}s", flush=True)
        return amg.amg_preconditioner(hier)

    t0 = time.perf_counter()
    res = solver.solve(
        jnp.zeros(V.n_dofs, dtype=jnp.float64),
        rhs=lambda w: rhs_j(asm, w, coeffs),
        operator=lambda w: (lambda v: act_j(asm, w, coeffs, v)),
        precond=precond,
    )
    u = np.asarray(res.u)
    energy = float(asm.energy(res.u, coeffs, batch=batch)
                   + jnp.vdot(rl, res.u))
    print(f"gold: newton={res.iterations} cg={res.krylov_iters} "
          f"|r|={res.residual_norms[-1]:.3e} energy={energy:.10e} "
          f"solve {time.perf_counter()-t0:.0f}s", flush=True)
    np.savez(f"/tmp/poly_gold_{n}.npz", u=u, energy=energy,
             res_norms=np.asarray(res.residual_norms))


def gold_lu(n):
    """f64 gold via sparse-LU DIRECT Newton on the CPU: exact inner
    solves (machine precision), so the gold's own error is pure Newton
    truncation at rtol 1e-13 — no Krylov/pc uncertainty. (The AMG-CG
    gold stalls at rtol 1e-13 on this problem: the damage band's
    near-zero-stiffness strips defeat it.)"""
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    import scipy.sparse as sp
    import scipy.sparse.linalg as spla

    from tpufem.assemble import Assembler
    from tpufem.la.amg import ell_to_scipy

    t0 = time.perf_counter()
    mesh, V, F, bcs, coeffs, d, E_cell, r_load = _problem(n)
    print(f"setup {time.perf_counter()-t0:.0f}s, "
          f"{V.n_dofs/1e6:.2f}M dofs", flush=True)
    asm = Assembler(F, bcs)
    rl = jnp.asarray(r_load)
    batch = 262144
    free = np.asarray(asm.free_mask(jnp.float64))
    import os

    if os.environ.get("GOLD_INIT") == "mixed":
        # Newton POLISH of the mixed TPU solution: with exact LU steps
        # from the candidate, |u_mixed - u_polished| directly measures
        # the mixed solve's distance to the true root (the from-zero
        # gold's early trajectory matches bitwise — see STATUS — but
        # converges only ~6x/Newton through the piecewise law's branch
        # flips, too slow for machine precision within the round)
        u = np.load(f"/tmp/poly_mixed_{n}.npz")["u"].astype(np.float64)
        # from-zero r0 of THIS problem (load included) for the rel
        # stopping scale — computed, not hardcoded (the r4 constant
        # 2.790740e7 was the unloaded problem's)
        u0 = np.asarray(asm.set_bc(jnp.zeros(V.n_dofs)))
        b00 = np.asarray(asm.lifted_rhs(
            jnp.asarray(u0), coeffs,
            r=asm.residual(jnp.asarray(u0), coeffs, batch=batch) + rl))
        r0 = float(np.linalg.norm(b00 * free))
    else:
        u = np.zeros(V.n_dofs)
        # start from the BC-satisfying iterate
        u = np.asarray(asm.set_bc(jnp.asarray(u)))
        r0 = None
    for it in range(1, 21):
        t1 = time.perf_counter()
        uj = jnp.asarray(u)
        b = np.asarray(asm.lifted_rhs(
            uj, coeffs, r=asm.residual(uj, coeffs, batch=batch) + rl))
        rn = float(np.linalg.norm(b * free))
        if r0 is None:
            r0 = rn
        print(f"gold-lu Newton {it}: |b| = {rn:.6e} rel "
              f"{rn/r0:.3e} ({time.perf_counter()-t1:.0f}s rhs)",
              flush=True)
        # save EVERY iterate (the factorizations are minutes each; a
        # timeout must not lose the run) — rel 1e-11 suffices: the
        # mixed solve under validation floors at rel ~3e-11 itself
        np.savez(f"/tmp/poly_gold_{n}.npz", u=u, energy=0.0,
                 res_norms=np.asarray([rn / r0]))
        # in mixed-polish mode ALWAYS take at least one exact LU step:
        # the whole point is measuring the candidate's distance to the
        # true root, and a candidate already below the rel exit would
        # otherwise be 'validated' against itself (r5: the deeper-driven
        # TPU solve hit rel 5.7e-12 on entry)
        if rn < max(1e-11 * r0, 1e-30) and not (
                os.environ.get("GOLD_INIT") == "mixed" and it == 1):
            break
        t1 = time.perf_counter()
        A = ell_to_scipy(asm.matrix(jnp.asarray(u), coeffs, batch=batch))
        A = sp.csc_matrix(A)
        # MMD_AT_PLUS_A: symmetric-structure ordering — far less
        # fill-in than COLAMD on FEM matrices (measured 790 -> much
        # less per factor); near-SPD, so relax partial pivoting
        lu = spla.splu(A, permc_spec="MMD_AT_PLUS_A",
                       options=dict(SymmetricMode=True,
                                    DiagPivotThresh=0.001))
        du = lu.solve(b)
        print(f"  factor+solve {time.perf_counter()-t1:.0f}s "
              f"nnz={A.nnz}", flush=True)
        u = u + du
    energy = float(asm.energy(jnp.asarray(u), coeffs, batch=batch)
                   + jnp.vdot(rl, jnp.asarray(u)))
    print(f"gold-lu: newton={it} rel={rn/r0:.3e} "
          f"energy={energy:.10e}", flush=True)
    np.savez(f"/tmp/poly_gold_{n}.npz", u=u, energy=energy,
             res_norms=np.asarray([rn / r0]))


def mixed(n):
    import jax

    jax.config.update("jax_enable_x64", True)

    from tpufem.cases import polycrystal
    from tpufem.config import SolverConfig

    res = polycrystal.run(
        n,
        solver=SolverConfig(
            cg_rtol=1e-10, newton_rtol=1e-11, newton_atol=1e-30,
            cg_maxit=30000, newton_maxit=20,
            preconditioner="twolevel",
            error_on_nonconvergence=False, verbose=True,
        ),
        mixed=True,
        postprocess_fields=False,
    )
    print(f"mixed: stats={res.stats} energy={res.energy:.10e}",
          flush=True)
    np.savez(f"/tmp/poly_mixed_{n}.npz", u=np.asarray(res.u_flat),
             energy=float(res.energy))


def compare(n):
    g = np.load(f"/tmp/poly_gold_{n}.npz")
    m = np.load(f"/tmp/poly_mixed_{n}.npz")
    du = np.abs(m["u"] - g["u"])
    scale = np.abs(g["u"]).max()
    rel_inf = du.max() / scale
    rel_l2 = np.linalg.norm(m["u"] - g["u"]) / np.linalg.norm(g["u"])
    # energies recomputed from BOTH displacement vectors by the same
    # f64 CPU assembler, so the energy gate reflects the solutions,
    # not two different energy pipelines
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from tpufem.assemble import Assembler

    _mesh, _V, F, bcs, coeffs, _d, _E, r_load = _problem(n)
    asm = Assembler(F, bcs)
    rl = jnp.asarray(r_load)
    e_g = float(asm.energy(jnp.asarray(g["u"]), coeffs, batch=262144)
                + jnp.vdot(rl, jnp.asarray(g["u"])))
    e_m = float(asm.energy(jnp.asarray(m["u"]), coeffs, batch=262144)
                + jnp.vdot(rl, jnp.asarray(m["u"])))
    e_rel = abs(e_m - e_g) / abs(e_g)
    print(f"|du|_inf rel = {rel_inf:.3e}")
    print(f"|du|_2   rel = {rel_l2:.3e}")
    print(f"energy   rel = {e_rel:.3e}")
    print("GATE (1e-10):", "PASS" if max(rel_l2, e_rel) < 1e-10
          else "FAIL")


if __name__ == "__main__":
    mode = sys.argv[1]
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    dict(gold=gold, gold_lu=gold_lu, mixed=mixed, compare=compare)[mode](n)
