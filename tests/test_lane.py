"""Lane-partitioned unstructured engine tests (interpret-mode Pallas):
plan invariants, kernel primitives, residual/tangent/diagonal parity
with the flat Assembler, and a full Newton-Krylov solve."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpufem.assemble import Assembler
from tpufem.config import SolverConfig
from tpufem.forms import EnergyFunctional, asym_damage_psi, linear_elastic_psi
from tpufem.forms.form import Coefficient, Term
from tpufem.lane import LaneEngine, build_lane_plan
from tpufem.lane.kernels import lane_gather, lane_scatter
from tpufem.mesh import unit_square
from tpufem.spaces import DirichletBC, FunctionSpace
from tpufem.spaces.bc import locate_dofs_geometrical

E, NU = 1.0e6, 0.3


def _problem(n=24, law="damage"):
    mesh = unit_square(n)
    V = FunctionSpace.create(mesh, 1, bs=2)
    if law == "damage":
        DS = FunctionSpace.create(mesh, 1, bs=1)
        d = np.zeros(DS.n_dofs)
        d[(DS.dof_coords[:, 1] > 0.45) & (DS.dof_coords[:, 1] < 0.55)] = 0.8
        t = Term(lambda qp: asym_damage_psi(qp.eps, qp.coeff("d"), E, NU), 1)
        F = EnergyFunctional(V, [t], [Coefficient("d", DS)])
        coeffs = {"d": jnp.asarray(d)}
    else:
        t = Term(lambda qp: linear_elastic_psi(qp.eps, E, NU), 1)
        F = EnergyFunctional(V, [t])
        coeffs = {}
    left = locate_dofs_geometrical(V, lambda x: np.abs(x[:, 0]) < 1e-12)
    right = locate_dofs_geometrical(V, lambda x: np.abs(x[:, 0] - 1) < 1e-12)
    bcs = [DirichletBC(V, left, [0.0, 0.0]),
           DirichletBC(V, right, [0.01, 0.0])]
    return F, bcs, V, coeffs, Assembler(F, bcs)


def test_plan_invariants():
    mesh = unit_square(40)
    plan = build_lane_plan(mesh.x, mesh.cells, wg_own=8)
    # every node has exactly one home slot
    assert plan.owned_mask.sum() == mesh.n_nodes
    # every cell placed exactly once
    assert (plan.cell_order >= 0).sum() == mesh.n_cells
    placed = np.sort(plan.cell_order[plan.cell_order >= 0])
    assert (placed == np.arange(mesh.n_cells)).all()
    # gather idx within window, valid exactly at placed cells
    gi = plan.gather_idx
    assert gi.max() < plan.wg
    valid = (gi >= 0).all(axis=1)  # (G, kc, 128) all nv present together
    some = (gi >= 0).any(axis=1)
    assert (valid == some).all()
    # alignment for the kernels
    assert plan.wg % 8 == 0 and plan.kc % 8 == 0 and plan.wg_copy % 8 == 0


def test_kernel_primitives_interpret():
    rng = np.random.default_rng(0)
    C, R, T, V, K, wr = 2, 64, 4, 3, 8, 16
    vals = jnp.asarray(rng.normal(size=(C, R, 128)))
    starts = jnp.asarray(np.array([0, 16, 32, 48], np.int32))
    idx = rng.integers(-1, wr, (T, V, K, 128)).astype(np.int32)
    out = np.asarray(lane_gather(vals, starts, jnp.asarray(idx), wr=wr,
                                 interpret=True))
    vnp = np.asarray(vals)
    for t in range(T):
        for v in range(V):
            for k in range(K):
                for j in range(0, 128, 37):
                    i = idx[t, v, k, j]
                    exp = 0.0 if i < 0 else vnp[:, int(starts[t]) + i, j]
                    np.testing.assert_allclose(out[t, :, v, k, j], exp)
    # sum mode == sum over V of the non-summed result
    out_s = np.asarray(lane_gather(vals, starts, jnp.asarray(idx), wr=wr,
                                   sum_v=True, interpret=True))
    np.testing.assert_allclose(out_s, out.sum(axis=2), atol=1e-14)

    # scatter: adjoint-style check vs dense reference
    S, k_out = 24, 16
    src = jnp.asarray(rng.normal(size=(C, 96, 128)))
    sstarts = jnp.asarray(np.array([0, 24, 48, 72], np.int32))
    didx = rng.integers(-1, k_out, (T, S, 128)).astype(np.int32)
    got = np.asarray(lane_scatter(src, sstarts, jnp.asarray(didx), sk=S,
                                  k_out=k_out, interpret=True))
    exp = np.zeros((T, C, k_out, 128))
    snp = np.asarray(src)
    for t in range(T):
        for r in range(S):
            for j in range(128):
                kdst = didx[t, r, j]
                if kdst >= 0:
                    exp[t, :, kdst, j] += snp[:, int(sstarts[t]) + r, j]
    np.testing.assert_allclose(got, exp, atol=1e-13)


def test_residual_tangent_match_assembler():
    F, bcs, V, coeffs, asm = _problem(24)
    eng = LaneEngine(F, bcs, wg_own=8, interpret=True)
    rng = np.random.default_rng(0)
    u_flat = rng.normal(size=V.n_dofs) * 1e-3
    u_lane = jnp.asarray(eng.to_lane(u_flat))
    cc = eng.prepare_coeffs(coeffs)
    r = eng.from_lane(eng.residual(u_lane, cc))
    r_ref = np.asarray(asm.residual(jnp.asarray(u_flat), coeffs))
    assert np.abs(r - r_ref).max() < 1e-12 * np.abs(r_ref).max()
    v_flat = rng.normal(size=V.n_dofs)
    tv = eng.from_lane(
        eng.tangent_action(u_lane, cc, jnp.asarray(eng.to_lane(v_flat)))
    )
    tv_ref = np.asarray(
        asm.tangent_action(jnp.asarray(u_flat), coeffs, jnp.asarray(v_flat))
    )
    assert np.abs(tv - tv_ref).max() < 1e-12 * np.abs(tv_ref).max()
    # copy slots stay consistent with home slots
    p = eng.plan
    rl = np.asarray(eng.residual(u_lane, cc))
    cp = rl[:, p.copy_dst_rows, p.copy_dst_lanes]
    hm = rl[:, p.copy_src_rows, p.copy_src_lanes]
    assert np.abs(cp - hm).max() < 1e-12


def test_store_f32_residual_and_lazy_x_lane():
    """store_dtype=f32: the fast path skips the x_lane upload entirely
    and keeps all float state in f32; residuals match the flat f64
    Assembler to f32 accuracy (the mixed solver's inner contract)."""
    F, bcs, V, coeffs, asm = _problem(16)
    eng = LaneEngine(F, bcs, wg_own=8, interpret=True,
                     store_dtype=np.float32)
    assert eng.x_lane is None  # P1 fast path active -> no upload
    assert eng.geom_dN.dtype == jnp.float32
    assert eng.free_lane.dtype == jnp.float32
    rng = np.random.default_rng(3)
    u_flat = rng.normal(size=V.n_dofs) * 1e-3
    cc = eng.prepare_coeffs(coeffs)
    assert all(v.dtype == jnp.float32 for v in cc.values())
    u_lane = jnp.asarray(eng.to_lane(u_flat)).astype(jnp.float32)
    r = eng.from_lane(eng.residual(u_lane, cc))
    r_ref = np.asarray(asm.residual(jnp.asarray(u_flat), coeffs))
    assert np.abs(r - r_ref).max() < 1e-5 * np.abs(r_ref).max()


def test_generic_path_matches_fast_path():
    """Force the generic element pipeline (multi-term functional) and
    check it against the flat Assembler too."""
    mesh = unit_square(12)
    V = FunctionSpace.create(mesh, 1, bs=2)
    t1 = Term(lambda qp: linear_elastic_psi(qp.eps, E, NU), 1)
    t2 = Term(lambda qp: -1e3 * qp.u[0] * qp.x[1], 2)  # volumetric load
    F = EnergyFunctional(V, [t1, t2])
    left = locate_dofs_geometrical(V, lambda x: np.abs(x[:, 0]) < 1e-12)
    bcs = [DirichletBC(V, left, [0.0, 0.0])]
    asm = Assembler(F, bcs)
    eng = LaneEngine(F, bcs, wg_own=8, interpret=True)
    assert eng._fast_fn is None  # generic path active
    rng = np.random.default_rng(1)
    u_flat = rng.normal(size=V.n_dofs) * 1e-3
    r = eng.from_lane(eng.residual(jnp.asarray(eng.to_lane(u_flat)), {}))
    r_ref = np.asarray(asm.residual(jnp.asarray(u_flat), {}))
    assert np.abs(r - r_ref).max() < 1e-12 * np.abs(r_ref).max()


@pytest.mark.parametrize(
    "kind", ["p2_tri", "q1_quad", "q2_quad", "p1_tet", "p1_tet_d2", "q1_hex"]
)
@pytest.mark.slow
def test_lane_element_coverage(kind):
    """Lane engine beyond P1 simplex: residual + tangent parity with the
    flat Assembler for P2/Q1/Q2/3D cells (the scalarized generic
    element path, element_energy_fn_elementwise)."""
    from tpufem.mesh import box
    from tpufem.mesh.mesh import CellType

    deg, qdeg = 1, 1
    if kind == "p2_tri":
        mesh, deg, qdeg = unit_square(5), 2, 2
    elif kind == "q1_quad":
        mesh, qdeg = unit_square(6, cell_type=CellType.quad), 2
    elif kind == "q2_quad":
        mesh, deg, qdeg = unit_square(4, cell_type=CellType.quad), 2, 3
    elif kind == "p1_tet":
        mesh = box(3, 3, 3, cell_type=CellType.tetra)
    elif kind == "p1_tet_d2":  # quadrature degree 2 -> generic path
        mesh, qdeg = box(3, 3, 3, cell_type=CellType.tetra), 2
    else:
        mesh, qdeg = box(3, 3, 3), 2
    dim = mesh.x.shape[1]
    V = FunctionSpace.create(mesh, deg, bs=dim)
    DS = FunctionSpace.create(mesh, 1, bs=1)
    d = np.cos(3.0 * DS.dof_coords[:, 0]) * DS.dof_coords[:, 1]
    # DIFFERENT quadrature degrees per term: the multi-qp specialization
    # only folds terms sharing one rule, so this keeps the scalarized
    # generic element path under test
    terms = [
        Term(lambda qp: (1.0 + 0.5 * qp.coeff("d"))
             * linear_elastic_psi(qp.eps, E, NU), qdeg),
        Term(lambda qp: -1e3 * qp.u[0] * qp.x[dim - 1], qdeg + 1),
    ]
    F = EnergyFunctional(V, terms, [Coefficient("d", DS)])
    left = locate_dofs_geometrical(V, lambda x: np.abs(x[:, 0]) < 1e-12)
    bcs = [DirichletBC(V, left, [0.0] * dim)]
    asm = Assembler(F, bcs)
    eng = LaneEngine(F, bcs, wg_own=8, interpret=True)
    assert eng._fast_fn is None  # generic elementwise path active
    coeffs = {"d": jnp.asarray(d)}
    cc = eng.prepare_coeffs(coeffs)
    rng = np.random.default_rng(2)
    u_flat = rng.normal(size=V.n_dofs) * 1e-3
    u_lane = jnp.asarray(eng.to_lane(u_flat))
    r = eng.from_lane(eng.residual(u_lane, cc))
    r_ref = np.asarray(asm.residual(jnp.asarray(u_flat), coeffs))
    assert np.abs(r - r_ref).max() < 1e-11 * np.abs(r_ref).max()
    v_flat = rng.normal(size=V.n_dofs)
    tv = eng.from_lane(
        eng.tangent_action(u_lane, cc, jnp.asarray(eng.to_lane(v_flat)))
    )
    tv_ref = np.asarray(
        asm.tangent_action(jnp.asarray(u_flat), coeffs, jnp.asarray(v_flat))
    )
    assert np.abs(tv - tv_ref).max() < 1e-11 * np.abs(tv_ref).max()


def test_lane_solve_matches_flat():
    from tpufem.nls.newton_jit import make_newton_solver

    F, bcs, V, coeffs, asm = _problem(20)
    eng = LaneEngine(F, bcs, wg_own=8, interpret=True)
    cc = eng.prepare_coeffs(coeffs)
    cfg = SolverConfig(cg_rtol=1e-12)
    u_l, stats = eng.make_solver(cfg, cg_chunk=200)(
        jnp.zeros_like(eng.bc_lane), cc
    )
    assert stats["converged"]
    ref = make_newton_solver(asm, cfg)(jnp.zeros(V.n_dofs), coeffs)
    assert np.abs(eng.from_lane(u_l) - np.asarray(ref.u)).max() < 1e-9


def test_fused_kernel_matches_unfused():
    """The fused gather+physics+scatter kernel is the same math as the
    staged pipeline (same select order, same AD physics)."""
    F, bcs, V, coeffs, _ = _problem(n=16, law="damage")
    e_f = LaneEngine(F, bcs, interpret=True, fused=True)
    e_u = LaneEngine(F, bcs, interpret=True, fused=False)
    rng = np.random.default_rng(7)
    u = rng.normal(size=V.n_dofs) * 1e-3
    v = rng.normal(size=V.n_dofs)
    cf = e_f.prepare_coeffs(coeffs)
    cu = e_u.prepare_coeffs(coeffs)
    assert "_cd" in cf and "_cd" not in cu
    rf = np.asarray(e_f.from_lane(e_f.residual(e_f.to_lane(u), cf)))
    ru = np.asarray(e_u.from_lane(e_u.residual(e_u.to_lane(u), cu)))
    np.testing.assert_allclose(rf, ru, rtol=0, atol=1e-12 * np.abs(ru).max())
    tf = np.asarray(e_f.from_lane(
        e_f.tangent_action(e_f.to_lane(u), cf, e_f.to_lane(v))
    ))
    tu = np.asarray(e_u.from_lane(
        e_u.tangent_action(e_u.to_lane(u), cu, e_u.to_lane(v))
    ))
    np.testing.assert_allclose(tf, tu, rtol=0, atol=1e-12 * np.abs(tu).max())


def test_fused_kernel_k_block_matches():
    """Sub-blocking the cells-per-bin axis (k_block grid dim with output
    revisiting) is exact vs the single-block kernel — the configuration
    3D bins need to stay under the vreg/VMEM budget."""
    F, bcs, V, coeffs, _ = _problem(n=24, law="damage")
    e_f = LaneEngine(F, bcs, interpret=True, fused=True)
    assert e_f.plan.kc % 8 == 0 and e_f.plan.kc > 8
    e_b = LaneEngine(F, bcs, interpret=True, fused=True)
    e_b._fused_kb = 8  # force multi-sub-block even on the small mesh
    rng = np.random.default_rng(9)
    u = rng.normal(size=V.n_dofs) * 1e-3
    v = rng.normal(size=V.n_dofs)
    cf = e_f.prepare_coeffs(coeffs)
    cb = e_b.prepare_coeffs(coeffs)
    rf = np.asarray(e_f.from_lane(e_f.residual(e_f.to_lane(u), cf)))
    rb = np.asarray(e_b.from_lane(e_b.residual(e_b.to_lane(u), cb)))
    np.testing.assert_allclose(rb, rf, rtol=0, atol=1e-12 * np.abs(rf).max())
    tf = np.asarray(e_f.from_lane(
        e_f.tangent_action(e_f.to_lane(u), cf, e_f.to_lane(v))
    ))
    tb = np.asarray(e_b.from_lane(
        e_b.tangent_action(e_b.to_lane(u), cb, e_b.to_lane(v))
    ))
    np.testing.assert_allclose(tb, tf, rtol=0, atol=1e-12 * np.abs(tf).max())


def test_fused_kernel_no_coeffs():
    F, bcs, V, coeffs, _ = _problem(n=12, law="elastic")
    e_f = LaneEngine(F, bcs, interpret=True, fused=True)
    e_u = LaneEngine(F, bcs, interpret=True, fused=False)
    rng = np.random.default_rng(8)
    u = rng.normal(size=V.n_dofs) * 1e-3
    rf = np.asarray(e_f.from_lane(e_f.residual(e_f.to_lane(u), {})))
    ru = np.asarray(e_u.from_lane(e_u.residual(e_u.to_lane(u), {})))
    np.testing.assert_allclose(rf, ru, rtol=0, atol=1e-12 * np.abs(ru).max())


def test_mixed_amg_matches_f64_on_graded_mesh():
    """SA-AMG preconditioning inside the mixed-precision lane solver:
    on a strongly graded mesh (where the twolevel lattice coarse space
    degrades) the 'amg' option must land on the all-f64 root with far
    fewer CG iterations than Jacobi."""
    from tpufem.mesh.mesh import CellType, Mesh

    base = unit_square(16)
    x = np.asarray(base.x).copy()
    x[:, 0] = x[:, 0] ** 3  # strong grading toward x = 0
    mesh = Mesh(x=x, cells=base.cells, cell_type=CellType.triangle)
    V = FunctionSpace.create(mesh, 1, bs=2)
    DS = FunctionSpace.create(mesh, 1, bs=1)
    d = np.zeros(DS.n_dofs)
    d[(DS.dof_coords[:, 1] > 0.45) & (DS.dof_coords[:, 1] < 0.55)] = 0.8
    t = Term(lambda qp: asym_damage_psi(qp.eps, qp.coeff("d"), E, NU), 1)
    F = EnergyFunctional(V, [t], [Coefficient("d", DS)])
    left = locate_dofs_geometrical(V, lambda xx: np.abs(xx[:, 0]) < 1e-12)
    right = locate_dofs_geometrical(
        V, lambda xx: np.abs(xx[:, 0] - 1) < 1e-12
    )
    bcs = [DirichletBC(V, left, [0.0, 0.0]),
           DirichletBC(V, right, [0.01, 0.0])]
    coeffs = {"d": jnp.asarray(d)}

    e64 = LaneEngine(F, bcs, wg_own=8, interpret=True)
    gold, gstats = e64.make_solver(
        SolverConfig(cg_rtol=1e-12, newton_rtol=1e-10, cg_maxit=8000,
                     newton_maxit=20, error_on_nonconvergence=False)
    )(jnp.zeros_like(e64.bc_lane), e64.prepare_coeffs(coeffs))
    assert gstats["converged"]
    u_gold = e64.from_lane(gold)

    def run_mixed(pc, rtol):
        emx = LaneEngine(F, bcs, wg_own=8, interpret=True,
                         store_dtype=np.float32)
        solve = emx.make_mixed_solver(
            SolverConfig(cg_rtol=rtol, newton_rtol=1e-10, cg_maxit=8000,
                         newton_maxit=30, preconditioner=pc,
                         error_on_nonconvergence=False)
        )
        return solve(jnp.zeros(V.n_dofs, dtype=jnp.float64), coeffs,
                     emx.prepare_coeffs(coeffs))

    u_amg, s_amg = run_mixed("amg", 1e-6)
    assert s_amg["converged"], s_amg
    rel = np.linalg.norm(np.asarray(u_amg) - u_gold) / np.linalg.norm(
        u_gold
    )
    assert rel < 1e-10, rel
    u_jac, s_jac = run_mixed("jacobi", 1e-6)
    assert s_amg["total_cg_iters"] < 0.4 * s_jac["total_cg_iters"], (
        s_amg["total_cg_iters"], s_jac["total_cg_iters"],
    )


def test_mixed_solver_checkpoint_resume(tmp_path):
    """A remote-worker crash mid-solve must not lose the run: the mixed
    solver persists the f64 iterate after every Newton iteration, and a
    fresh solver resumes from that file onto the same root."""
    F, bcs, V, coeffs, _ = _problem(n=10)
    ckpt = str(tmp_path / "mixed.ckpt.npz")
    cfg = SolverConfig(cg_rtol=1e-8, newton_rtol=1e-10, cg_maxit=4000,
                       newton_maxit=30, error_on_nonconvergence=False)

    def make(maxit):
        emx = LaneEngine(F, bcs, wg_own=8, interpret=True,
                         store_dtype=np.float32)
        import dataclasses
        c = dataclasses.replace(cfg, newton_maxit=maxit)
        return emx.make_mixed_solver(c, checkpoint_path=ckpt), emx

    # uninterrupted gold run (no checkpointing)
    emx0 = LaneEngine(F, bcs, wg_own=8, interpret=True,
                      store_dtype=np.float32)
    u_gold, s_gold = emx0.make_mixed_solver(cfg)(
        jnp.zeros(V.n_dofs, dtype=jnp.float64), coeffs,
        emx0.prepare_coeffs(coeffs))
    assert s_gold["converged"] and s_gold["newton_iters"] >= 2

    # "crash" after 1 Newton iteration, then resume in a fresh solver
    solve1, e1 = make(1)
    solve1(jnp.zeros(V.n_dofs, dtype=jnp.float64), coeffs,
           e1.prepare_coeffs(coeffs))
    import os
    assert os.path.exists(ckpt)
    solve2, e2 = make(30)
    u_res, s_res = solve2(jnp.zeros(V.n_dofs, dtype=jnp.float64), coeffs,
                          e2.prepare_coeffs(coeffs))
    assert s_res["converged"], s_res
    # resumed run skips the already-completed first iteration
    assert s_res["newton_iters"] <= s_gold["newton_iters"]
    rel = np.linalg.norm(np.asarray(u_res) - np.asarray(u_gold)) / (
        np.linalg.norm(np.asarray(u_gold)))
    assert rel < 1e-9, rel


def test_plan_native_matches_numpy(monkeypatch):
    """The native C++ planner stages (balance, copies, rank, gather
    fill) must reproduce the NumPy fallback field-for-field."""
    from tpufem import native
    from tpufem.cases.polycrystal import generate_polycrystal

    if not native.available():
        pytest.skip("native library unavailable")
    for mesh in (unit_square(24), generate_polycrystal(24, n_grains=8)):
        p_nat = build_lane_plan(mesh.x, mesh.cells, wg_own=8)
        with monkeypatch.context() as m:
            for fn in ("lane_balance", "lane_copies", "rank_by_key",
                       "lane_gather_fill"):
                m.setattr(native, fn, lambda *a, **k: None)
            p_np = build_lane_plan(mesh.x, mesh.cells, wg_own=8)
        for f in ("gather_idx", "cell_order", "node_row", "node_lane",
                  "copy_dst_rows", "copy_dst_lanes", "copy_src_rows",
                  "copy_src_lanes", "tail_copy_slot", "owned_mask"):
            a, b = getattr(p_nat, f), getattr(p_np, f)
            assert a.shape == b.shape, f
            assert (np.asarray(a) == np.asarray(b)).all(), f
        assert [s[:2] for s in p_nat.owner_passes] == [
            s[:2] for s in p_np.owner_passes
        ]


def test_jittered_mesh_with_tail_matches_assembler():
    """Jittered-Delaunay mesh: the rare-copy tail path (flat XLA
    gather/scatter for (p,q) combos below pass_min_frac) must agree
    with the flat Assembler."""
    from tpufem.cases.polycrystal import generate_polycrystal

    mesh = generate_polycrystal(32, n_grains=12)
    V = FunctionSpace.create(mesh, 1, bs=2)
    DS = FunctionSpace.create(mesh, 1, bs=1)
    d = np.zeros(DS.n_dofs)
    d[(DS.dof_coords[:, 1] > 0.4) & (DS.dof_coords[:, 1] < 0.6)] = 0.7
    t = Term(lambda qp: asym_damage_psi(qp.eps, qp.coeff("d"), E, NU), 1)
    F = EnergyFunctional(V, [t], [Coefficient("d", DS)])
    left = locate_dofs_geometrical(V, lambda x: np.abs(x[:, 0]) < 1e-12)
    bcs = [DirichletBC(V, left, [0.0, 0.0])]
    # large pass_min_frac forces a sizeable tail on this small mesh
    plan = build_lane_plan(V.dof_coords, np.asarray(V.dofmap),
                           pass_min_frac=0.05)
    eng = LaneEngine(F, bcs, interpret=True, plan=plan)
    assert eng._tail_copy is not None, "plan should produce a tail"
    asm = Assembler(F, bcs)
    rng = np.random.default_rng(5)
    u = rng.normal(size=V.n_dofs) * 1e-3
    v = rng.normal(size=V.n_dofs)
    coeffs = {"d": jnp.asarray(d)}
    cc = eng.prepare_coeffs(coeffs)
    r_lane = np.asarray(eng.from_lane(eng.residual(eng.to_lane(u), cc)))
    r_flat = np.asarray(asm.residual(jnp.asarray(u), coeffs))
    np.testing.assert_allclose(
        r_lane, r_flat, rtol=0, atol=1e-10 * np.abs(r_flat).max()
    )
    t_lane = np.asarray(eng.from_lane(
        eng.tangent_action(eng.to_lane(u), cc, eng.to_lane(v))
    ))
    t_flat = np.asarray(asm.tangent_action(jnp.asarray(u), coeffs, jnp.asarray(v)))
    np.testing.assert_allclose(
        t_lane, t_flat, rtol=0, atol=1e-10 * np.abs(t_flat).max()
    )


@pytest.mark.parametrize(
    "kind", ["p2_tri", "q1_quad", "q2_quad", "p1_tri_d2", "p2_tet",
             "q1_hex"]
)
@pytest.mark.slow
def test_lane_multiqp_fast_path(kind):
    """Multi-qp specialized path (engine._try_specialize_multiqp):
    P2/Q1/Q2 single-term functionals run with host-precomputed per-qp
    geometry (reduced-variable kernels + fused blocks) instead of the
    scalarized generic path. Residual/tangent/diagonal parity with the
    flat Assembler, including the fused kernel in interpret mode."""
    from tpufem.mesh import box
    from tpufem.mesh.mesh import CellType

    deg, qdeg = 1, 2
    if kind == "p2_tri":
        mesh, deg = unit_square(5), 2
    elif kind == "q1_quad":
        mesh = unit_square(6, cell_type=CellType.quad)
    elif kind == "q2_quad":
        mesh, deg, qdeg = unit_square(4, cell_type=CellType.quad), 2, 3
    elif kind == "p1_tri_d2":
        mesh = unit_square(6)
    elif kind == "p2_tet":
        mesh, deg = box(2, 2, 2, cell_type=CellType.tetra), 2
    else:
        mesh = box(3, 3, 3)
    dim = mesh.x.shape[1]
    V = FunctionSpace.create(mesh, deg, bs=dim)
    DS = FunctionSpace.create(mesh, 1, bs=1)
    d = np.cos(3.0 * DS.dof_coords[:, 0]) * DS.dof_coords[:, 1]
    # one term exercising gradient, value, coefficient and position
    t = Term(
        lambda qp: (1.0 + 0.5 * qp.coeff("d"))
        * linear_elastic_psi(qp.eps, E, NU)
        - 1e3 * qp.u[0] * qp.x[dim - 1],
        qdeg,
    )
    F = EnergyFunctional(V, [t], [Coefficient("d", DS)])
    left = locate_dofs_geometrical(V, lambda x: np.abs(x[:, 0]) < 1e-12)
    bcs = [DirichletBC(V, left, [0.0] * dim)]
    asm = Assembler(F, bcs)
    eng = LaneEngine(F, bcs, wg_own=8, interpret=True)
    assert eng._mq is not None and eng._fast_fn is not None
    assert eng._red_res is not None  # reduced-variable kernels active
    coeffs = {"d": jnp.asarray(d)}
    cc = eng.prepare_coeffs(coeffs)
    rng = np.random.default_rng(3)
    u_flat = rng.normal(size=V.n_dofs) * 1e-3
    u_lane = jnp.asarray(eng.to_lane(u_flat))
    r = eng.from_lane(eng.residual(u_lane, cc))
    r_ref = np.asarray(asm.residual(jnp.asarray(u_flat), coeffs))
    assert np.abs(r - r_ref).max() < 1e-11 * np.abs(r_ref).max()
    v_flat = rng.normal(size=V.n_dofs)
    tv = eng.from_lane(
        eng.tangent_action(u_lane, cc, jnp.asarray(eng.to_lane(v_flat)))
    )
    tv_ref = np.asarray(
        asm.tangent_action(jnp.asarray(u_flat), coeffs,
                           jnp.asarray(v_flat))
    )
    assert np.abs(tv - tv_ref).max() < 1e-11 * np.abs(tv_ref).max()
    # diagonal parity on FREE dofs (the flat assembler's diagonal has
    # identity rows at constrained dofs; the lane diagonal is raw).
    # 2D only: the 3D hessian trace compiles ~60 s on the 1-core host
    # and the element math is identical.
    if dim == 2:
        dg = eng.from_lane(eng.diagonal(u_lane, cc))
        dg_ref = np.asarray(asm.diagonal(jnp.asarray(u_flat), coeffs))
        free = np.asarray(eng.from_lane(eng.free_lane)) > 0
        err = np.abs((dg - dg_ref)[free]).max()
        assert err < 1e-11 * np.abs(dg_ref[free]).max()


def test_lane_multiqp_fused(monkeypatch):
    """Fused gather+physics+scatter kernel on the multi-qp path (P2
    triangles): parity with the unfused reduced path and the flat
    Assembler in interpret mode."""
    mesh = unit_square(5)
    V = FunctionSpace.create(mesh, 2, bs=2)
    DS = FunctionSpace.create(mesh, 1, bs=1)
    d = 0.3 + 0.2 * np.sin(4 * DS.dof_coords[:, 0])
    t = Term(
        lambda qp: (1.0 + qp.coeff("d"))
        * linear_elastic_psi(qp.eps, E, NU),
        2,
    )
    F = EnergyFunctional(V, [t], [Coefficient("d", DS)])
    left = locate_dofs_geometrical(V, lambda x: np.abs(x[:, 0]) < 1e-12)
    bcs = [DirichletBC(V, left, [0.0, 0.0])]
    asm = Assembler(F, bcs)
    eng = LaneEngine(F, bcs, wg_own=8, interpret=True, fused=True)
    assert eng._mq is not None and eng._fused and eng.fused_geom is not None
    coeffs = {"d": jnp.asarray(d)}
    cc = eng.prepare_coeffs(coeffs)
    rng = np.random.default_rng(4)
    u_flat = rng.normal(size=V.n_dofs) * 1e-3
    v_flat = rng.normal(size=V.n_dofs)
    u_lane = jnp.asarray(eng.to_lane(u_flat))
    r = eng.from_lane(eng.residual(u_lane, cc))  # fused path (has _cd)
    r_ref = np.asarray(asm.residual(jnp.asarray(u_flat), coeffs))
    assert np.abs(r - r_ref).max() < 1e-11 * np.abs(r_ref).max()
    tv = eng.from_lane(
        eng.tangent_action(u_lane, cc, jnp.asarray(eng.to_lane(v_flat)))
    )
    tv_ref = np.asarray(
        asm.tangent_action(jnp.asarray(u_flat), coeffs,
                           jnp.asarray(v_flat))
    )
    assert np.abs(tv - tv_ref).max() < 1e-11 * np.abs(tv_ref).max()


def test_lane_multiqp_multi_term_fold():
    """Multiple cell terms sharing one quadrature degree fold into a
    single combined integrand on the multi-qp fast path (the common
    stiffness + load shape); parity with the flat Assembler."""
    mesh = unit_square(6)
    V = FunctionSpace.create(mesh, 1, bs=2)
    DS = FunctionSpace.create(mesh, 1, bs=1)
    d = 0.2 + 0.1 * DS.dof_coords[:, 0]
    terms = [
        Term(lambda qp: (1.0 + qp.coeff("d"))
             * linear_elastic_psi(qp.eps, E, NU), 1),
        Term(lambda qp: -1e3 * qp.u[1] * qp.x[0], 1),
    ]
    F = EnergyFunctional(V, terms, [Coefficient("d", DS)])
    left = locate_dofs_geometrical(V, lambda x: np.abs(x[:, 0]) < 1e-12)
    bcs = [DirichletBC(V, left, [0.0, 0.0])]
    asm = Assembler(F, bcs)
    eng = LaneEngine(F, bcs, wg_own=8, interpret=True)
    assert eng._mq is not None and eng._red_res is not None
    coeffs = {"d": jnp.asarray(d)}
    cc = eng.prepare_coeffs(coeffs)
    rng = np.random.default_rng(6)
    u_flat = rng.normal(size=V.n_dofs) * 1e-3
    v_flat = rng.normal(size=V.n_dofs)
    u_lane = jnp.asarray(eng.to_lane(u_flat))
    r = eng.from_lane(eng.residual(u_lane, cc))
    r_ref = np.asarray(asm.residual(jnp.asarray(u_flat), coeffs))
    assert np.abs(r - r_ref).max() < 1e-11 * np.abs(r_ref).max()
    tv = eng.from_lane(
        eng.tangent_action(u_lane, cc, jnp.asarray(eng.to_lane(v_flat)))
    )
    tv_ref = np.asarray(
        asm.tangent_action(jnp.asarray(u_flat), coeffs,
                           jnp.asarray(v_flat))
    )
    assert np.abs(tv - tv_ref).max() < 1e-11 * np.abs(tv_ref).max()


def test_lane_facet_parity():
    """Facet (traction) terms on the lane engine: residual, tangent
    action and Jacobi diagonal must match the flat Assembler exactly —
    the round-2 verdict's "assembles correctly or raises on every path"
    contract, on the assemble side (staged facet gather-sum added to
    the lane cell pipeline)."""
    from tpufem.forms.form import FacetTerm
    from tpufem.mesh.topology import locate_entities_boundary

    mesh = unit_square(6)
    V = FunctionSpace.create(mesh, 1, bs=2)
    t = Term(lambda qp: linear_elastic_psi(qp.eps, E, NU), 1)
    right = locate_entities_boundary(
        mesh, 1, lambda x: np.abs(x[:, 0] - 1) < 1e-12
    )
    ft = FacetTerm(lambda f: -1e3 * f.u[0] + 2.0 * jnp.dot(f.normal, f.u),
                   2, facets=right)
    F = EnergyFunctional(V, [t], facet_terms=[ft])
    left = locate_dofs_geometrical(V, lambda x: np.abs(x[:, 0]) < 1e-12)
    bcs = [DirichletBC(V, left, [0.0, 0.0])]
    asm = Assembler(F, bcs)
    eng = LaneEngine(F, bcs, interpret=True)
    cc = eng.prepare_coeffs({})
    rng = np.random.default_rng(12)
    u_flat = rng.normal(size=V.n_dofs) * 1e-3
    v_flat = rng.normal(size=V.n_dofs)
    u_lane = jnp.asarray(eng.to_lane(u_flat))
    r = eng.from_lane(eng.residual(u_lane, cc))
    r_ref = np.asarray(asm.residual(jnp.asarray(u_flat), {}))
    assert np.abs(r - r_ref).max() < 1e-11 * np.abs(r_ref).max()
    tv = eng.from_lane(
        eng.tangent_action(u_lane, cc, jnp.asarray(eng.to_lane(v_flat)))
    )
    tv_ref = np.asarray(
        asm.tangent_action(jnp.asarray(u_flat), {}, jnp.asarray(v_flat))
    )
    assert np.abs(tv - tv_ref).max() < 1e-10 * np.abs(tv_ref).max()
    # hoisted-gather tangent path (what CG uses): same contract
    u_cells = eng._gather_cells(u_lane)
    tv2 = eng.from_lane(
        eng.tangent_from_cells(u_cells, cc, jnp.asarray(eng.to_lane(v_flat)))
    )
    assert np.abs(tv2 - tv_ref).max() < 1e-10 * np.abs(tv_ref).max()


def test_lane_facet_solve_matches_flat():
    """Facet-loaded Newton solve on the lane engine lands on the flat
    solver's uniaxial-traction solution (tests/test_facets.py analytic
    case, lane path)."""
    from tpufem.forms.form import FacetTerm
    from tpufem.mesh.topology import locate_entities_boundary

    mesh = unit_square(6)
    V = FunctionSpace.create(mesh, 1, bs=2)
    trac = 1000.0
    right = locate_entities_boundary(
        mesh, 1, lambda x: np.abs(x[:, 0] - 1) < 1e-12
    )
    t = Term(lambda qp: linear_elastic_psi(qp.eps, E, NU), 1)
    ft = FacetTerm(lambda f: -trac * f.u[0], 2, facets=right)
    F = EnergyFunctional(V, [t], facet_terms=[ft])
    left_x = locate_dofs_geometrical(V, lambda x: np.abs(x[:, 0]) < 1e-12)
    bot_y = locate_dofs_geometrical(V, lambda x: np.abs(x[:, 1]) < 1e-12)
    bcs = [
        DirichletBC(V, left_x, 0.0, components=[0]),
        DirichletBC(V, bot_y, 0.0, components=[1]),
    ]
    eng = LaneEngine(F, bcs, interpret=True)
    cc = eng.prepare_coeffs({})
    solve = eng.make_solver(SolverConfig(cg_rtol=1e-13, cg_maxit=2000))
    u_lane, stats = solve(jnp.asarray(eng.to_lane(np.zeros(V.n_dofs))), cc)
    uu = eng.from_lane(u_lane).reshape(-1, 2)
    NU_ = NU
    exx = trac * (1 - NU_**2) / E
    eyy = -NU_ * (1 + NU_) * trac / E
    assert np.abs(uu[:, 0] - exx * V.dof_coords[:, 0]).max() < 1e-10
    assert np.abs(uu[:, 1] - eyy * V.dof_coords[:, 1]).max() < 1e-10


def test_lane_neohookean_fallback_parity():
    """Large-deformation neo-Hookean on the lane engine. The potential
    is written against the polymorphic smat helpers (trace/matmul/det/
    add_identity), so the scalarized reduced kernels accept it — large
    deformation runs the fast path, matching the flat Assembler."""
    from tpufem.forms.potentials import neo_hookean_psi

    mesh = unit_square(8)
    V = FunctionSpace.create(mesh, 1, bs=2)
    t = Term(lambda qp: neo_hookean_psi(qp.grad_u, E, NU), 1)
    F = EnergyFunctional(V, [t])
    left = locate_dofs_geometrical(V, lambda x: np.abs(x[:, 0]) < 1e-12)
    bcs = [DirichletBC(V, left, [0.0, 0.0])]
    asm = Assembler(F, bcs)
    eng = LaneEngine(F, bcs, wg_own=8, interpret=True)
    assert eng._fast_fn is not None  # P1 specialization active
    assert eng._red_res is not None  # smat-polymorphic: reduced kernels OK
    rng = np.random.default_rng(7)
    u_flat = rng.normal(size=V.n_dofs) * 1e-2
    v_flat = rng.normal(size=V.n_dofs)
    u_lane = jnp.asarray(eng.to_lane(u_flat))
    r = eng.from_lane(eng.residual(u_lane, {}))
    r_ref = np.asarray(asm.residual(jnp.asarray(u_flat), {}))
    assert np.abs(r - r_ref).max() < 1e-11 * np.abs(r_ref).max()
    tv = eng.from_lane(
        eng.tangent_action(u_lane, {}, jnp.asarray(eng.to_lane(v_flat)))
    )
    tv_ref = np.asarray(
        asm.tangent_action(jnp.asarray(u_flat), {}, jnp.asarray(v_flat))
    )
    assert np.abs(tv - tv_ref).max() < 1e-11 * np.abs(tv_ref).max()


def test_lane_neohookean_fused():
    """Neo-Hookean through the FUSED gather+physics+scatter kernel
    (interpret mode): the smat-polymorphic potential must trace into
    the Mosaic-destined block physics too."""
    from tpufem.forms.potentials import neo_hookean_psi

    mesh = unit_square(6)
    V = FunctionSpace.create(mesh, 1, bs=2)
    t = Term(lambda qp: neo_hookean_psi(qp.grad_u, E, NU), 1)
    F = EnergyFunctional(V, [t])
    left = locate_dofs_geometrical(V, lambda x: np.abs(x[:, 0]) < 1e-12)
    bcs = [DirichletBC(V, left, [0.0, 0.0])]
    asm = Assembler(F, bcs)
    eng = LaneEngine(F, bcs, wg_own=8, interpret=True, fused=True)
    assert eng._fused and eng.fused_geom is not None
    cc = eng.prepare_coeffs({})
    rng = np.random.default_rng(8)
    u_flat = rng.normal(size=V.n_dofs) * 1e-2
    v_flat = rng.normal(size=V.n_dofs)
    u_lane = jnp.asarray(eng.to_lane(u_flat))
    r = eng.from_lane(eng.residual(u_lane, cc))
    r_ref = np.asarray(asm.residual(jnp.asarray(u_flat), {}))
    assert np.abs(r - r_ref).max() < 1e-11 * np.abs(r_ref).max()
    tv = eng.from_lane(
        eng.tangent_action(u_lane, cc, jnp.asarray(eng.to_lane(v_flat)))
    )
    tv_ref = np.asarray(
        asm.tangent_action(jnp.asarray(u_flat), {}, jnp.asarray(v_flat))
    )
    assert np.abs(tv - tv_ref).max() < 1e-11 * np.abs(tv_ref).max()


def test_q2_hex_multiqp_specialization():
    """Q2 hexahedra take the multi-qp SPECIALIZED path (precomputed
    per-qp physical gradients; static basis constants) instead of the
    scalarized generic path — the round-3 verdict item 7 analog of the
    reference's 2.7x H1-generic-vs-specialized gap (doc.tex:1587-1590).
    Round 5: the FUSED kernel now runs too — the per-bin cell-data
    block is k-blocked to a VMEM budget (kb=2 for the ~2300-row Q2-hex
    geometry block) instead of hard-gating on nq*nv (VERDICT r4 item
    7); parity with the flat Assembler on residual, tangent action and
    diagonal exercises the fused path."""
    from tpufem.mesh import box
    from tpufem.mesh.mesh import CellType

    mesh = box(2, 2, 2)
    V = FunctionSpace.create(mesh, 2, bs=3)
    t = Term(lambda qp: linear_elastic_psi(qp.eps, E, NU), 3)
    F = EnergyFunctional(V, [t])
    left = locate_dofs_geometrical(V, lambda x: np.abs(x[:, 0]) < 1e-12)
    bcs = [DirichletBC(V, left, [0.0, 0.0, 0.0])]
    asm = Assembler(F, bcs)
    eng = LaneEngine(F, bcs, wg_own=8, interpret=True, fused=True)
    assert eng._fast_fn is not None and eng._mq is not None
    assert eng._fused  # r5: fused via VMEM-budget k-blocking
    # the budget rule sized the streamed block under 4 MB
    nq = eng._mq["nq"]
    dg_rows = nq * eng.plan.nv * 3 + nq + nq * 3
    assert eng._fused_kb in (2, 4, 8, 16), eng._fused_kb
    assert dg_rows * eng._fused_kb * 128 * 4 <= 4 * 1024 * 1024
    cc = eng.prepare_coeffs({})
    rng = np.random.default_rng(5)
    u_flat = rng.normal(size=V.n_dofs) * 1e-3
    u_lane = jnp.asarray(eng.to_lane(u_flat))
    r = eng.from_lane(eng.residual(u_lane, cc))
    r_ref = np.asarray(asm.residual(jnp.asarray(u_flat), {}))
    assert np.abs(r - r_ref).max() < 1e-10 * np.abs(r_ref).max()
    v_flat = rng.normal(size=V.n_dofs)
    tv = eng.from_lane(
        eng.tangent_action(u_lane, cc, jnp.asarray(eng.to_lane(v_flat)))
    )
    tv_ref = np.asarray(
        asm.tangent_action(jnp.asarray(u_flat), {}, jnp.asarray(v_flat))
    )
    assert np.abs(tv - tv_ref).max() < 1e-10 * np.abs(tv_ref).max()
    # compare free dofs only: the flat diagonal() pins bc rows to 1.0
    # while the lane engine masks bc rows later, in its dinv step
    free = np.asarray(asm.free_mask(jnp.float64))
    dg = eng.from_lane(eng.diagonal(u_lane, cc)) * free
    dg_ref = np.asarray(asm.diagonal(jnp.asarray(u_flat), {})) * free
    assert np.abs(dg - dg_ref).max() < 1e-10 * np.abs(dg_ref).max()


def test_copy_tail_eviction_parity(monkeypatch):
    """_evict_copy_tail (plan.py): on a jittered mesh with an extreme
    copy-count tail the eviction must (a) actually fire — wg drops at
    least one 8-row tier vs TPUFEM_EVICT_TIERS=0 — and (b) preserve
    every plan invariant, pinned by residual/tangent/diagonal parity
    against the flat Assembler on the evicted plan (ADVICE r4: the
    move/refcount bookkeeping had no test coverage)."""
    from tpufem.cases.polycrystal import generate_polycrystal

    mesh = generate_polycrystal(48, n_grains=16)
    V = FunctionSpace.create(mesh, 1, bs=2)
    DS = FunctionSpace.create(mesh, 1, bs=1)
    d = np.zeros(DS.n_dofs)
    d[(DS.dof_coords[:, 1] > 0.4) & (DS.dof_coords[:, 1] < 0.6)] = 0.7
    t = Term(lambda qp: asym_damage_psi(qp.eps, qp.coeff("d"), E, NU), 1)
    F = EnergyFunctional(V, [t], [Coefficient("d", DS)])
    left = locate_dofs_geometrical(V, lambda x: np.abs(x[:, 0]) < 1e-12)
    bcs = [DirichletBC(V, left, [0.0, 0.0])]
    dm = np.asarray(V.dofmap)
    monkeypatch.setenv("TPUFEM_EVICT_TIERS", "0")
    p0 = build_lane_plan(V.dof_coords, dm)
    monkeypatch.setenv("TPUFEM_EVICT_TIERS", "1")
    p1 = build_lane_plan(V.dof_coords, dm)
    assert p1.wg <= p0.wg - 8, (p0.wg, p1.wg)  # the tier was bought
    # every node still homed exactly once, copies reference real owners
    assert p1.owned_mask.sum() == p1.n_nodes
    assert (p1.owned_mask[p1.copy_src_rows, p1.copy_src_lanes]).all()
    assert not (p1.owned_mask[p1.copy_dst_rows, p1.copy_dst_lanes]).any()
    eng = LaneEngine(F, bcs, interpret=True, plan=p1, fused=True)
    asm = Assembler(F, bcs)
    rng = np.random.default_rng(7)
    u = rng.normal(size=V.n_dofs) * 1e-3
    v = rng.normal(size=V.n_dofs)
    coeffs = {"d": jnp.asarray(d)}
    cc = eng.prepare_coeffs(coeffs)
    r_lane = np.asarray(eng.from_lane(eng.residual(eng.to_lane(u), cc)))
    r_flat = np.asarray(asm.residual(jnp.asarray(u), coeffs))
    np.testing.assert_allclose(
        r_lane, r_flat, rtol=0, atol=1e-10 * np.abs(r_flat).max()
    )
    t_lane = np.asarray(eng.from_lane(
        eng.tangent_action(eng.to_lane(u), cc, eng.to_lane(v))
    ))
    t_flat = np.asarray(
        asm.tangent_action(jnp.asarray(u), coeffs, jnp.asarray(v))
    )
    np.testing.assert_allclose(
        t_lane, t_flat, rtol=0, atol=1e-10 * np.abs(t_flat).max()
    )
    # asm.diagonal has BC rows set to 1; eng.diagonal is raw — compare
    # the free dofs (the solver applies d*free + (1-free) itself)
    freem = np.asarray(asm.free_mask(jnp.float64)) > 0.5
    d_lane = np.asarray(eng.from_lane(eng.diagonal(eng.to_lane(u), cc)))
    d_flat = np.asarray(asm.diagonal(jnp.asarray(u), coeffs))
    np.testing.assert_allclose(
        d_lane[freem], d_flat[freem], rtol=0,
        atol=1e-10 * np.abs(d_flat).max(),
    )
