"""Lattice-coarse two-level preconditioner tests (lane.twolevel):
transfer adjointness in the owned inner product, partition of unity,
and the CG iteration cut vs Jacobi (the unstructured BoomerAMG role,
FEniCSx/...cc:720-813)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpufem.cases.polycrystal import generate_polycrystal
from tpufem.forms import EnergyFunctional, asym_damage_psi
from tpufem.forms.form import Coefficient, Term
from tpufem.lane import LaneEngine
from tpufem.lane import twolevel as tl
from tpufem.spaces import DirichletBC, FunctionSpace
from tpufem.spaces.bc import locate_dofs_geometrical

E, NU = 1.0e6, 0.3


@pytest.fixture(scope="module")
def setup():
    mesh = generate_polycrystal(32, n_grains=10)
    V = FunctionSpace.create(mesh, 1, bs=2)
    DS = FunctionSpace.create(mesh, 1, bs=1)
    d = np.zeros(DS.n_dofs)
    d[np.abs(DS.dof_coords[:, 1] - 0.5) < 0.05] = 0.6
    t = Term(lambda qp: asym_damage_psi(qp.eps, qp.coeff("d"), E, NU), 1)
    F = EnergyFunctional(V, [t], [Coefficient("d", DS)])
    left = locate_dofs_geometrical(V, lambda x: np.abs(x[:, 0]) < 1e-12)
    right = locate_dofs_geometrical(V, lambda x: np.abs(x[:, 0] - 1) < 1e-12)
    bcs = [DirichletBC(V, left, [0.0, 0.0]),
           DirichletBC(V, right, [0.01, 0.0])]
    eng = LaneEngine(F, bcs, wg_own=8, interpret=True)
    cc = eng.prepare_coeffs({"d": jnp.asarray(d)})
    st, data = tl.build_twolevel(eng, eng.bc_lane, cc, {"d": d}, nc=16)
    return eng, cc, st, data, V


def test_teleported_copies_covered(setup):
    """The n=32/wg_own=8 polycrystal forces planner teleports (cells
    homed in bins holding none of their nodes); pin that this fixture
    really exercises them and that the two-level transfer builder's
    owner-refresh path (o_dst/o_src) gives every excluded copy slot
    its owner's prolonged value."""
    from tpufem.lane.plan import N_LANES

    eng, cc, st, data, V = setup
    p = eng.plan
    cells = np.asarray(V.mesh.cells)
    node_key = p.node_row // p.wg * N_LANES + p.node_lane
    cv = np.asarray(p.cell_valid)
    m = np.asarray(p.cell_order)[cv]
    slot = np.nonzero(cv)[0]
    ck = slot // (p.kc * N_LANES) * N_LANES + slot % N_LANES
    tele = (node_key[cells[m]] != ck[:, None]).all(axis=1)
    assert tele.sum() > 0, "fixture no longer exercises teleports"
    assert int(data.o_dst.size) > 0, "no excluded transfer slots"
    rng = np.random.default_rng(3)
    c = jnp.asarray(rng.normal(size=(2, st.ncy + 1, st.ncx + 1)))
    Pc = np.asarray(tl.prolong(eng, st, data, c)).reshape(2, -1)
    o_dst = np.asarray(data.o_dst)
    o_src = np.asarray(data.o_src)
    assert np.abs(Pc[:, o_dst] - Pc[:, o_src]).max() == 0.0


def test_transfer_adjoint_and_pou(setup):
    eng, cc, st, data, V = setup
    rng = np.random.default_rng(0)
    c = jnp.asarray(rng.normal(size=(2, st.ncy + 1, st.ncx + 1)))
    v = jnp.asarray(rng.normal(size=eng.bc_lane.shape))
    lhs = float(eng.dot(tl.prolong(eng, st, data, c), v))
    rhs = float(jnp.vdot(c, tl.restrict(eng, st, data, v)))
    assert abs(lhs - rhs) < 1e-12 * abs(lhs)
    # P reproduces constants at every owned slot
    P1 = np.asarray(
        tl.prolong(eng, st, data, jnp.ones((2, st.ncy + 1, st.ncx + 1)))
    )
    ow = np.asarray(eng.plan.owned_mask)
    assert np.abs(P1[0][ow] - 1).max() < 1e-12


@pytest.mark.slow
def test_twolevel_cuts_cg_iterations(setup):
    eng, cc, st, data, V = setup
    free = eng.free_lane
    u_cells = eng._gather_cells(eng.bc_lane)

    def A(w):
        av = eng.tangent_from_cells(u_cells, cc, w * free)
        return av * free + w * (1.0 - free)

    rng = np.random.default_rng(1)
    b = A(jnp.asarray(eng.to_lane(rng.normal(size=V.n_dofs))) * free)

    def cg(Mfn, maxit):
        x = jnp.zeros_like(b)
        r = b
        z = Mfn(r)
        p_ = z
        rz = eng.dot(r, z)
        bn = float(jnp.sqrt(eng.dot(b, b)))
        for k in range(maxit):
            Ap = A(p_)
            al = rz / eng.dot(p_, Ap)
            x = x + al * p_
            r = r - al * Ap
            if float(jnp.sqrt(eng.dot(r, r))) < 1e-8 * bn:
                return k + 1, x, True
            z = Mfn(r)
            rz2 = eng.dot(r, z)
            p_ = z + (rz2 / rz) * p_
            rz = rz2
        return maxit, x, False

    kt, xt, conv = cg(
        lambda r: tl.precondition(eng, st, data, u_cells, cc, free, r),
        maxit=30,
    )
    assert conv, "two-level CG must converge to 1e-8 within 30 iterations"
    # Jacobi takes far longer (don't run to convergence; just confirm it
    # has NOT converged in the same budget)
    kj, xj, convj = cg(lambda r: data.inv_d * r, maxit=30)
    assert not convj
