"""IN_COMP harness tests + independent-solver cross-validation.

The reference's strongest QA mechanism is comparing two independent
implementations of the same problem (doc.tex:2215-2257). Here the
independent paths are (a) tpufem's jitted Newton + Jacobi-CG and (b) a
SciPy sparse-direct Newton driven through the assembled matrix —
different linear algebra end to end.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from tpufem.cases.compare import (
    compare_fields,
    dump_displacements,
    load_displacements,
    match_by_coordinates,
)


def test_match_by_coordinates_permuted():
    rng = np.random.default_rng(0)
    a = rng.normal(size=(200, 2))
    perm = rng.permutation(200)
    idx = match_by_coordinates(a, a[perm])
    np.testing.assert_array_equal(perm[idx], np.arange(200))


def test_match_raises_on_missing():
    a = np.array([[0.0, 0.0], [5.0, 5.0]])
    b = np.array([[0.0, 0.0], [1.0, 1.0]])
    with pytest.raises(ValueError):
        match_by_coordinates(a, b)


def test_dump_load_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    coords = rng.normal(size=(50, 2))
    u = rng.normal(size=(50, 2))
    p = str(tmp_path / "disp.bin")
    dump_displacements(p, coords, u)
    c2, u2 = load_displacements(p)
    np.testing.assert_array_equal(c2, coords)
    np.testing.assert_array_equal(u2, u)


def test_cross_solver_validation():
    """tpufem Newton+CG vs SciPy sparse-direct Newton on mechanic2d.

    This is the reference's FEniCSx-vs-MFEM comparison role: same
    physics, disjoint linear-solver stacks, agreement at solver
    tolerance (our gate 1e-9 m; the reference's cross-code gate is
    7.5e-8 m at CG rtol 1e-12, doc.tex:2252-2257)."""
    import scipy.sparse as sp
    import scipy.sparse.linalg as spla

    from tpufem.assemble import Assembler
    from tpufem.cases import mechanic2d
    from tpufem.config import Mechanic2DConfig, SolverConfig

    cfg = Mechanic2DConfig(solver=SolverConfig())
    res = mechanic2d.run(cfg)
    asm_pack = mechanic2d.setup(cfg)
    asm, coeffs, V, mesh, aux = asm_pack

    # independent Newton with SciPy LU on the assembled sparse matrix
    u = np.zeros(V.n_dofs)
    bc_dofs = np.asarray(asm.bc_dofs)
    bc_vals = np.asarray(asm.bc_vals_np)
    u[bc_dofs] = bc_vals
    free = np.ones(V.n_dofs, dtype=bool)
    free[bc_dofs] = False
    for it in range(10):
        r = np.asarray(asm.residual(jnp.asarray(u), coeffs))
        if np.linalg.norm(r[free]) < 1e-8 * max(1.0, np.linalg.norm(r)):
            break
        mat = asm.matrix(jnp.asarray(u), coeffs)
        # EllMatrix is (width, n_rows): row id varies along the minor axis
        rows = np.tile(np.arange(mat.n_rows), mat.cols.shape[0])
        A = sp.csr_matrix(
            (
                np.asarray(mat.vals).ravel(),
                (rows, np.asarray(mat.cols).ravel()),
            ),
            shape=(mat.n_rows, mat.n_rows),
        )
        b = np.where(free, -r, 0.0)
        delta = spla.spsolve(A.tocsc(), b)
        u = u + np.where(free, delta, 0.0)
        if np.abs(delta[free]).max() < 1e-14:
            break

    uu_cg = np.asarray(res.u).reshape(-1, 2)
    uu_lu = u.reshape(-1, 2)
    cmp = compare_fields(V.dof_coords, uu_cg, V.dof_coords, uu_lu)
    assert cmp.l2_per_component.max() < 1e-9, cmp
