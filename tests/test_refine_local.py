"""Local (plaza-style) refinement: conformity, quality, tags, solvability.

Covers the local-refinement half of the reference's mesh-refinement
contract (dolfinx refinement::plaza::refine with a marked subset,
FEniCSx/mechanic2d/asym_elasto_damage_model.cc:166-186).
"""

import numpy as np
import pytest

from tpufem.mesh import CellType, box, build_entities, unit_square
from tpufem.mesh.mesh import Mesh, MeshTags
from tpufem.mesh.refine import refine_marked


def _volumes(mesh):
    v = mesh.x[mesh.cells]
    if mesh.cell_type == CellType.triangle:
        return 0.5 * (
            (v[:, 1, 0] - v[:, 0, 0]) * (v[:, 2, 1] - v[:, 0, 1])
            - (v[:, 2, 0] - v[:, 0, 0]) * (v[:, 1, 1] - v[:, 0, 1])
        )
    e1, e2, e3 = (v[:, k] - v[:, 0] for k in (1, 2, 3))
    return np.einsum("cd,cd->c", np.cross(e1, e2), e3) / 6.0


def _check_conforming(mesh):
    """Every facet is shared by exactly 1 (boundary) or 2 cells, and no
    node lies strictly inside another cell's facet (no hanging nodes —
    guaranteed when facet counts are right on a valid triangulation of
    the same total volume)."""
    facets, c2f = build_entities(mesh, mesh.dim - 1)
    counts = np.bincount(c2f.ravel(), minlength=len(facets))
    assert counts.min() >= 1 and counts.max() <= 2, (
        counts.min(), counts.max(),
    )
    # a conforming simplex mesh covering the original domain has the
    # same total |volume| and no degenerate cell (the base box() tet
    # generator emits mixed orientations; the assembler uses |det|)
    vols = np.abs(_volumes(mesh))
    assert vols.min() > 0


def _quality(mesh):
    """Min radius-ratio-style shape measure: vol / longest_edge^dim."""
    v = mesh.x[mesh.cells]
    nv = v.shape[1]
    lmax = max(
        np.linalg.norm(v[:, i] - v[:, j], axis=1).max(axis=0).max()
        for i in range(nv) for j in range(i)
    )
    per_cell_lmax = np.zeros(mesh.n_cells)
    for i in range(nv):
        for j in range(i):
            per_cell_lmax = np.maximum(
                per_cell_lmax, np.linalg.norm(v[:, i] - v[:, j], axis=1)
            )
    return (np.abs(_volumes(mesh)) / per_cell_lmax ** mesh.dim).min()


@pytest.mark.parametrize("dim", [2, 3])
def test_refine_marked_conforming_and_volume(dim):
    mesh = (unit_square(8) if dim == 2
            else box(4, 4, 4, cell_type=CellType.tetra))
    rng = np.random.default_rng(0)
    marked = rng.random(mesh.n_cells) < 0.3
    fine = refine_marked(mesh, marked)
    assert fine.n_cells > mesh.n_cells
    _check_conforming(fine)
    np.testing.assert_allclose(
        np.abs(_volumes(fine)).sum(), np.abs(_volumes(mesh)).sum(),
        rtol=1e-13,
    )
    # marked cells are fully split: one uniform level's worth of children
    n_child_min = 4 if dim == 2 else 8
    assert fine.n_cells >= marked.sum() * n_child_min


@pytest.mark.parametrize("dim", [2, 3])
def test_refine_marked_quality_bounded(dim):
    """Repeated refinement toward a corner must not degenerate cells
    (the longest-edge closure is what guarantees this)."""
    mesh = (unit_square(4) if dim == 2
            else box(2, 2, 2, cell_type=CellType.tetra))
    q0 = _quality(mesh)
    for _ in range(5 if dim == 2 else 3):
        cent = mesh.x[mesh.cells].mean(axis=1)
        marked = np.linalg.norm(cent[:, :dim], axis=1) < 0.3
        mesh = refine_marked(mesh, marked)
        _check_conforming(mesh)
    assert _quality(mesh) > 0.05 * q0, (_quality(mesh), q0)


def test_refine_marked_index_input_and_noop():
    mesh = unit_square(4)
    same = refine_marked(mesh, np.zeros(mesh.n_cells, dtype=bool))
    assert same is mesh
    fine = refine_marked(mesh, np.array([0, 5]))
    assert fine.n_cells > mesh.n_cells
    _check_conforming(fine)


def test_refine_marked_tag_transfer():
    mesh = unit_square(4)
    tags = np.arange(mesh.n_cells, dtype=np.int32) % 7 + 1
    mesh = Mesh(x=mesh.x, cells=mesh.cells, cell_type=mesh.cell_type,
                cell_tags=tags)
    # tag the bottom edges (y=0)
    edges, _ = build_entities(mesh, 1)
    on_bot = np.flatnonzero(
        (np.abs(mesh.x[edges][:, :, 1]) < 1e-12).all(axis=1)
    )
    mesh.entity_tags[1] = MeshTags(
        dim=1, entities=np.sort(edges[on_bot], axis=1),
        values=np.full(len(on_bot), 11, np.int32),
    )
    marked = np.zeros(mesh.n_cells, dtype=bool)
    marked[:8] = True
    fine = refine_marked(mesh, marked)
    # cell tags: per-tag area is preserved
    for t in range(1, 8):
        a0 = np.abs(_volumes(mesh))[tags == t].sum()
        a1 = np.abs(_volumes(fine))[np.asarray(fine.cell_tags) == t].sum()
        np.testing.assert_allclose(a0, a1, rtol=1e-13)
    # edge tags: children still tile y=0 exactly
    te = fine.entity_tags[1]
    assert (te.values == 11).all()
    seg = fine.x[te.entities]
    assert (np.abs(seg[:, :, 1]) < 1e-12).all()
    lens = np.abs(seg[:, 1, 0] - seg[:, 0, 0])
    np.testing.assert_allclose(lens.sum(), 1.0, rtol=1e-13)


@pytest.mark.parametrize("dim", [2, 3])
def test_patch_test_on_locally_refined_mesh(dim):
    """Affine displacement reproduced exactly on a locally refined mesh —
    the assembler sees a valid conforming mesh."""
    import jax.numpy as jnp

    from tpufem.assemble.assembler import Assembler
    from tpufem.config import SolverConfig
    from tpufem.forms import EnergyFunctional, linear_elastic_psi
    from tpufem.forms.form import Term
    from tpufem.la.precond import jacobi_preconditioner
    from tpufem.nls.newton import NewtonSolver
    from tpufem.spaces import DirichletBC, FunctionSpace
    from tpufem.spaces.bc import locate_dofs_geometrical

    mesh = (unit_square(4) if dim == 2
            else box(2, 2, 2, cell_type=CellType.tetra))
    rng = np.random.default_rng(1)
    for _ in range(2):
        mesh = refine_marked(mesh, rng.random(mesh.n_cells) < 0.4)
    V = FunctionSpace.create(mesh, 1, bs=dim)
    A = (np.array([[2e-3, 1e-3], [-5e-4, 3e-3]]) if dim == 2 else
         np.array([[2e-3, 1e-3, 0.0], [-5e-4, 3e-3, 2e-4],
                   [1e-4, -2e-4, 1e-3]]))
    g = V.dof_coords @ A.T
    bnodes = locate_dofs_geometrical(
        V,
        lambda x: (np.abs(x[:, :dim]) < 1e-12).any(axis=1)
        | (np.abs(x[:, :dim] - 1) < 1e-12).any(axis=1),
    )
    t = Term(integrand=lambda qp: linear_elastic_psi(qp.eps, 1e6, 0.3),
             degree=1)
    asm = Assembler(EnergyFunctional(V, [t]),
                    [DirichletBC(V, bnodes, g[bnodes])])
    res = NewtonSolver(SolverConfig(cg_rtol=1e-13)).solve(
        jnp.zeros(V.n_dofs),
        rhs=lambda w: asm.lifted_rhs(w, {}),
        operator=lambda w: asm.constrained_action(w, {}),
        precond=lambda w: jacobi_preconditioner(asm.diagonal(w, {})),
    )
    uu = np.asarray(res.u).reshape(-1, dim)
    assert np.abs(uu - g).max() < 1e-9
