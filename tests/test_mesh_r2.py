"""Round-2 mesh-layer additions: tetra uniform refinement, the XDMF/bin
reader, and the recursive-bisection partitioner with edge-cut reports."""

import numpy as np

from tpufem.mesh import CellType, Mesh, unit_square
from tpufem.mesh.generate import box
from tpufem.mesh.refine import refine_uniform
from tpufem.mesh.topology import build_entities
from tpufem.parallel.partition import (
    partition_quality,
    rcb_partition,
    sfc_partition,
)


def _tet_volumes(mesh):
    v = mesh.x[mesh.cells]
    a, b, c = v[:, 1] - v[:, 0], v[:, 2] - v[:, 0], v[:, 3] - v[:, 0]
    return np.einsum("ci,ci->c", a, np.cross(b, c)) / 6.0


def test_tetra_refine_counts_and_volume():
    mesh = box(2, 2, 2, cell_type=CellType.tetra)
    fine = refine_uniform(mesh)
    assert fine.n_cells == 8 * mesh.n_cells
    # conforming: every new node is an edge midpoint -> node count
    edges, _ = build_entities(mesh, 1)
    assert fine.n_nodes == mesh.n_nodes + len(edges)
    # volume preserved and no degenerate children
    v0 = _tet_volumes(mesh)
    v1 = _tet_volumes(fine)
    assert abs(np.abs(v1).sum() - np.abs(v0).sum()) < 1e-12
    assert np.abs(v1).min() > 1e-15


def test_tetra_refine_is_conforming():
    """Every interior facet must be shared by exactly 2 children."""
    mesh = refine_uniform(box(1, 1, 1, cell_type=CellType.tetra))
    facets, c2f = build_entities(mesh, 2)
    counts = np.bincount(c2f.ravel(), minlength=len(facets))
    assert set(np.unique(counts)) <= {1, 2}
    # boundary facet area of the unit cube = 6
    bnd = facets[counts == 1]
    p = mesh.x[bnd]
    area = 0.5 * np.linalg.norm(
        np.cross(p[:, 1] - p[:, 0], p[:, 2] - p[:, 0]), axis=1
    ).sum()
    assert abs(area - 6.0) < 1e-12


def test_tetra_refine_tag_transfer():
    mesh = box(2, 2, 2, cell_type=CellType.tetra)
    mesh.cell_tags = (np.arange(mesh.n_cells) % 7).astype(np.int32)
    fine = refine_uniform(mesh)
    assert (fine.cell_tags == np.tile(mesh.cell_tags, 8)).all()


def test_tetra_refine_solution_convergence():
    """P1 tet Poisson-style energy converges under tetra refinement
    (exercises the refined mesh through the full assembly stack)."""
    import jax.numpy as jnp

    from tpufem.assemble import Assembler
    from tpufem.forms import EnergyFunctional
    from tpufem.forms.form import Term
    from tpufem.nls.newton_jit import make_newton_solver
    from tpufem.spaces import DirichletBC, FunctionSpace
    from tpufem.spaces.bc import locate_dofs_geometrical
    from tpufem.config import SolverConfig

    def solve(mesh):
        V = FunctionSpace.create(mesh, 1, bs=1)
        t = Term(
            lambda qp: 0.5 * jnp.sum(qp.grad_u * qp.grad_u)
            - 10.0 * jnp.sum(qp.u),
            1,
        )
        bnd = locate_dofs_geometrical(
            V, lambda x: (np.abs(x[:, 0]) < 1e-12)
            | (np.abs(x[:, 0] - 1) < 1e-12)
        )
        asm = Assembler(
            EnergyFunctional(V, [t]), [DirichletBC(V, bnd, [0.0])]
        )
        res = make_newton_solver(asm, SolverConfig(cg_rtol=1e-12))(
            jnp.zeros(V.n_dofs), {}
        )
        return asm.energy(res.u, {})

    m0 = box(2, 2, 2, cell_type=CellType.tetra)
    m1 = refine_uniform(m0)
    m2 = refine_uniform(m1)
    e = [float(solve(m)) for m in (m0, m1, m2)]
    # monotone decrease toward the continuum minimum, shrinking gaps
    assert e[1] < e[0] and e[2] < e[1]
    assert abs(e[2] - e[1]) < 0.5 * abs(e[1] - e[0])


def test_xdmf_roundtrip(tmp_path):
    from tpufem.io.xdmf import read_xdmf, write_xdmf

    mesh = unit_square(5)
    rng = np.random.default_rng(0)
    pd = {"u": rng.normal(size=(mesh.n_nodes, 2))}
    cd = {"E": rng.normal(size=mesh.n_cells)}
    path = str(tmp_path / "rt.xdmf")
    write_xdmf(path, mesh, point_data=pd, cell_data=cd)
    m2, pd2, cd2 = read_xdmf(path)
    assert m2.cell_type == mesh.cell_type
    np.testing.assert_array_equal(m2.cells, mesh.cells)
    np.testing.assert_allclose(m2.x[:, :2], mesh.x[:, :2])
    # point vectors were padded to 3 components on write
    np.testing.assert_allclose(pd2["u"][:, :2], pd["u"])
    np.testing.assert_allclose(cd2["E"], cd["E"])


def test_xdmf_roundtrip_hex(tmp_path):
    """Hex ordering permutation (tensor<->VTK) must round-trip."""
    from tpufem.io.xdmf import read_xdmf, write_xdmf

    mesh = box(2, 2, 2, cell_type=CellType.hexahedron)
    path = str(tmp_path / "rt3.xdmf")
    write_xdmf(path, mesh)
    m2, _, _ = read_xdmf(path)
    np.testing.assert_array_equal(m2.cells, mesh.cells)


def test_rcb_beats_sfc_edge_cut():
    mesh = unit_square(48)
    q_sfc = partition_quality(mesh, sfc_partition(mesh, 8))
    q_rcb = partition_quality(mesh, rcb_partition(mesh, 8))
    # both balanced
    assert q_sfc["imbalance"] < 1.05 and q_rcb["imbalance"] < 1.05
    assert q_rcb["n_parts"] == 8
    # RCB's compact boxes cut fewer facets than SFC chunks
    assert q_rcb["edge_cut"] <= q_sfc["edge_cut"]
    assert q_rcb["halo_nodes"] <= q_sfc["halo_nodes"]


def test_partition_mesh_rcb_method():
    from tpufem.spaces import FunctionSpace
    from tpufem.parallel.partition import partition_mesh

    V = FunctionSpace.create(unit_square(12), 1, bs=1)
    part = partition_mesh(V, 4, method="rcb")
    # every dof owned exactly once
    owned = part.local_to_global[part.owned_mask]
    assert sorted(owned.tolist()) == list(range(V.n_scalar_dofs))
