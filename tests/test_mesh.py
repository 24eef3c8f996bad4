"""Mesh layer tests: gmsh reading, generators, topology, refinement.

Replicates the reference's tiny-mesh debug modes (USE_SQUARE /
DEBUG_SQUARE, SURVEY.md §4.1) as pytest fixtures on square.msh.
"""

import numpy as np
import pytest

import tpufem.config as tconfig
from tpufem.mesh import (
    CellType,
    boundary_facets,
    box,
    build_entities,
    cell_edges,
    locate_entities_boundary,
    read_gmsh,
    rectangle,
    refine_uniform,
    unit_square,
    vertex_to_entity,
)


@pytest.fixture(scope="module")
def square():
    return read_gmsh(tconfig.data_path("square.msh"))


def test_read_square_msh(square):
    # known from the file: 62 nodes, 98 triangles (134 elements total with
    # 5 points + 31 boundary lines)
    assert square.n_nodes == 62
    assert square.cell_type == CellType.triangle
    assert square.n_cells == 98
    assert square.gdim == 2
    assert square.cell_tags is not None
    # facet tags present (edges with physical tags 1..6)
    assert 1 in square.entity_tags
    assert set(np.unique(square.entity_tags[1].values)) <= set(range(1, 7))
    # coordinates inside the unit square
    assert square.x.min() >= -1e-12 and square.x.max() <= 1 + 1e-12


def test_triangle_area_consistency(square):
    x = square.x[square.cells]
    v1 = x[:, 1] - x[:, 0]
    v2 = x[:, 2] - x[:, 0]
    area = 0.5 * np.abs(v1[:, 0] * v2[:, 1] - v1[:, 1] * v2[:, 0])
    assert np.isclose(area.sum(), 1.0, atol=1e-12)  # unit square


def test_generators():
    m = unit_square(4)
    assert m.n_cells == 32
    assert np.isclose(_total_area(m), 1.0)
    q = rectangle(3, 5, cell_type=CellType.quad, x1=(2.0, 1.0))
    assert q.n_cells == 15
    b = box(2, 2, 2)
    assert b.n_cells == 8
    t = box(2, 3, 4, cell_type=CellType.tetra)
    assert t.n_cells == 2 * 3 * 4 * 6


def _total_area(mesh):
    x = mesh.x[mesh.cells]
    if mesh.cell_type == CellType.triangle:
        v1 = x[:, 1] - x[:, 0]
        v2 = x[:, 2] - x[:, 0]
        return float(np.abs(0.5 * (v1[:, 0] * v2[:, 1] - v1[:, 1] * v2[:, 0])).sum())
    raise NotImplementedError


def test_edges_euler_formula(square):
    # V - E + F = 1 for a planar triangulated disk (unit square)
    edges, c2e = cell_edges(square)
    V, E, F = square.n_nodes, edges.shape[0], square.n_cells
    assert V - E + F == 1
    # every cell has 3 distinct edges; each interior edge shared by 2 cells
    assert c2e.shape == (F, 3)
    counts = np.bincount(c2e.ravel(), minlength=E)
    assert set(counts) <= {1, 2}


def test_vertex_to_entity_roundtrip(square):
    edges, _ = cell_edges(square)
    indptr, eids = vertex_to_entity(square.n_nodes, edges)
    # each vertex's incident edges actually contain it
    for v in [0, 10, 30, 61]:
        for e in eids[indptr[v] : indptr[v + 1]]:
            assert v in edges[e]
    # total incidences = 2 * n_edges
    assert indptr[-1] == 2 * edges.shape[0]


def test_boundary_facets(square):
    bf = boundary_facets(square)
    facets, _ = build_entities(square, 1)
    bx = square.x[facets[bf]]
    # all boundary edges lie on the unit square boundary
    on = (
        (np.abs(bx[..., 0]) < 1e-9) | (np.abs(bx[..., 0] - 1) < 1e-9)
        | (np.abs(bx[..., 1]) < 1e-9) | (np.abs(bx[..., 1] - 1) < 1e-9)
    )
    # each boundary edge has both vertices on the same side — at minimum on
    # the boundary
    assert on.any(axis=1).all()


def test_locate_entities_boundary(square):
    left_v = locate_entities_boundary(square, 0, lambda x: np.abs(x[:, 0]) < 1e-9)
    assert len(left_v) == 7  # x0 NSet in square.msh has 7 nodes
    left_e = locate_entities_boundary(square, 1, lambda x: np.abs(x[:, 0]) < 1e-9)
    assert len(left_e) == 6


def test_refine_uniform_triangle(square):
    r = refine_uniform(square)
    assert r.n_cells == 4 * square.n_cells
    assert np.isclose(_total_area(r), 1.0, atol=1e-12)
    # cell tags preserved per child
    assert len(r.cell_tags) == r.n_cells
    assert set(np.unique(r.cell_tags)) == set(np.unique(square.cell_tags))
    # edge tags doubled
    assert len(r.entity_tags[1].values) == 2 * len(square.entity_tags[1].values)
    # conformity: Euler formula still holds
    edges, _ = cell_edges(r)
    assert r.n_nodes - edges.shape[0] + r.n_cells == 1


def test_refine_quad_and_hex():
    q = rectangle(2, 2, cell_type=CellType.quad)
    rq = refine_uniform(q)
    assert rq.n_cells == 16
    h = box(2, 2, 2)
    rh = refine_uniform(h)
    assert rh.n_cells == 64
    assert rh.n_nodes == 5**3  # structured 2x2x2 -> 4x4x4 grid
