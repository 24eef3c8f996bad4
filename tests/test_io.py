"""IO tests: VTU/XDMF writers and checkpoint roundtrip."""

import os

import numpy as np

from tpufem.io import load_checkpoint, save_checkpoint, write_vtu, write_xdmf
from tpufem.mesh import box, unit_square


def test_write_vtu(tmp_path):
    mesh = unit_square(3)
    u = np.random.default_rng(0).normal(size=(mesh.n_nodes, 2))
    c = np.arange(mesh.n_cells, dtype=float)
    p = tmp_path / "out.vtu"
    write_vtu(str(p), mesh, point_data={"u": u}, cell_data={"E": c})
    text = p.read_text()
    assert "UnstructuredGrid" in text
    assert f'NumberOfPoints="{mesh.n_nodes}"' in text
    assert 'Name="u"' in text and 'Name="E"' in text
    # XML well-formed
    import xml.etree.ElementTree as ET

    ET.fromstring(text)


def test_write_vtu_hex(tmp_path):
    mesh = box(2, 2, 2)
    p = tmp_path / "box.vtu"
    write_vtu(str(p), mesh, point_data={"z": mesh.x[:, 2]})
    import xml.etree.ElementTree as ET

    ET.fromstring(p.read_text())


def test_write_xdmf(tmp_path):
    mesh = unit_square(3)
    u = np.random.default_rng(1).normal(size=(mesh.n_nodes, 2))
    p = tmp_path / "out.xdmf"
    write_xdmf(str(p), mesh, point_data={"u": u})
    text = p.read_text()
    import xml.etree.ElementTree as ET

    ET.fromstring(text)
    # sidecar binary files written, with the 2D->3D vector padding
    topo = np.fromfile(tmp_path / "out_topology.bin", dtype=np.int64)
    assert topo.size == mesh.n_cells * 3
    ub = np.fromfile(tmp_path / "out_u.bin", dtype=np.float64)
    assert ub.size == mesh.n_nodes * 3


def test_checkpoint_roundtrip(tmp_path):
    state = {
        "u": np.random.default_rng(2).normal(size=100),
        "iteration": np.int64(7),
    }
    p = str(tmp_path / "ck.npz")
    save_checkpoint(p, state)
    back = load_checkpoint(p)
    np.testing.assert_array_equal(back["u"], state["u"])
    assert int(back["iteration"]) == 7
