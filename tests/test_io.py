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
    write_xdmf(str(p), mesh, point_data={"u": u}, heavy="binary")
    text = p.read_text()
    import xml.etree.ElementTree as ET

    ET.fromstring(text)
    # sidecar binary files written, with the 2D->3D vector padding
    topo = np.fromfile(tmp_path / "out_topology.bin", dtype=np.int64)
    assert topo.size == mesh.n_cells * 3
    # point fields are namespaced in storage (point_/cell_ — a field
    # may share a name across centers without colliding)
    ub = np.fromfile(tmp_path / "out_point_u.bin", dtype=np.float64)
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


def test_newton_checkpoint_restart(tmp_path):
    """Interrupt a chunked Newton solve mid-run, resume from the
    checkpoint, and land on the uninterrupted solution (VERDICT round-2
    item 8 / SURVEY §5.4)."""
    import jax.numpy as jnp

    from tpufem.assemble import Assembler
    from tpufem.config import SolverConfig
    from tpufem.forms import EnergyFunctional, asym_damage_psi
    from tpufem.forms.form import Coefficient, Term
    from tpufem.mesh import unit_square
    from tpufem.nls.newton_chunked import make_chunked_solver
    from tpufem.spaces import DirichletBC, FunctionSpace
    from tpufem.spaces.bc import locate_dofs_geometrical

    mesh = unit_square(12)
    V = FunctionSpace.create(mesh, 1, bs=2)
    DS = FunctionSpace.create(mesh, 1, bs=1)
    d = np.zeros(DS.n_dofs)
    d[(DS.dof_coords[:, 1] > 0.4) & (DS.dof_coords[:, 1] < 0.6)] = 0.8
    t = Term(
        lambda qp: asym_damage_psi(qp.eps, qp.coeff("d"), 1.0e6, 0.3), 1
    )
    F = EnergyFunctional(V, [t], [Coefficient("d", DS)])
    left = locate_dofs_geometrical(V, lambda x: np.abs(x[:, 0]) < 1e-12)
    right = locate_dofs_geometrical(V, lambda x: np.abs(x[:, 0] - 1) < 1e-12)
    asm = Assembler(F, [DirichletBC(V, left, [0.0, 0.0]),
                        DirichletBC(V, right, [0.01, 0.0])])
    coeffs = {"d": jnp.asarray(d)}
    u0 = jnp.zeros(V.n_dofs)
    cfg = SolverConfig(cg_rtol=1e-12, error_on_nonconvergence=False)

    ref = make_chunked_solver(asm, cfg)(u0, coeffs)
    assert ref.converged and ref.newton_iters >= 2

    ck = str(tmp_path / "newton.npz")
    # phase 1: stop after 1 Newton iteration (checkpoint written)
    cfg1 = SolverConfig(cg_rtol=1e-12, newton_maxit=1,
                        error_on_nonconvergence=False)
    make_chunked_solver(asm, cfg1, checkpoint_path=ck)(u0, coeffs)
    import os

    assert os.path.exists(ck)
    # phase 2: resume to convergence
    res = make_chunked_solver(asm, cfg, checkpoint_path=ck)(u0, coeffs)
    assert res.converged
    # resumed run continues, not restarts
    assert res.history[0][0] == 2
    np.testing.assert_allclose(
        np.asarray(res.u), np.asarray(ref.u), atol=1e-12
    )


def test_xdmf_hdf5_roundtrip(tmp_path):
    """XDMF with HDF5 heavy data (the reference's XDMFFile pairing,
    FEniCSx/...cc:152-164, 946-981) written and read back WITHOUT h5py —
    the pure-NumPy HDF5 subset in tpufem.io.hdf5."""
    from tpufem.io.xdmf import read_xdmf

    mesh = unit_square(4)
    rng = np.random.default_rng(0)
    u = rng.normal(size=(mesh.x.shape[0], 2))
    e = rng.normal(size=mesh.cells.shape[0])
    p = tmp_path / "out.xdmf"
    write_xdmf(str(p), mesh, point_data={"u": u}, cell_data={"E": e})
    assert (tmp_path / "out.h5").exists()
    assert not list(tmp_path.glob("*.bin"))  # heavy data is HDF5 now
    m2, pd, cd = read_xdmf(str(p))
    np.testing.assert_allclose(m2.x, mesh.x)
    np.testing.assert_array_equal(m2.cells, mesh.cells)
    np.testing.assert_allclose(pd["u"][:, :2], u)
    np.testing.assert_allclose(cd["E"].ravel(), e)


def test_hdf5_pure_numpy_many_dtypes(tmp_path):
    from tpufem.io.hdf5 import read_hdf5, write_hdf5

    rng = np.random.default_rng(1)
    ds = {
        "f64": rng.normal(size=(31, 3)),
        "f32": rng.normal(size=(7,)).astype(np.float32),
        "i64": rng.integers(-5, 99, (50, 4)).astype(np.int64),
        "i32": rng.integers(0, 9, (6,)).astype(np.int32),
        "u8scalar": np.arange(11, dtype=np.uint32),
    }
    f = str(tmp_path / "t.h5")
    write_hdf5(f, ds)
    back = read_hdf5(f)
    assert sorted(back) == sorted(ds)
    for k, v in ds.items():
        assert back[k].dtype == v.dtype and back[k].shape == v.shape
        np.testing.assert_array_equal(back[k], v)
