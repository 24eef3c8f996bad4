"""XDMF writer (XML + binary heavy data), ParaView-compatible.

Equivalent of dolfinx's XDMFFile HDF5 output (FEniCSx/mechanic2d/
asym_elasto_damage_model.cc:946-981). h5py is not in the image, so heavy
data goes to raw ``.bin`` sidecar files referenced as Binary items —
the XDMF spec's second heavy-data format, readable by ParaView.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np

from tpufem.mesh.mesh import CellType, Mesh

_XDMF_TOPO = {
    CellType.triangle: "Triangle",
    CellType.quad: "Quadrilateral",
    CellType.tetra: "Tetrahedron",
    CellType.hexahedron: "Hexahedron",
}

# XDMF expects VTK-style hexahedron ordering; ours is tensor (x fastest)
_HEX_TO_VTK = [0, 1, 3, 2, 4, 5, 7, 6]
_QUAD_TO_VTK = [0, 1, 3, 2]


def write_xdmf(
    path: str,
    mesh: Mesh,
    point_data: Optional[Dict[str, np.ndarray]] = None,
    cell_data: Optional[Dict[str, np.ndarray]] = None,
) -> None:
    base = os.path.splitext(path)[0]
    stem = os.path.basename(base)
    cells = np.asarray(mesh.cells, dtype=np.int64)
    if mesh.cell_type == CellType.hexahedron:
        cells = cells[:, _HEX_TO_VTK]
    elif mesh.cell_type == CellType.quad:
        cells = cells[:, _QUAD_TO_VTK]
    pts = np.asarray(mesh.x, dtype=np.float64)
    gdim = pts.shape[1]
    geom_type = "XYZ" if gdim == 3 else "XY"

    def binref(name, arr, dtype, prec):
        fn = f"{stem}_{name}.bin"
        np.ascontiguousarray(arr, dtype=dtype).tofile(
            os.path.join(os.path.dirname(path) or ".", fn)
        )
        dims = " ".join(map(str, arr.shape))
        num = "Float" if "float" in str(dtype) else "Int"
        return (
            f'<DataItem Dimensions="{dims}" NumberType="{num}" '
            f'Precision="{prec}" Format="Binary">{fn}</DataItem>'
        )

    attrs = []
    for name, arr in (point_data or {}).items():
        arr = np.asarray(arr)
        atype = "Vector" if arr.ndim == 2 and arr.shape[1] > 1 else "Scalar"
        if arr.ndim == 2 and arr.shape[1] == 2:  # pad 2D vectors for tools
            arr = np.concatenate([arr, np.zeros((len(arr), 1))], axis=1)
        attrs.append(
            f'<Attribute Name="{name}" AttributeType="{atype}" Center="Node">'
            + binref(name, arr, np.float64, 8)
            + "</Attribute>"
        )
    for name, arr in (cell_data or {}).items():
        arr = np.asarray(arr)
        atype = "Vector" if arr.ndim == 2 and arr.shape[1] > 1 else "Scalar"
        attrs.append(
            f'<Attribute Name="{name}" AttributeType="{atype}" Center="Cell">'
            + binref(name, arr, np.float64, 8)
            + "</Attribute>"
        )

    xml = f"""<?xml version="1.0"?>
<!DOCTYPE Xdmf SYSTEM "Xdmf.dtd" []>
<Xdmf Version="3.0">
<Domain>
<Grid Name="mesh" GridType="Uniform">
<Topology TopologyType="{_XDMF_TOPO[mesh.cell_type]}" NumberOfElements="{len(cells)}">
{binref("topology", cells, np.int64, 8)}
</Topology>
<Geometry GeometryType="{geom_type}">
{binref("geometry", pts, np.float64, 8)}
</Geometry>
{''.join(attrs)}
</Grid>
</Domain>
</Xdmf>
"""
    with open(path, "w") as fh:
        fh.write(xml)
