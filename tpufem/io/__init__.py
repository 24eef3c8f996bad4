"""Field output + checkpointing.

TPU-native equivalent of the reference's output stack: XDMF/HDF5, VTK,
ADIOS2 VTX (FEniCSx/mechanic2d/asym_elasto_damage_model.cc:479-499,
946-1032; MFEM adios2stream/ParaView MFEM/...cc:1593-1656). Writers are
host-side; checkpointing stores the solution pytree (SURVEY.md §5.4
notes the reference has none — ours is an addition).
"""

from tpufem.io.vtk import write_vtu
from tpufem.io.xdmf import write_xdmf
from tpufem.io.checkpoint import save_checkpoint, load_checkpoint

__all__ = ["write_vtu", "write_xdmf", "save_checkpoint", "load_checkpoint"]
