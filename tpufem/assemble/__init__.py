"""Assembly: batched element kernels → global residual / sparse matrix.

TPU-native equivalent of reference L3 assembly:
``fem::assemble_vector`` / ``assemble_matrix`` / ``apply_lifting`` /
``set_bc`` / ``set_diagonal`` (FEniCSx/mechanic2d/
asym_elasto_damage_model.cc:825-859) and MFEM's ParNonlinearForm
element loops (MFEM/...cc:559-916). The per-cell kernel runs vmapped over
all cells at once; insertion is a single deterministic sorted
segment-sum (replacing PETSc's MatSetValues + MatAssembly epochs).
"""

from tpufem.assemble.assembler import Assembler
from tpufem.assemble.pattern import SparsityPattern, EllMatrix

__all__ = ["Assembler", "SparsityPattern", "EllMatrix"]
