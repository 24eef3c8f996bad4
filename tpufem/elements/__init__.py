"""Reference elements: tabulated bases, quadrature, geometry maps.

TPU-native equivalent of basix tabulation (elements declared at
``FEniCSx/mechanic2d/asym_ufl.py:11-13``) and MFEM's
``LinearFECollection`` (``MFEM/mechanic2d/asym_elasto_damage_model.cc:
1104-1105``). Shape functions and their reference gradients are baked in
as small NumPy constants; they enter jitted kernels as closed-over
literals (the analog of ffcx hard-coding them into generated C).
"""

from tpufem.elements.quadrature import quadrature
from tpufem.elements.lagrange import Element, element

__all__ = ["quadrature", "Element", "element"]
