"""Physics as energy densities; AD-derived residuals and tangents.

This layer replaces the reference's entire L4/L5 stack (SURVEY.md §1):
UFL forms compiled by ffcx (``asym_ufl.py`` + Makefile codegen), SymPy
symbolic differentiation (``asym_symb.py``/``asym_symb_sym.py``), the
hand-derived spectral tangent (``asym_manual.py``,
``MFEM/...cc:639-916``), and MFEM's nested dual-number AD
(``autodiff/admfem.hpp:648-699``). All four collapse to one mechanism:
write ψ(ε, coeffs) in JAX, get σ = ∂ψ/∂ε via ``jax.grad`` and the
consistent tangent via ``jax.hessian`` — traced once, fused by XLA.
"""

from tpufem.forms.potentials import (
    linear_elastic_psi,
    asym_damage_psi,
    asym_damage_stress_manual,
    neo_hookean_psi,
    lame_parameters,
)
from tpufem.forms.form import EnergyFunctional, Coefficient

__all__ = [
    "linear_elastic_psi",
    "asym_damage_psi",
    "asym_damage_stress_manual",
    "neo_hookean_psi",
    "lame_parameters",
    "EnergyFunctional",
    "Coefficient",
]
