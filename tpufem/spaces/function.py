"""Function: a field over a FunctionSpace (device array + metadata).

Equivalent of ``dolfinx::fem::Function`` with raw ``mutable_array`` access
(FEniCSx/mechanic2d/asym_elasto_damage_model.cc:317-319, 379) and
``mfem::ParGridFunction``. Values live as a flat jnp array of length
``space.n_dofs`` (byVDIM interleaved for vector spaces).
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp
import numpy as np

from tpufem.config import default_dtype
from tpufem.spaces.space import FunctionSpace


class Function:
    def __init__(self, space: FunctionSpace, name: str = "f", dtype=None):
        self.space = space
        self.name = name
        self.dtype = dtype or default_dtype()
        self.x = jnp.zeros(space.n_dofs, dtype=self.dtype)

    def interpolate(self, fn: Callable[[np.ndarray], np.ndarray]) -> "Function":
        """Set nodal values from a callable on dof coordinates.

        ``fn`` maps (n_points, gdim) → (n_points,) for scalar spaces or
        (n_points, bs) for vector spaces — the analog of
        ``Function::interpolate(lambda)`` (FEniCSx/...cc:563-585) and
        ``ProjectCoefficient`` (MFEM/...cc:1446-1447). Works for Lagrange
        spaces where dofs are point evaluations.
        """
        coords = self.space.dof_coords
        vals = np.asarray(fn(coords))
        if self.space.bs == 1:
            flat = vals.reshape(-1)
        else:
            flat = vals.reshape(self.space.n_scalar_dofs, self.space.bs).reshape(-1)
        self.x = jnp.asarray(flat, dtype=self.dtype)
        return self

    def set(self, value: float) -> "Function":
        self.x = jnp.full(self.space.n_dofs, value, dtype=self.dtype)
        return self

    def values(self) -> np.ndarray:
        """Host copy, shape (n_scalar_dofs, bs) for vector spaces."""
        arr = np.asarray(self.x)
        if self.space.bs > 1:
            return arr.reshape(-1, self.space.bs)
        return arr
