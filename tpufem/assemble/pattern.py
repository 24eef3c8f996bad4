"""Sparsity pattern + TPU-friendly ELL sparse matrix.

Equivalent of PETSc MatAIJ creation via ``fem::petsc::create_matrix``
(FEniCSx/mechanic2d/asym_elasto_damage_model.cc:688) / hypre ParCSR.
The pattern is computed once on host; assembly then reduces the
(nc·ndofe²,) element-entry stream into nnz slots with one sorted
segment-sum — the TPU replacement for MatSetValues(ADD_VALUES) +
MatAssembly epochs (FEniCSx/...cc:852-859).

Storage is ELL (padded fixed-width rows): on TPU the per-row gather
vectorizes as a dense (n_rows, width) lookup, unlike CSR's variable-length
rows which defeat static shapes.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from tpufem.config import INDEX_DTYPE


@dataclasses.dataclass
class SparsityPattern:
    """COO→slot mapping for element-matrix assembly."""

    n_rows: int
    n_cols: int
    nnz: int
    rows: np.ndarray  # (nnz,) int32 row of each stored entry
    cols: np.ndarray  # (nnz,) int32 col of each stored entry
    # assembly plan: element entry k (flattened (cell, i, j)) lands in
    # slot entry_to_slot[k]; perm sorts entries by slot for segment_sum
    perm: np.ndarray  # (n_entries,) int32
    sorted_slots: np.ndarray  # (n_entries,) int32, nondecreasing
    # ELL layout
    ell_width: int
    ell_cols: np.ndarray  # (n_rows, width) int32, padded with row's own idx
    ell_slots: np.ndarray  # (n_rows, width) int32 slot index (padded -> nnz)

    @staticmethod
    def from_dofmap(dofmap: np.ndarray, n_dofs: int) -> "SparsityPattern":
        """Build from a (n_cells, ndofe) vector dofmap (square operator)."""
        nc, nd = dofmap.shape
        rows = np.repeat(dofmap, nd, axis=1).ravel()  # (nc*nd*nd,)
        cols = np.tile(dofmap, (1, nd)).ravel()
        key = rows.astype(np.int64) * n_dofs + cols.astype(np.int64)
        uniq, inverse = np.unique(key, return_inverse=True)
        nnz = len(uniq)
        urows = (uniq // n_dofs).astype(INDEX_DTYPE)
        ucols = (uniq % n_dofs).astype(INDEX_DTYPE)
        perm = np.argsort(inverse, kind="stable").astype(INDEX_DTYPE)
        sorted_slots = inverse[perm].astype(INDEX_DTYPE)

        # ELL: rows are sorted in uniq order already (row-major keys)
        counts = np.bincount(urows, minlength=n_dofs)
        width = int(counts.max()) if nnz else 0
        ell_cols = np.tile(np.arange(n_dofs, dtype=INDEX_DTYPE)[:, None], (1, width))
        ell_slots = np.full((n_dofs, width), nnz, dtype=INDEX_DTYPE)
        # position of each nnz within its row
        row_start = np.zeros(n_dofs + 1, dtype=np.int64)
        np.cumsum(counts, out=row_start[1:])
        within = np.arange(nnz, dtype=np.int64) - row_start[urows]
        ell_cols[urows, within] = ucols
        ell_slots[urows, within] = np.arange(nnz, dtype=INDEX_DTYPE)

        return SparsityPattern(
            n_rows=n_dofs,
            n_cols=n_dofs,
            nnz=nnz,
            rows=urows,
            cols=ucols,
            perm=perm,
            sorted_slots=sorted_slots,
            ell_width=width,
            ell_cols=ell_cols,
            ell_slots=ell_slots,
        )


@dataclasses.dataclass
class EllMatrix:
    """Assembled sparse operator in ELL form (device arrays).

    LAYOUT: (width, n_rows) — rows in the minor dimension so the x[cols]
    gather and the multiply tile the vector lanes densely (see
    tpufem.assemble.scatter for the measurement behind this choice).
    """

    n_rows: int
    cols: jnp.ndarray  # (width, n_rows) int32
    vals: jnp.ndarray  # (width, n_rows)

    def matvec(self, x: jnp.ndarray) -> jnp.ndarray:
        """y = A @ x as a dense gather + reduction (TPU-friendly)."""
        return jnp.sum(self.vals * x[self.cols], axis=0)

    def diagonal(self) -> jnp.ndarray:
        row_ids = jnp.arange(self.n_rows, dtype=self.cols.dtype)[None, :]
        on_diag = self.cols == row_ids
        return jnp.sum(jnp.where(on_diag, self.vals, 0.0), axis=0)

    def to_dense(self) -> jnp.ndarray:
        n = self.n_rows
        out = jnp.zeros((n, n), dtype=self.vals.dtype)
        rows = jnp.tile(jnp.arange(n, dtype=self.cols.dtype), self.cols.shape[0])
        return out.at[rows, self.cols.ravel()].add(self.vals.ravel())


jax.tree_util.register_pytree_node(
    EllMatrix,
    lambda m: ((m.cols, m.vals), m.n_rows),
    lambda n_rows, leaves: EllMatrix(n_rows, *leaves),
)
