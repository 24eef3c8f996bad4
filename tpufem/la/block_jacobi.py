"""Block-Jacobi (non-overlapping additive Schwarz) preconditioner.

A stronger BoomerAMG stand-in than point Jacobi (SURVEY.md §7.3 item 4):
dofs are grouped into contiguous blocks of size B (after RCM/SFC node
ordering the blocks are geometric patches), the B×B diagonal blocks are
extracted from the assembled ELL matrix with ONE static gather, inverted
batched on the MXU, and applied per CG iteration as a batched matvec —
reshape + einsum, no gathers in the hot loop.

Condition number drops from O((L/h)²) to O((L/H)²) with H the patch
diameter — typically 3–6x fewer CG iterations than point Jacobi at
B=128–512 for 2D elasticity.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from tpufem.assemble.pattern import EllMatrix, SparsityPattern
from tpufem.config import INDEX_DTYPE


@dataclasses.dataclass
class BlockJacobiPlan:
    """Static plan: ELL-flat position of each in-block matrix entry."""

    n: int  # true number of dofs
    B: int  # block size
    nb: int  # number of blocks (ceil(n/B))
    # (nb, B, B) int32 into the ELL value array flattened as (w*n,);
    # missing entries point to w*n (a zero is appended before gathering)
    ell_pos: jnp.ndarray

    @staticmethod
    def build(pattern: SparsityPattern, B: int = 128) -> "BlockJacobiPlan":
        n = pattern.n_rows
        nb = -(-n // B)
        rows = pattern.rows.astype(np.int64)
        cols = pattern.cols.astype(np.int64)
        in_block = rows // B == cols // B
        r = rows[in_block]
        c = cols[in_block]
        # position of each nnz in the (w, n) ELL layout: nnz k sits at
        # (within-row index, row) — recompute within-row index
        counts = np.bincount(rows, minlength=n)
        row_start = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(counts, out=row_start[1:])
        within = np.arange(pattern.nnz, dtype=np.int64) - row_start[rows]
        flat = within * n + rows  # ELL flat index of nnz k
        flat_in = flat[in_block]

        w = pattern.ell_width
        pos = np.full((nb, B, B), w * n, dtype=INDEX_DTYPE)
        pos[r // B, r % B, c % B] = flat_in
        return BlockJacobiPlan(n=n, B=B, nb=nb, ell_pos=jnp.asarray(pos))

    def extract(self, mat: EllMatrix) -> jnp.ndarray:
        """(nb, B, B) dense diagonal blocks from the assembled matrix.
        Padding rows (beyond n) become identity so inversion is safe."""
        ext = jnp.concatenate(
            [mat.vals.ravel(), jnp.zeros(1, dtype=mat.vals.dtype)]
        )
        blocks = ext[self.ell_pos]
        # unit diagonal on padding dofs (rows >= n)
        tail = self.nb * self.B - self.n
        if tail > 0:
            eye = jnp.eye(self.B, dtype=blocks.dtype)
            gid = (
                jnp.arange(self.nb)[:, None] * self.B
                + jnp.arange(self.B)[None, :]
            )
            pad_diag = (gid >= self.n).astype(blocks.dtype)  # (nb, B)
            blocks = blocks + eye[None, :, :] * pad_diag[:, :, None] * 0.0
            blocks = blocks + jnp.einsum(
                "bi,ij->bij", pad_diag, eye
            )
        return blocks

    def preconditioner(self, mat: EllMatrix):
        """Factorize once, return M(r) ≈ A⁻¹r (batched dense solve)."""
        blocks = self.extract(mat)
        inv = jnp.linalg.inv(blocks)  # batched (nb, B, B)
        n, B, nb = self.n, self.B, self.nb
        pad = nb * B - n

        def M(r):
            rp = jnp.pad(r, (0, pad)) if pad else r
            rb = rp.reshape(nb, B)
            yb = jnp.einsum(
                "bij,bj->bi", inv, rb,
                precision=jax.lax.Precision.HIGHEST,
            )
            y = yb.reshape(-1)
            return y[:n] if pad else y

        return M


from tpufem.utils.pytree import register_pytree_with_leaves

register_pytree_with_leaves(BlockJacobiPlan, ["ell_pos"])
