"""Gather-based scatter-reduction plans — the TPU assembly primitive.

XLA lowers scatter-add with unstructured indices to a serialized update
loop on TPU; assembly throughput dies there (SURVEY.md §7.3 item 1).
The fix is to transpose the reduction at plan time: for every target row
(dof or matrix-nnz slot) precompute the fixed list of source entries
that feed it, padded to the max count K. The reduction then becomes a
dense (n_targets, K) *gather* + row-sum — fully vectorized on the VPU,
no atomics, bit-deterministic (fixed summation order, unlike
MatSetValues(ADD_VALUES) whose epoch ordering the reference has to
manage, FEniCSx/mechanic2d/asym_elasto_damage_model.cc:853-859).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from tpufem.config import INDEX_DTYPE


@dataclasses.dataclass
class GatherSumPlan:
    """Precomputed transpose of a scatter-add.

    ``apply(values)`` computes out[i] = Σ_k values[idx[i, k]] for the
    (n_targets, K) index table, where padded slots point one past the
    end of ``values`` (a zero is appended before the gather).
    """

    n_targets: int
    n_sources: int
    # (K, n_targets) int32, pad == n_sources. LAYOUT: targets in the
    # minor dimension — the gather output then tiles the 128 lanes
    # densely; a (n_targets, K) layout would waste (128-K)/128 of every
    # tile and ran ~50x slower on v5e.
    idx: jnp.ndarray

    @staticmethod
    def build(targets: np.ndarray, n_targets: int) -> "GatherSumPlan":
        """``targets[e]`` = target row of source entry e."""
        flat = np.asarray(targets).ravel()
        n_src = flat.shape[0]
        from tpufem import native

        if n_src:
            idx_t = native.gather_plan(flat, n_targets)
            if idx_t is not None:
                return GatherSumPlan(
                    n_targets=n_targets, n_sources=n_src,
                    idx=jnp.asarray(idx_t),
                )
        order = np.argsort(flat, kind="stable")
        sorted_t = flat[order]
        counts = np.bincount(flat, minlength=n_targets)
        K = int(counts.max()) if n_src else 1
        row_start = np.zeros(n_targets + 1, dtype=np.int64)
        np.cumsum(counts, out=row_start[1:])
        idx = np.full((n_targets, max(K, 1)), n_src, dtype=INDEX_DTYPE)
        within = np.arange(n_src, dtype=np.int64) - row_start[sorted_t]
        idx[sorted_t, within] = order.astype(INDEX_DTYPE)
        return GatherSumPlan(
            n_targets=n_targets,
            n_sources=n_src,
            idx=jnp.asarray(np.ascontiguousarray(idx.T)),
        )

    def apply(self, values: jnp.ndarray) -> jnp.ndarray:
        ext = jnp.concatenate(
            [values.ravel(), jnp.zeros(1, dtype=values.dtype)]
        )
        return jnp.sum(ext[self.idx], axis=0)


import jax

jax.tree_util.register_pytree_node(
    GatherSumPlan,
    lambda p: ((p.idx,), (p.n_targets, p.n_sources)),
    lambda aux, leaves: GatherSumPlan(aux[0], aux[1], leaves[0]),
)
