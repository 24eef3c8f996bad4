"""Distributed layer: mesh partitioning, owner/ghost index maps, halo
exchange over ICI, sharded assembly + solve.

TPU-native equivalent of reference L0/L2 distribution (SURVEY.md §2.4):
METIS/ParMETIS domain decomposition + dolfinx IndexMap owner/ghost
scatters (``scatter_fwd``/``scatter_rev(plus)``,
FEniCSx/mechanic2d/asym_elasto_damage_model.cc:325-397) and PETSc
``VecGhostUpdate`` (:830-831, 864-867). Here: one mesh shard per TPU
device, ``shard_map`` over a 1-D ``jax.sharding.Mesh``, halo exchange as
``jax.lax.all_to_all`` / ``ppermute`` with static padded index plans, and
reductions as ``psum`` — collectives ride ICI, not host memory.
"""

from tpufem.parallel.partition import MeshPartition, partition_mesh
from tpufem.parallel.dist import DistributedProblem

__all__ = ["MeshPartition", "partition_mesh", "DistributedProblem"]
