"""Lane-partitioned unstructured FEM engine (the TPU-native ffcx).

Round-1 measured the XLA gather ceiling at ~0.19 Gelem/s — two orders
below the >=1 GDoF/s unstructured assembly target. This package is the
redesign: the 128 vector lanes are treated as 128 micro-partitions of
the mesh (the same owner/ghost construction as the device-level
partition, one level down), so every irregular access becomes a
*windowed per-lane* select — measured at 27-94 Gelem/s in Pallas
(benchmarks/gather_kernel_probe4.py).

Replaces, TPU-natively, the role of the ffcx-generated element kernels +
dolfinx scatter machinery for unstructured meshes
(FEniCSx/mechanic2d/Makefile:13-15; doc.tex:2322-2325).
"""

from tpufem.lane.plan import LanePlan, build_lane_plan
from tpufem.lane.engine import LaneEngine
from tpufem.lane.sharded import ShardedLaneEngine

__all__ = [
    "LanePlan", "build_lane_plan", "LaneEngine", "ShardedLaneEngine",
]
