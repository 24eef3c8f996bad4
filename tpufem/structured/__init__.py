"""Structured-grid fast path: gather-free assembly and SpMV.

On TPU, unstructured FEM is capped by the gather unit (~130M
elements/s measured on v5e via XLA; see benchmarks/gather_bench.py),
while elementwise/shift traffic runs at HBM bandwidth — two orders of
magnitude more. On lattice meshes (the reference's own scale study uses
``create_rectangle``, doc.tex:486; BASELINE configs 3/5 are structured
boxes) every dof-gather is a static shifted slice and every
scatter-accumulation a static slice-add, so the whole residual/tangent
pipeline compiles to fused elementwise code with zero gathers.

The physics kernels are shared with the unstructured path — the same
``jax.grad``/``jax.hessian`` of the same element energy — only the
data movement differs, and results match the unstructured assembler to
f32 roundoff.
"""

from tpufem.structured.grid2d import StructuredGrid2D

__all__ = ["StructuredGrid2D"]
