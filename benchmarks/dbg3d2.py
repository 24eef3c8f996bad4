import sys, jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
sys.path.insert(0, "/root/repo")
from tpufem.structured.grid3d import StructuredGrid3D
from tpufem.structured.pallas3d import make_linear_matvec
from tpufem.forms import linear_elastic_psi

n = 12
grid = StructuredGrid3D(nx=n, ny=n, nz=n, hx=1/n, hy=1/n, hz=1/n, bs=3,
    energy_density=lambda g, c: linear_elastic_psi(0.5*(g+g.T), 1e6, 0.3), field_kinds={})
mv = make_linear_matvec(grid, block_z=2)
x = np.zeros((3, n+1, n+1, n+1), np.float32)
x[0, 6, 6, 6] = 1.0
xj = jnp.asarray(x)
y_pal = np.asarray(mv(xj))
cpu = jax.devices("cpu")[0]
with jax.default_device(cpu):
    y_cpu = np.asarray(grid.tangent_action(jnp.zeros_like(jax.device_put(xj, cpu)), {}, jax.device_put(xj, cpu)))
err = y_pal - y_cpu
print("one-hot max err:", np.abs(err).max(), "at", np.unravel_index(np.abs(err).argmax(), err.shape), flush=True)
# print nonzero error taps
nz_idx = np.argwhere(np.abs(err) > 1e-2)
print("error taps (c,z,y,x) rel to (6,6,6):", flush=True)
for c, z, y, xx in nz_idx[:40]:
    print(f"  c={c} dz={z-6} dy={y-6} dx={xx-6}: pal={y_pal[c,z,y,xx]:.4f} cpu={y_cpu[c,z,y,xx]:.4f}", flush=True)
print("total mismatched taps:", len(nz_idx), flush=True)
