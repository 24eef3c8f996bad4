# localize the 2e-3 on-chip discrepancy
import sys, jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
sys.path.insert(0, "/root/repo")
from tpufem.structured.grid3d import StructuredGrid3D
from tpufem.structured.pallas3d import make_linear_matvec
from tpufem.forms import linear_elastic_psi
import tpufem.structured.pallas3d as p3d
from jax.experimental import pallas as pl

n = 12
grid = StructuredGrid3D(nx=n, ny=n, nz=n, hx=1/n, hy=1/n, hz=1/n, bs=3,
    energy_density=lambda g, c: linear_elastic_psi(0.5*(g+g.T), 1e6, 0.3), field_kinds={})
mv = make_linear_matvec(grid, 1e6, 0.3, block_z=2)
rng = np.random.default_rng(0)
x = jnp.asarray(rng.normal(size=(3, n+1, n+1, n+1)).astype(np.float32))
y_pal = np.asarray(mv(x))                                   # Mosaic on TPU
y_xla = np.asarray(grid.tangent_action(jnp.zeros_like(x), {}, x))  # XLA on TPU
# CPU ground truth for both
cpu = jax.devices("cpu")[0]
with jax.default_device(cpu):
    xc = jax.device_put(x, cpu)
    y_cpu = np.asarray(grid.tangent_action(jnp.zeros_like(xc), {}, xc))
orig = pl.pallas_call
p3d.pl.pallas_call = lambda *a, **k: orig(*a, **{**k, "interpret": True})
with jax.default_device(cpu):
    mv_i = make_linear_matvec(grid, block_z=2)
    y_int = np.asarray(mv_i(jax.device_put(x, cpu)))
sc = np.abs(y_cpu).max()
print("pal(TPU) vs cpu :", np.abs(y_pal - y_cpu).max()/sc, flush=True)
print("xla(TPU) vs cpu :", np.abs(y_xla - y_cpu).max()/sc, flush=True)
print("pal(int) vs cpu :", np.abs(y_int - y_cpu).max()/sc, flush=True)
err = np.abs(y_pal - y_cpu)
idx = np.unravel_index(err.argmax(), err.shape)
print("max-err at", idx, "of shape", err.shape, flush=True)
# error distribution along z planes
for z in range(n+1):
    e = err[:, z].max()
    if e > 1e-4*sc:
        print(f"  plane z={z}: {e/sc:.2e}", flush=True)
