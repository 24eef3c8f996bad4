"""Sharded structured grid: row-block domain decomposition over a
device mesh with recompute-at-seams halo exchange.

BASELINE config 5's structure on lattice meshes: the node lattice is
split into contiguous row blocks, one per device. Each evaluation
fetches ONE neighbor row from each side (two ``jax.lax.ppermute`` steps
over ICI) and recomputes its seam cell rows locally, so the residual
needs no reverse (ghost→owner) scatter at all — unlike the unstructured
halo (tpufem.parallel.dist). Global reductions are ``psum``. Combined
with the gather-free stencil assembly this is the scaling path for the
100M-DoF-class targets.

Padding rows (to make the row count divisible by the shard count) and
the ring wrap-around are neutralized by a cell-validity mask threaded
through the energy density: a cell contributes only if all three of its
vertices lie on true lattice rows.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh as DeviceMesh
from jax.sharding import NamedSharding, PartitionSpec as P
from jax import shard_map

from tpufem.config import SolverConfig
from tpufem.structured.grid2d import StructuredGrid2D

AXIS = "shard"


class DistGridResult(NamedTuple):
    u: np.ndarray  # (2, NYP, W) global solution
    newton_iters: int
    total_cg_iters: int
    final_residual: float
    r0: float
    converged: bool


class DistStructuredGrid2D:
    """Row-sharded StructuredGrid2D. Vertex coefficient fields only
    (mechanic2d's damage is one); the solve API mirrors
    tpufem.structured.solve.make_grid_solver but arrays are global and
    sharding is internal."""

    def __init__(self, grid: StructuredGrid2D, n_shards: int, devices=None):
        if any(k != "vertex" for k in grid.field_kinds.values()):
            raise NotImplementedError("vertex fields only on the sharded path")
        self.grid = grid
        self.S = n_shards
        self.NYP = grid.ny + 1
        self.R = -(-self.NYP // n_shards)  # rows per shard
        self.NYP_pad = self.R * n_shards
        self.W = grid.nx + 1
        devs = list(devices) if devices is not None else jax.devices()[:n_shards]
        self.device_mesh = DeviceMesh(np.array(devs), (AXIS,))

        # sub-grid running the per-shard stencil on the (R+2)-row slab:
        # R+1 cell rows; the user energy is wrapped with the cell-validity
        # mask (all three vertices on true rows ⇒ centroid mean == 1)
        user_density = grid.energy_density
        kinds = dict(grid.field_kinds)
        kinds["_valid"] = "vertex"

        def masked_density(g, c):
            mask = jnp.where(c["_valid"] >= 0.999, 1.0, 0.0)
            return mask * user_density(g, c)

        self.sub = StructuredGrid2D(
            nx=grid.nx, ny=self.R + 1, hx=grid.hx, hy=grid.hy, bs=grid.bs,
            energy_density=masked_density, field_kinds=kinds,
        )
        self._names = sorted(grid.field_kinds)

    # -- host-side global <-> padded ------------------------------------------

    def _pad(self, arr, axis):
        pad = self.NYP_pad - self.NYP
        if pad == 0:
            return jnp.asarray(arr)
        widths = [(0, 0)] * np.ndim(arr)
        widths[axis] = (0, pad)
        return jnp.pad(jnp.asarray(arr), widths)

    # -- solver -----------------------------------------------------------------

    def make_solver(self, cfg: Optional[SolverConfig] = None, *,
                    cg_chunk: int = 200):
        cfg = cfg or SolverConfig()
        S, R, W = self.S, self.R, self.W
        sub = self.sub
        names = self._names
        mesh = self.device_mesh

        def extend(x):
            """Append one halo row from each ring neighbor: (..., R, W) →
            (..., R+2, W)."""
            perm_up = [(s, (s + 1) % S) for s in range(S)]
            perm_dn = [(s, (s - 1) % S) for s in range(S)]
            above = jax.lax.ppermute(x[..., -1:, :], AXIS, perm_up)
            below = jax.lax.ppermute(x[..., 0:1, :], AXIS, perm_dn)
            return jnp.concatenate([above, x, below], axis=-2)

        def local_residual(u_loc, f_loc, v_loc):
            idx = jax.lax.axis_index(AXIS)
            u_ext = extend(u_loc)
            v_ext = extend(v_loc)
            # ring wrap-around halos are never valid
            top_ok = (idx != 0).astype(v_ext.dtype)
            bot_ok = (idx != S - 1).astype(v_ext.dtype)
            v_ext = jnp.concatenate(
                [v_ext[0:1] * top_ok, v_ext[1 : R + 1], v_ext[R + 1 :] * bot_ok],
                axis=0,
            )
            fields = {n: extend(f_loc[n]) for n in names}
            fields["_valid"] = v_ext
            r_ext = sub.residual(u_ext, fields)
            return r_ext[:, 1 : R + 1, :]

        def body(u, free, bcv, valid, load_r, *field_leaves):
            valid = valid[0] if valid.ndim == 3 else valid
            # all operands are the per-shard blocks: u (1 shard slice of
            # (2, NYP_pad, W) on axis 1) etc.
            f_loc = dict(zip(names, field_leaves))

            def pdot(a, b):
                return jax.lax.psum(jnp.vdot(a, b), AXIS)

            def rhs(uu):
                r = local_residual(uu, f_loc, valid) - load_r
                return -r * free

            def A(uu):
                def op(v):
                    av = jax.jvp(
                        lambda w: local_residual(w, f_loc, valid), (uu,),
                        (v * free,),
                    )[1]
                    return av * free + v * (1.0 - free)

                return op

            u0 = jnp.where(free > 0, u, bcv)

            def newton_cond(st):
                uu, b, bn, r0, it, cgt = st
                keep = bn >= jnp.maximum(cfg.newton_rtol * r0, cfg.newton_atol)
                return keep & (it < cfg.newton_maxit)

            def newton_body(st):
                uu, b, bn, r0, it, cgt = st
                op = A(uu)
                # Jacobi diagonal via sub-grid on the extended slab
                idx = jax.lax.axis_index(AXIS)
                u_ext = extend(uu)
                v_ext = extend(valid)
                top_ok = (idx != 0).astype(v_ext.dtype)
                bot_ok = (idx != S - 1).astype(v_ext.dtype)
                v_ext = jnp.concatenate(
                    [v_ext[0:1] * top_ok, v_ext[1 : R + 1],
                     v_ext[R + 1 :] * bot_ok], axis=0,
                )
                fields = {n: extend(f_loc[n]) for n in names}
                fields["_valid"] = v_ext
                diag = sub.diagonal(u_ext, fields)[:, 1 : R + 1, :]
                diag = diag * free + (1.0 - free)
                dinv = jnp.where(diag != 0, 1.0 / diag, 1.0)

                z0 = dinv * b
                st_cg = (jnp.zeros_like(b), b, z0, z0, pdot(b, z0))
                tol2 = jnp.maximum(
                    cfg.cg_rtol * jnp.sqrt(pdot(b, b)), cfg.cg_atol
                ) ** 2

                def cg_cond(s):
                    return (pdot(s[1], s[1]) > tol2) & True

                def cg_body(s):
                    x, rr, z, p, rz = s
                    Ap = op(p)
                    alpha = rz / pdot(p, Ap)
                    x = x + alpha * p
                    rr = rr - alpha * Ap
                    z = dinv * rr
                    rz_new = pdot(rr, z)
                    p = z + (rz_new / rz) * p
                    return (x, rr, z, p, rz_new)

                def cg_loop(s):
                    def cond2(c):
                        s_, k = c
                        return cg_cond(s_) & (k < cfg.cg_maxit)

                    def body2(c):
                        s_, k = c
                        return (cg_body(s_), k + 1)

                    (s_fin, k) = jax.lax.while_loop(cond2, body2, (s, 0))
                    return s_fin, k

                (x, *_), k = cg_loop(st_cg)
                uu = uu + x * free
                b_new = rhs(uu)
                bn_new = jnp.sqrt(pdot(b_new, b_new))
                return (uu, b_new, bn_new, r0, it + 1, cgt + k)

            b0 = rhs(u0)
            r0 = jnp.sqrt(pdot(b0, b0))
            st = (u0, b0, r0, r0, jnp.zeros((), jnp.int32),
                  jnp.zeros((), jnp.int32))
            uu, b, bn, r0, it, cgt = jax.lax.while_loop(
                newton_cond, newton_body, st
            )
            stats = jnp.stack(
                [it.astype(uu.dtype), bn, r0, cgt.astype(uu.dtype)]
            )
            return uu, jax.lax.psum(stats, AXIS) / S

        inner = shard_map(
            body,
            mesh=mesh,
            in_specs=(P(None, AXIS, None),) * 3
            + (P(AXIS, None),)
            + (P(None, AXIS, None),)
            + (P(AXIS, None),) * len(names),
            out_specs=(P(None, AXIS, None), P(None)),
            check_vma=False,
        )
        inner = jax.jit(inner)

        def solve(u0, fields, free, bcv, load=None) -> DistGridResult:
            dtype = u0.dtype
            u_p = self._pad(u0, 1)
            free_p = self._pad(free.astype(dtype), 1)
            bcv_p = self._pad(bcv.astype(dtype), 1)
            valid = np.zeros((self.NYP_pad, W), dtype=np.float64)
            valid[: self.NYP] = 1.0
            if load is not None:
                lr = self.grid.load_residual(load.astype(dtype))
                load_p = self._pad(lr, 1)
            else:
                load_p = jnp.zeros_like(u_p)
            field_leaves = [
                self._pad(fields[n], 0) for n in names
            ]
            u_fin, stats = inner(
                u_p, free_p, bcv_p, jnp.asarray(valid, dtype=dtype),
                load_p, *field_leaves,
            )
            st = np.asarray(stats)
            return DistGridResult(
                u=np.asarray(u_fin)[:, : self.NYP, :],
                newton_iters=int(st[0]),
                total_cg_iters=int(st[3]),
                final_residual=float(st[1]),
                r0=float(st[2]),
                converged=bool(
                    st[1] < max(cfg.newton_rtol * st[2], cfg.newton_atol)
                ),
            )

        return solve
