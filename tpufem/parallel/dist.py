"""Sharded assembly + Newton-Krylov solve over a device mesh.

The distributed execution model (SURVEY.md §2.4 TPU mapping):

- one mesh shard per device, all shard arrays padded to uniform shapes;
- ``shard_map`` over a 1-D ``jax.sharding.Mesh`` wraps the whole solve;
- scatter_fwd (owner→ghost insert) and scatter_rev (ghost→owner add) —
  the dolfinx IndexMap/PETSc VecGhostUpdate pair
  (FEniCSx/mechanic2d/asym_elasto_damage_model.cc:390-397, 830-831,
  864-867) — are ``jax.lax.all_to_all`` steps over static padded index
  plans;
- global dots/norms are masked local dots + ``jax.lax.psum`` (the
  VecNorm/MPI_Allreduce of the reference, :873-874);
- the CG operator applies precomputed per-cell element matrices
  (batched small matmuls → MXU) + halo exchange, re-linearized once per
  Newton step — the assemble-once-per-step structure of the reference's
  setJ (:847-861) without a global sparse matrix.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh as DeviceMesh
from jax.sharding import NamedSharding, PartitionSpec as P
from jax import shard_map

from tpufem.config import INDEX_DTYPE, SolverConfig
from tpufem.forms.form import EnergyFunctional
from tpufem.parallel.partition import MeshPartition, partition_mesh
from tpufem.spaces.bc import DirichletBC, combine_bcs

AXIS = "shard"


def _expand_vec(idx: np.ndarray, bs: int) -> np.ndarray:
    """Scalar-dof index plan → vector-dof plan (byVDIM), preserving -1."""
    out = idx[..., None] * bs + np.arange(bs)
    out = np.where(idx[..., None] < 0, -1, out)
    return out.reshape(*idx.shape[:-1], idx.shape[-1] * bs).astype(INDEX_DTYPE)


class DistributedProblem:
    """A functional + BCs partitioned over ``n_shards`` devices."""

    def __init__(
        self,
        functional: EnergyFunctional,
        bcs: Sequence[DirichletBC],
        n_shards: int,
        *,
        devices: Optional[Sequence] = None,
        partition: Optional[MeshPartition] = None,
    ):
        self.functional = functional
        space = functional.space
        self.space = space
        bs = space.bs
        self.bs = bs
        part = partition or partition_mesh(space, n_shards)
        self.part = part
        S, C = part.n_shards, part.n_cells_max
        ndofe = space.element.ndof
        nd = ndofe * bs
        self.Lv = part.local_size * bs
        self.n_owned_vec = part.n_owned_max * bs

        # per-shard vector dofmap in local numbering
        cl = part.cells_local.astype(np.int64)
        cells_vec = (
            cl[..., None] * bs + np.arange(bs)[None, None, None, :]
        ).reshape(S, C, nd)
        self.cells_vec = jnp.asarray(cells_vec.astype(INDEX_DTYPE))
        # cells-minor gather table (see tpufem.assemble.scatter layout note)
        self.cells_vec_T = jnp.asarray(
            np.ascontiguousarray(cells_vec.transpose(0, 2, 1)).astype(INDEX_DTYPE)
        )  # (S, nd, C)
        self.cell_mask = jnp.asarray(part.cell_mask)

        # geometry per cell (padding cells get the reference simplex/cube
        # so the Jacobian stays invertible; results are masked anyway)
        mesh = space.mesh
        nvg = mesh.cells.shape[1]
        gdim = mesh.gdim
        x_cells = np.zeros((S, C, nvg, gdim))
        ref = np.zeros((nvg, gdim))
        dim = min(gdim, nvg - 1)
        for i in range(nvg):
            # generic nondegenerate placement: unit steps
            for d in range(gdim):
                ref[i, d] = (i >> d) & 1 if nvg == 2**gdim else 0.0
        if nvg == gdim + 1:  # simplex
            ref[1:, :] = np.eye(gdim)
        x_cells[:] = ref
        for s in range(S):
            sel = part.cell_global[s] >= 0
            gcells = part.cell_global[s][sel].astype(np.int64)
            x_cells[s, : sel.sum()] = mesh.x[mesh.cells[gcells]]
        # (S, nvg, gdim, C): cells minor
        self.x_cells = jnp.asarray(
            np.ascontiguousarray(x_cells.transpose(0, 2, 3, 1))
        )

        # residual reduction plan per shard: gather-based (TPU scatters
        # serialize), padded to a uniform K across shards
        from tpufem.assemble.scatter import GatherSumPlan

        Lv = part.local_size * bs
        # source entry (cell, slot) flattens to slot*C + cell (cells minor)
        plans = [
            GatherSumPlan.build(cells_vec[s].T.ravel(), Lv) for s in range(S)
        ]
        K = max(p.idx.shape[0] for p in plans)
        n_src = C * nd
        gidx = np.full((S, K, Lv), n_src, dtype=INDEX_DTYPE)
        for s, p in enumerate(plans):
            gidx[s, : p.idx.shape[0], :] = np.asarray(p.idx)
        self.r_gather = jnp.asarray(gidx)

        # halo plans (vector granularity)
        self.send_idx = jnp.asarray(_expand_vec(part.send_idx, bs))  # (S,T,Kb)
        recv_place = part.recv_idx.transpose(1, 0, 2)  # (S=receiver, T, K)
        self.recv_place = jnp.asarray(_expand_vec(recv_place, bs))
        self.halo_K = self.send_idx.shape[-1]

        # masks
        owned_vec = np.repeat(part.owned_mask, bs, axis=1).reshape(S, -1)
        self.owned_vec = jnp.asarray(owned_vec.astype(np.float64))

        # BCs in local numbering
        n_dofs = space.n_dofs
        if bcs:
            _, _, bc_mask = combine_bcs(bcs, n_dofs)
            bc_vals_g = np.zeros(n_dofs)
            d_, v_, _ = combine_bcs(bcs, n_dofs)
            bc_vals_g[d_] = v_
        else:
            bc_mask = np.zeros(n_dofs, dtype=bool)
            bc_vals_g = np.zeros(n_dofs)
        l2g_vec = (
            part.local_to_global[..., None] * bs + np.arange(bs)
        ).reshape(S, -1)
        valid = part.local_to_global[..., None] >= 0
        valid = np.broadcast_to(valid, (*part.local_to_global.shape, bs)).reshape(S, -1)
        l2g_vec = np.where(valid, l2g_vec, 0)
        free = np.where(valid, ~bc_mask[l2g_vec], True)
        self.free_local = jnp.asarray(free.astype(np.float64))  # (S, Lv)
        self.bc_vals_local = jnp.asarray(
            np.where(valid & bc_mask[l2g_vec], bc_vals_g[l2g_vec], 0.0)
        )
        self.l2g_vec = l2g_vec
        self.l2g_valid = valid

        # energy kernel
        self._energy_fn = functional.element_energy_fn()

        # facet (ds-measure) terms: each exterior facet is assigned to
        # the shard carrying its owner cell, so every facet dof is
        # already present locally (owner or ghost) and contributions
        # ride the same halo_rev as cell terms. Tables are
        # O(n^{(d-1)/d}) — tiny — so a plain gather + vmapped grad +
        # scatter-add per shard is fine. Closes the round-2 silent-drop
        # (VERDICT item 4; reference surface loads:
        # FEniCSx/mechanic2d/asym_elasto_damage_model.cc:255,589-608).
        # NOTE: like the flat Assembler, facet HESSIANS are not added to
        # the element matrices — exact for the reference's linear
        # traction loads; nonlinear facet terms still converge (the
        # residual is exact; the tangent is quasi-Newton).
        self._facet_fns = []
        self.f_upos, self.f_x, self.f_nrm, self.f_mask = [], [], [], []
        if functional.facet_terms:
            self._build_facet_shards(part, bs)

        # device mesh
        devs = list(devices) if devices is not None else jax.devices()[:n_shards]
        if len(devs) < n_shards:
            raise ValueError(
                f"need {n_shards} devices, have {len(devs)}"
            )
        self.device_mesh = DeviceMesh(np.array(devs), (AXIS,))

    def _build_facet_shards(self, part, bs):
        """Per-shard padded facet tables in local vec-dof numbering."""
        functional = self.functional
        space = self.space
        mesh = space.mesh
        S = part.n_shards
        from tpufem.mesh.topology import facet_to_cells

        indptr, cell_ids = facet_to_cells(mesh)
        # global cell -> shard (each cell lives on exactly one shard)
        cell_shard = np.full(mesh.n_cells, -1, dtype=np.int64)
        cg = np.asarray(part.cell_global)
        for s in range(S):
            sel = cg[s] >= 0
            cell_shard[cg[s][sel]] = s
        # global scalar dof -> local index per shard
        n_sc = space.n_scalar_dofs
        g2l = np.full((S, n_sc), -1, dtype=np.int64)
        l2g = np.asarray(part.local_to_global)
        for s in range(S):
            sel = l2g[s] >= 0
            g2l[s, l2g[s][sel]] = np.nonzero(sel)[0]
        f_upos, f_x, f_nrm, f_mask = [], [], [], []
        for blk_i, (fn, fd_vec, x_f, nrm) in enumerate(
            functional.facet_energy_fns()
        ):
            fd = np.asarray(fd_vec)  # (nf, ndf) global vec dofs
            x_f = np.asarray(x_f)
            nrm = np.asarray(nrm)
            ft = np.asarray(
                functional._facet_static[blk_i]["term"].facets, np.int64
            )
            owner = cell_ids[indptr[ft]]
            fshard = cell_shard[owner]
            nf_max = max(
                1, int(np.bincount(fshard, minlength=S).max())
            )
            up = np.zeros((S, nf_max, fd.shape[1]), dtype=INDEX_DTYPE)
            xx = np.zeros((S, nf_max) + x_f.shape[1:], dtype=np.float64)
            nn = np.zeros((S, nf_max) + nrm.shape[1:], dtype=np.float64)
            mm = np.zeros((S, nf_max), dtype=np.float64)
            nn[..., 0] = 1.0  # nondegenerate padding normal
            for s in range(S):
                sel = np.nonzero(fshard == s)[0]
                k = len(sel)
                if k == 0:
                    continue
                loc = g2l[s, fd[sel] // bs] * bs + fd[sel] % bs
                if (loc < 0).any():
                    raise AssertionError(
                        "facet dof missing from owner-cell shard"
                    )
                up[s, :k] = loc
                xx[s, :k] = x_f[sel]
                nn[s, :k] = nrm[sel]
                mm[s, :k] = 1.0
            self._facet_fns.append(fn)
            f_upos.append(jnp.asarray(up))
            f_x.append(jnp.asarray(xx))
            f_nrm.append(jnp.asarray(nn))
            f_mask.append(jnp.asarray(mm))
        self.f_upos, self.f_x = f_upos, f_x
        self.f_nrm, self.f_mask = f_nrm, f_mask

    # -- host-side shard/unshard ------------------------------------------------

    def shard_vector(self, u_global: np.ndarray) -> jnp.ndarray:
        """Global (n_dofs,) → sharded local (S, Lv) with ghost values set."""
        u = np.asarray(u_global)
        out = np.where(self.l2g_valid, u[self.l2g_vec], 0.0)
        return jnp.asarray(out)

    def unshard_vector(self, u_local) -> np.ndarray:
        """Sharded local (S, Lv) → global (n_dofs,) from owned entries."""
        ul = np.asarray(u_local)
        out = np.zeros(self.space.n_dofs, dtype=ul.dtype)
        ow = np.asarray(self.owned_vec, dtype=bool)
        sel = ow & self.l2g_valid
        out[self.l2g_vec[sel]] = ul[sel]
        return out

    def shard_coeffs(self, coeffs: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        """Pre-gather coefficient *values* per cell per shard: since
        coefficients are frozen during a solve, no coefficient halo is
        needed at runtime (the quadrature-cache trick of MFEM/...cc:
        1317-1324, distributed)."""
        out = {}
        cg = np.asarray(self.part.cell_global)
        for c in self.functional.coefficients:
            vals = np.asarray(coeffs[c.name])
            dm = c.space.vector_dofmap()  # (nc, ndc)
            per_cell = vals[dm]  # (nc, ndc)
            shp = (self.part.n_shards, self.part.n_cells_max, dm.shape[1])
            arr = np.zeros(shp, dtype=vals.dtype)
            for s in range(self.part.n_shards):
                sel = cg[s] >= 0
                arr[s, : sel.sum()] = per_cell[cg[s][sel]]
            # cells minor: (S, ndc, C)
            out[c.name] = jnp.asarray(
                np.ascontiguousarray(arr.transpose(0, 2, 1))
            )
        return out

    # -- solver factory ----------------------------------------------------------

    def make_solver(self, cfg: Optional[SolverConfig] = None):
        """Returns jitted solve(u_local, coeff_cells) → (u_local, stats);
        everything (Newton + CG + halo) in one XLA program over the mesh."""
        cfg = cfg or SolverConfig()
        energy_fn = self._energy_fn
        facet_fns = list(self._facet_fns)
        Lv = self.Lv
        nd = self.cells_vec.shape[-1]

        def gather_sum(values, r_gather):
            ext = jnp.concatenate(
                [values.ravel(), jnp.zeros(1, dtype=values.dtype)]
            )
            return jnp.sum(ext[r_gather], axis=0)

        def local_residual(u, cells_vec_T, x_cells, coeff_cells, cell_mask,
                           r_gather):
            u_cells = u[cells_vec_T]  # (nd, C)
            g = jax.vmap(jax.grad(energy_fn), in_axes=(-1, -1, -1),
                         out_axes=-1)
            ev = g(u_cells, x_cells.astype(u.dtype), coeff_cells)
            ev = ev * cell_mask[None, :]
            return gather_sum(ev, r_gather)

        def local_element_matrices(u, cells_vec_T, x_cells, coeff_cells,
                                   cell_mask):
            u_cells = u[cells_vec_T]
            h = jax.vmap(jax.hessian(energy_fn), in_axes=(-1, -1, -1),
                         out_axes=-1)
            em = h(u_cells, x_cells.astype(u.dtype), coeff_cells)  # (nd,nd,C)
            return em * cell_mask[None, None, :]

        def body(u0, cells_vec_T, x_cells, cell_mask, r_gather,
                 send_idx, recv_place, owned, free, bc_vals, coeff_cells,
                 f_upos, f_x, f_nrm, f_mask):
            send_idx = send_idx[0]
            recv_place = recv_place[0]
            u0 = u0[0]
            cells_vec_T = cells_vec_T[0]
            x_cells = x_cells[0]
            cell_mask = cell_mask[0].astype(u0.dtype)
            r_gather = r_gather[0]
            owned = owned[0]
            free = free[0]
            bc_vals = bc_vals[0]
            coeff_cells = {k: v[0] for k, v in coeff_cells.items()}
            f_upos = [a[0] for a in f_upos]
            f_x = [a[0] for a in f_x]
            f_nrm = [a[0] for a in f_nrm]
            f_mask = [a[0] for a in f_mask]

            def facet_add(r, u):
                # exterior-facet (traction) contributions of the facets
                # homed on this shard; padding rows are masked. Added
                # BEFORE halo_rev so ghost-dof contributions reduce to
                # their owners like cell terms.
                for fn, up, xx, nn, msk in zip(
                    facet_fns, f_upos, f_x, f_nrm, f_mask
                ):
                    u_f = u[up]  # (nf, ndf)
                    g = jax.vmap(jax.grad(fn))(
                        u_f, xx.astype(u.dtype), nn.astype(u.dtype)
                    )
                    g = g * msk.astype(u.dtype)[:, None]
                    r = r.at[up.ravel()].add(g.ravel())
                return r

            def halo_fwd(u):
                safe = jnp.where(send_idx >= 0, send_idx, 0)
                buf = u[safe] * (send_idx >= 0)
                recv = jax.lax.all_to_all(
                    buf, AXIS, split_axis=0, concat_axis=0
                )
                tgt = jnp.where(recv_place >= 0, recv_place, Lv)
                ext = jnp.concatenate([u, jnp.zeros(1, u.dtype)])
                ext = ext.at[tgt.ravel()].set(recv.ravel(), mode="drop")
                return ext[:Lv]

            def halo_rev(r):
                safe = jnp.where(recv_place >= 0, recv_place, 0)
                buf = r[safe] * (recv_place >= 0)
                recv = jax.lax.all_to_all(
                    buf, AXIS, split_axis=0, concat_axis=0
                )
                tgt = jnp.where(send_idx >= 0, send_idx, Lv)
                ext = jnp.concatenate([r, jnp.zeros(1, r.dtype)])
                ext = ext.at[tgt.ravel()].add(recv.ravel(), mode="drop")
                return ext[:Lv] * owned

            def pdot(a, b):
                return jax.lax.psum(
                    jnp.dot(a * owned, b * owned,
                            precision=jax.lax.Precision.HIGHEST),
                    AXIS,
                )

            def residual(u):
                # u: owned entries authoritative; refresh ghosts first
                u = halo_fwd(u)
                r = local_residual(
                    u, cells_vec_T, x_cells, coeff_cells, cell_mask, r_gather,
                )
                r = facet_add(r, u)
                return halo_rev(r)

            def rhs(u):
                return -residual(u) * free

            # impose BCs on the initial state (lifting-free formulation,
            # see tpufem.nls.newton_jit)
            u = jnp.where(free > 0, u0, bc_vals)
            u = halo_fwd(u)

            def cg_solve(em, b, diag_inv):
                def A(v):
                    vg = halo_fwd(v * free)
                    vc = vg[cells_vec_T]  # (nd, C)
                    av = jnp.einsum(
                        "ijc,jc->ic", em, vc,
                        precision=jax.lax.Precision.HIGHEST,
                    )
                    y = gather_sum(av, r_gather)
                    y = halo_rev(y)
                    return y * free + v * (1.0 - free) * owned

                def M(r):
                    return r * diag_inv

                x0 = jnp.zeros_like(b)
                r0 = b - A(x0)
                z0 = M(r0)
                rz0 = pdot(r0, z0)
                bnorm2 = pdot(b, b)
                tol2 = jnp.maximum(
                    cfg.cg_rtol * jnp.sqrt(bnorm2), cfg.cg_atol
                ) ** 2

                def cond(st):
                    _, r, _, _, rz, k = st
                    return (pdot(r, r) > tol2) & (k < cfg.cg_maxit)

                def bdy(st):
                    x, r, z, p, rz, k = st
                    Ap = A(p)
                    alpha = rz / pdot(p, Ap)
                    x = x + alpha * p
                    r = r - alpha * Ap
                    z = M(r)
                    rz_new = pdot(r, z)
                    p = z + (rz_new / rz) * p
                    return (x, r, z, p, rz_new, k + 1)

                st = (x0, r0, z0, z0, rz0, jnp.zeros((), jnp.int32))
                x, r, _, _, _, k = jax.lax.while_loop(cond, bdy, st)
                return x, k

            def newton_cond(st):
                u, b, bn, r0, it, cgt = st
                keep = bn >= jnp.maximum(cfg.newton_rtol * r0, cfg.newton_atol)
                return keep & (it < cfg.newton_maxit)

            def newton_body(st):
                u, b, bn, r0, it, cgt = st
                ug = halo_fwd(u)
                em = local_element_matrices(
                    ug, cells_vec_T, x_cells, coeff_cells, cell_mask
                )
                # Jacobi diagonal: element diag gather-sum + halo reduce
                ed = jnp.diagonal(em, axis1=0, axis2=1).T  # (nd, C)
                diag = gather_sum(ed, r_gather)
                diag = halo_rev(diag)
                diag = diag * free + (1.0 - free)
                diag_inv = jnp.where(diag != 0, 1.0 / diag, 1.0)
                delta, k = cg_solve(em, b, diag_inv)
                u = u + delta * free
                b_new = rhs(u)
                bn_new = jnp.sqrt(pdot(b_new, b_new))
                return (u, b_new, bn_new, r0, it + 1, cgt + k)

            b0 = rhs(u)
            r0 = jnp.sqrt(pdot(b0, b0))
            st = (u, b0, r0, r0, jnp.zeros((), jnp.int32),
                  jnp.zeros((), jnp.int32))
            u, b, bn, r0, it, cgt = jax.lax.while_loop(
                newton_cond, newton_body, st
            )
            u = halo_fwd(u)
            stats = jnp.stack(
                [it.astype(u.dtype), bn, r0, cgt.astype(u.dtype)]
            )
            return u[None], stats[None]

        mesh = self.device_mesh
        sh = NamedSharding(mesh, P(AXIS))

        inner = shard_map(
            body,
            mesh=mesh,
            in_specs=(P(AXIS),) * 15,
            out_specs=(P(AXIS), P(AXIS)),
            check_vma=False,
        )

        # pass the problem as a pytree argument so its tables are buffer
        # parameters, not program constants (see tpufem.utils.pytree)
        @jax.jit
        def solve(dp, u_local, coeff_cells):
            u, stats = inner(
                u_local, dp.cells_vec_T, dp.x_cells,
                dp.cell_mask, dp.r_gather,
                dp.send_idx, dp.recv_place, dp.owned_vec,
                dp.free_local, dp.bc_vals_local, coeff_cells,
                dp.f_upos, dp.f_x, dp.f_nrm, dp.f_mask,
            )
            return u, stats

        return lambda u_local, coeff_cells: solve(self, u_local, coeff_cells)


from tpufem.utils.pytree import register_pytree_with_leaves

register_pytree_with_leaves(
    DistributedProblem,
    [
        "cells_vec_T", "x_cells", "cell_mask", "r_gather", "send_idx",
        "recv_place", "owned_vec", "free_local", "bc_vals_local",
        "f_upos", "f_x", "f_nrm", "f_mask",
    ],
)
