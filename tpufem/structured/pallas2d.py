"""Pallas fused residual kernel for the 2D structured asym-damage model.

The XLA structured path materializes ~100 full-grid temporaries per
residual (fusion stops at slice boundaries), costing ~2.5 ms at 2.1M DoF.
This kernel runs the whole pipeline — halo load, strain from shifted
fields, the asymmetric elasto-damage stress (hand-spectral form,
tpufem.forms.potentials.asym_damage_stress_manual), and the Bᵀσ
accumulation — in VMEM in one pass over the grid: one read of u/d, one
write of r.

Mosaic constraints shape the implementation: sublane slices must be
8-aligned, so all neighbor access is ``pltpu.roll`` over full slabs
(wrap-around rows/cols are killed by the ghost-cell mask), the top halo
is 8 rows, and slab sizes are multiples of 8. Each program recomputes
its seam cells instead of communicating, so programs are independent.

This is the tpufem analog of the reference's ffcx-generated C kernels
(~260-970 lines per variant, doc.tex:2322-2325) — fused through the
scatter as well.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpufem.forms.potentials import lame_parameters

# lattice offsets per orientation (dy, dx), element dof order — must match
# tpufem.structured.grid2d
_LOWER = ((0, 0), (0, 1), (1, 1))
_UPPER = ((0, 0), (1, 1), (1, 0))

_HALO = 8  # top halo rows (Mosaic sublane alignment)


def _phys_grads(hx: float, hy: float):
    dN_ref = np.array([[-1.0, -1.0], [1.0, 0.0], [0.0, 1.0]])
    out = {}
    for tag, x_e in (
        ("lo", np.array([[0.0, 0.0], [hx, 0.0], [hx, hy]])),
        ("up", np.array([[0.0, 0.0], [hx, hy], [0.0, hy]])),
    ):
        J = x_e.T @ dN_ref
        # f32 scalars: NumPy f64 scalars would promote the whole kernel
        # to f64 under jax_enable_x64
        out[tag] = (
            (dN_ref @ np.linalg.inv(J)).astype(np.float32),
            np.float32(0.5 * abs(np.linalg.det(J))),
        )
    return out


def _stress(e11, e22, e12, d, lam, mu):
    """Asymmetric elasto-damage stress, vectorized elementwise — the
    hand-spectral σ = ∂ψ/∂ε (MFEM/mechanic2d/asym_elasto_damage_model.cc:
    205-329; tpufem.forms.potentials.asym_damage_stress_manual)."""
    i1 = e11 + e22
    diff = e11 - e22
    delta = diff * diff + 4.0 * e12 * e12
    degen = delta == 0.0
    r = jnp.sqrt(jnp.where(degen, 1.0, delta))
    r = jnp.where(degen, 0.0, r)
    eig1 = 0.5 * (i1 + r)
    eig2 = 0.5 * (i1 - r)
    a1 = jnp.where(eig1 < 0.0, 0.0, 1.0)
    a2 = jnp.where(eig2 < 0.0, 0.0, 1.0)
    a = jnp.where(i1 < 0.0, 0.0, 1.0)
    inv_r = jnp.where(degen, 0.0, 1.0 / jnp.where(degen, 1.0, r))
    p11 = jnp.where(degen, 0.5, (e11 - eig2) * inv_r)
    p22 = jnp.where(degen, 0.5, (e22 - eig2) * inv_r)
    p12 = jnp.where(degen, 0.0, e12 * inv_r)
    vol = lam * i1 * (1.0 - a * d)
    c1 = 2.0 * mu * (1.0 - a1 * d) * eig1
    c2 = 2.0 * mu * (1.0 - a2 * d) * eig2
    s11 = vol + c1 * p11 + c2 * (1.0 - p11)
    s22 = vol + c1 * p22 + c2 * (1.0 - p22)
    s12 = c1 * p12 - c2 * p12
    return s11, s22, s12


def make_residual_kernel(nx: int, ny: int, hx: float, hy: float,
                         E: float, nu: float, *, block_rows: int = 64):
    """Returns residual(u (2, ny+1, nx+1), d (ny+1, nx+1)) → same shape
    as u — the fused Pallas version of StructuredGrid2D.residual for the
    asym-damage law with scalar E."""
    lam, mu = lame_parameters(E, nu)
    lam, mu = float(lam), float(mu)  # python floats: weak-typed in kernels
    grads = _phys_grads(hx, hy)
    NYP = ny + 1
    W = nx + 1
    WP = -(-W // 128) * 128  # lane-dim padding (Mosaic 128 alignment)
    BY = block_rows
    assert BY % 8 == 0
    n_blocks = -(-NYP // BY)
    L = BY + 2 * _HALO  # slab rows (multiple of 8)
    PAD_ROWS = _HALO + n_blocks * BY + 2 * _HALO

    def kernel(u_ref, d_ref, r_ref):
        i = pl.program_id(0)

        def body(ux, uy, dd, sem):
            row0 = i * BY  # padded-array row of the slab start
            copies = [
                pltpu.make_async_copy(
                    u_ref.at[0, pl.ds(row0, L), :], ux, sem.at[0]
                ),
                pltpu.make_async_copy(
                    u_ref.at[1, pl.ds(row0, L), :], uy, sem.at[1]
                ),
                pltpu.make_async_copy(
                    d_ref.at[pl.ds(row0, L), :], dd, sem.at[2]
                ),
            ]
            for cp in copies:
                cp.start()
            for cp in copies:
                cp.wait()

            # neighbor fields via rolls: X_{dy,dx}[k, j] = X[k+dy, j+dx]
            # (pltpu.roll only takes non-negative shifts: −s ≡ size−s)
            def shifted(x, dy, dx):
                out = x[:]
                if dy:
                    out = pltpu.roll(out, np.int32(L - dy), 0)
                if dx:
                    out = pltpu.roll(out, np.int32(WP - dx), 1)
                return out

            u_at = {}
            for (dy, dx) in set(_LOWER) | set(_UPPER):
                u_at[(dy, dx)] = (
                    shifted(ux, dy, dx), shifted(uy, dy, dx),
                    shifted(dd, dy, dx),
                )

            # validity of cell (local row k, col j): original cell row
            # = i*BY - HALO + k ∈ [0, ny) and j < nx (and j ≥ 0 always;
            # roll wrap-arounds are masked by these bounds)
            cell_row0 = i * BY - _HALO
            rows = jax.lax.broadcasted_iota(jnp.int32, (L, WP), 0) + cell_row0
            cols = jax.lax.broadcasted_iota(jnp.int32, (L, WP), 1)
            valid = jnp.logical_and(
                jnp.logical_and(rows >= 0, rows < ny), cols < nx
            ).astype(jnp.float32)

            acc_x = jnp.zeros((L, WP), jnp.float32)
            acc_y = jnp.zeros((L, WP), jnp.float32)
            for tag, offsets in (("lo", _LOWER), ("up", _UPPER)):
                dN, w = grads[tag]
                uxv = [u_at[o][0] for o in offsets]
                uyv = [u_at[o][1] for o in offsets]
                ddv = [u_at[o][2] for o in offsets]
                gxx = sum(uxv[k] * dN[k, 0] for k in range(3))
                gxy = sum(uxv[k] * dN[k, 1] for k in range(3))
                gyx = sum(uyv[k] * dN[k, 0] for k in range(3))
                gyy = sum(uyv[k] * dN[k, 1] for k in range(3))
                e11 = gxx
                e22 = gyy
                e12 = 0.5 * (gxy + gyx)
                d_c = (ddv[0] + ddv[1] + ddv[2]) / 3.0
                s11, s22, s12 = _stress(e11, e22, e12, d_c, lam, mu)
                for k, (dy, dx) in enumerate(offsets):
                    fx = w * (s11 * dN[k, 0] + s12 * dN[k, 1]) * valid
                    fy = w * (s12 * dN[k, 0] + s22 * dN[k, 1]) * valid
                    # contribution of cell (k_c, j_c) to node
                    # (k_c+dy, j_c+dx): roll forward
                    if dy:
                        fx = pltpu.roll(fx, np.int32(dy), 0)
                        fy = pltpu.roll(fy, np.int32(dy), 0)
                    if dx:
                        fx = pltpu.roll(fx, np.int32(dx), 1)
                        fy = pltpu.roll(fy, np.int32(dx), 1)
                    acc_x = acc_x + fx
                    acc_y = acc_y + fy

            r_ref[0, :, :] = acc_x[_HALO : _HALO + BY, :]
            r_ref[1, :, :] = acc_y[_HALO : _HALO + BY, :]

        pl.run_scoped(
            body,
            ux=pltpu.VMEM((L, WP), jnp.float32),
            uy=pltpu.VMEM((L, WP), jnp.float32),
            dd=pltpu.VMEM((L, WP), jnp.float32),
            sem=pltpu.SemaphoreType.DMA((3,)),
        )

    @jax.jit
    def residual(u, d):
        pad_lo = _HALO
        pad_hi = PAD_ROWS - NYP - _HALO
        up = jnp.pad(u, ((0, 0), (pad_lo, pad_hi), (0, WP - W)))
        dp = jnp.pad(d, ((pad_lo, pad_hi), (0, WP - W)))
        out = pl.pallas_call(
            kernel,
            grid=(n_blocks,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.HBM),
                pl.BlockSpec(memory_space=pltpu.HBM),
            ],
            out_specs=pl.BlockSpec(
                (2, BY, WP), lambda i: (0, i, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct(
                (2, n_blocks * BY, WP), jnp.float32
            ),
        )(up, dp)
        return out[:, :NYP, :W]

    return residual


def _stress_jvp(e11, e22, e12, t11, t22, t12, d, lam, mu):
    """Directional derivative dσ = (∂σ/∂ε)[t] of the spectral
    elasto-damage stress — the hand-derived consistent tangent action
    (the math MFEM hand-codes at MFEM/...cc:766-871, here in forward
    mode). The switches α, αᵢ are piecewise constant (derivative 0 a.e.);
    at eigenvalue coalescence (delta == 0) the smooth-limit isotropic
    form is used, matching jax.jvp of asym_damage_psi's branch
    structure."""
    i1 = e11 + e22
    di1 = t11 + t22
    diff = e11 - e22
    ddiff = t11 - t22
    delta = diff * diff + 4.0 * e12 * e12
    degen = delta == 0.0
    r = jnp.sqrt(jnp.where(degen, 1.0, delta))
    inv_r = jnp.where(degen, 0.0, 1.0 / r)
    r = jnp.where(degen, 0.0, r)
    dr = (2.0 * diff * ddiff + 8.0 * e12 * t12) * 0.5 * inv_r

    eig1 = 0.5 * (i1 + r)
    eig2 = 0.5 * (i1 - r)
    deig1 = 0.5 * (di1 + dr)
    deig2 = 0.5 * (di1 - dr)
    a1 = jnp.where(eig1 < 0.0, 0.0, 1.0)
    a2 = jnp.where(eig2 < 0.0, 0.0, 1.0)
    a = jnp.where(i1 < 0.0, 0.0, 1.0)

    p11 = (e11 - eig2) * inv_r
    p22 = (e22 - eig2) * inv_r
    p12 = e12 * inv_r
    inv_r2 = inv_r * inv_r
    dp11 = (t11 - deig2) * inv_r - (e11 - eig2) * dr * inv_r2
    dp22 = (t22 - deig2) * inv_r - (e22 - eig2) * dr * inv_r2
    dp12 = t12 * inv_r - e12 * dr * inv_r2

    dvol = lam * di1 * (1.0 - a * d)
    c1 = 2.0 * mu * (1.0 - a1 * d) * eig1
    c2 = 2.0 * mu * (1.0 - a2 * d) * eig2
    dc1 = 2.0 * mu * (1.0 - a1 * d) * deig1
    dc2 = 2.0 * mu * (1.0 - a2 * d) * deig2

    ds11 = dvol + dc1 * p11 + c1 * dp11 + dc2 * (1.0 - p11) - c2 * dp11
    ds22 = dvol + dc1 * p22 + c1 * dp22 + dc2 * (1.0 - p22) - c2 * dp22
    ds12 = (dc1 - dc2) * p12 + (c1 - c2) * dp12

    # coalescent limit: isotropic damaged Hooke on the direction
    dvol_c = lam * di1 * (1.0 - a * d)
    dev = 2.0 * mu * (1.0 - a * d)
    ds11 = jnp.where(degen, dvol_c + dev * t11, ds11)
    ds22 = jnp.where(degen, dvol_c + dev * t22, ds22)
    ds12 = jnp.where(degen, dev * t12, ds12)
    return ds11, ds22, ds12


def make_tangent_kernel(nx: int, ny: int, hx: float, hy: float,
                        E: float, nu: float, *, block_rows: int = 64):
    """Returns jvp(u, d, v) → (∂F/∂u)[v] for the asym-damage structured
    residual — the fused Pallas CG operator. Same slab/roll skeleton as
    make_residual_kernel, with both the state strain and the direction
    strain computed per cell."""
    lam, mu = lame_parameters(E, nu)
    lam, mu = float(lam), float(mu)
    grads = _phys_grads(hx, hy)
    NYP = ny + 1
    W = nx + 1
    WP = -(-W // 128) * 128
    BY = block_rows
    assert BY % 8 == 0
    n_blocks = -(-NYP // BY)
    L = BY + 2 * _HALO
    PAD_ROWS = _HALO + n_blocks * BY + 2 * _HALO

    def kernel(u_ref, v_ref, d_ref, r_ref):
        i = pl.program_id(0)

        def body(ux, uy, vx, vy, dd, sem):
            row0 = i * BY
            copies = [
                pltpu.make_async_copy(
                    u_ref.at[0, pl.ds(row0, L), :], ux, sem.at[0]
                ),
                pltpu.make_async_copy(
                    u_ref.at[1, pl.ds(row0, L), :], uy, sem.at[1]
                ),
                pltpu.make_async_copy(
                    v_ref.at[0, pl.ds(row0, L), :], vx, sem.at[2]
                ),
                pltpu.make_async_copy(
                    v_ref.at[1, pl.ds(row0, L), :], vy, sem.at[3]
                ),
                pltpu.make_async_copy(
                    d_ref.at[pl.ds(row0, L), :], dd, sem.at[4]
                ),
            ]
            for cp in copies:
                cp.start()
            for cp in copies:
                cp.wait()

            def shifted(x, dy, dx):
                out = x[:]
                if dy:
                    out = pltpu.roll(out, np.int32(L - dy), 0)
                if dx:
                    out = pltpu.roll(out, np.int32(WP - dx), 1)
                return out

            at = {}
            for (dy, dx) in set(_LOWER) | set(_UPPER):
                at[(dy, dx)] = tuple(
                    shifted(f, dy, dx) for f in (ux, uy, vx, vy, dd)
                )

            cell_row0 = i * BY - _HALO
            rows = jax.lax.broadcasted_iota(jnp.int32, (L, WP), 0) + cell_row0
            cols = jax.lax.broadcasted_iota(jnp.int32, (L, WP), 1)
            valid = jnp.logical_and(
                jnp.logical_and(rows >= 0, rows < ny), cols < nx
            ).astype(jnp.float32)

            acc_x = jnp.zeros((L, WP), jnp.float32)
            acc_y = jnp.zeros((L, WP), jnp.float32)
            for tag, offsets in (("lo", _LOWER), ("up", _UPPER)):
                dN, w = grads[tag]
                uxv = [at[o][0] for o in offsets]
                uyv = [at[o][1] for o in offsets]
                vxv = [at[o][2] for o in offsets]
                vyv = [at[o][3] for o in offsets]
                ddv = [at[o][4] for o in offsets]
                e11 = sum(uxv[k] * dN[k, 0] for k in range(3))
                guxy = sum(uxv[k] * dN[k, 1] for k in range(3))
                guyx = sum(uyv[k] * dN[k, 0] for k in range(3))
                e22 = sum(uyv[k] * dN[k, 1] for k in range(3))
                e12 = 0.5 * (guxy + guyx)
                t11 = sum(vxv[k] * dN[k, 0] for k in range(3))
                gvxy = sum(vxv[k] * dN[k, 1] for k in range(3))
                gvyx = sum(vyv[k] * dN[k, 0] for k in range(3))
                t22 = sum(vyv[k] * dN[k, 1] for k in range(3))
                t12 = 0.5 * (gvxy + gvyx)
                d_c = (ddv[0] + ddv[1] + ddv[2]) / 3.0
                ds11, ds22, ds12 = _stress_jvp(
                    e11, e22, e12, t11, t22, t12, d_c, lam, mu
                )
                for k, (dy, dx) in enumerate(offsets):
                    fx = w * (ds11 * dN[k, 0] + ds12 * dN[k, 1]) * valid
                    fy = w * (ds12 * dN[k, 0] + ds22 * dN[k, 1]) * valid
                    if dy:
                        fx = pltpu.roll(fx, np.int32(dy), 0)
                        fy = pltpu.roll(fy, np.int32(dy), 0)
                    if dx:
                        fx = pltpu.roll(fx, np.int32(dx), 1)
                        fy = pltpu.roll(fy, np.int32(dx), 1)
                    acc_x = acc_x + fx
                    acc_y = acc_y + fy

            r_ref[0, :, :] = acc_x[_HALO : _HALO + BY, :]
            r_ref[1, :, :] = acc_y[_HALO : _HALO + BY, :]

        pl.run_scoped(
            body,
            ux=pltpu.VMEM((L, WP), jnp.float32),
            uy=pltpu.VMEM((L, WP), jnp.float32),
            vx=pltpu.VMEM((L, WP), jnp.float32),
            vy=pltpu.VMEM((L, WP), jnp.float32),
            dd=pltpu.VMEM((L, WP), jnp.float32),
            sem=pltpu.SemaphoreType.DMA((5,)),
        )

    @jax.jit
    def jvp(u, d, v):
        pad_lo = _HALO
        pad_hi = PAD_ROWS - NYP - _HALO
        up = jnp.pad(u, ((0, 0), (pad_lo, pad_hi), (0, WP - W)))
        vp = jnp.pad(v, ((0, 0), (pad_lo, pad_hi), (0, WP - W)))
        dp = jnp.pad(d, ((pad_lo, pad_hi), (0, WP - W)))
        out = pl.pallas_call(
            kernel,
            grid=(n_blocks,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.HBM),
                pl.BlockSpec(memory_space=pltpu.HBM),
                pl.BlockSpec(memory_space=pltpu.HBM),
            ],
            out_specs=pl.BlockSpec(
                (2, BY, WP), lambda i: (0, i, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct(
                (2, n_blocks * BY, WP), jnp.float32
            ),
        )(up, vp, dp)
        return out[:, :NYP, :W]

    return jvp
