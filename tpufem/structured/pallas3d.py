"""Pallas constant-stencil matvec for 3D linear elasticity on hex
lattices — the config-3 hot operator at VMEM speed.

For constant-coefficient linear elasticity on a uniform hex lattice the
stiffness operator is a 27-point stencil with constant 3×3 blocks; the
only spatial variation is at boundaries, where fewer cells are incident.
Both are handled exactly in one pass: the per-(offset, incident-cell)
constants K[δ, χ] come from the single-cell element matrix (computed by
jax.hessian of the same cell energy grid3d uses), and the incidence
masks are per-axis indicator fields built from iota — so the kernel is
~1.3k fused multiply-adds per node in VMEM, no weight fields in HBM.

y = K @ x with NO boundary-condition treatment — the caller applies the
usual free-mask sandwich (M K M + (I−M)), exactly like
StructuredGrid2D/3D.tangent_action consumers.
"""

from __future__ import annotations

from itertools import product

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpufem.structured.grid3d import StructuredGrid3D, _CORNERS

_HALO = 1  # z-slab halo planes (z is the untiled axis: no alignment rule)


def _cell_matrix(grid: StructuredGrid3D, E: float, nu: float) -> np.ndarray:
    """Ke (8, 3, 8, 3) of one uniform isotropic-elastic hex, computed
    analytically in NumPy float64: Ke = Σ_q w_q Bᵀ D B. (An f32 AD
    Hessian loses ~3 digits on the cancellation-heavy small entries,
    which shows up as a 1e-3 stencil error.)"""
    lam = E * nu / ((1 + nu) * (1 - 2 * nu))
    mu = E / (2 * (1 + nu))
    dN = np.asarray(grid._dN, dtype=np.float64)  # (q, 8, 3)
    w = np.asarray(grid._w, dtype=np.float64)
    Ke = np.zeros((8, 3, 8, 3))
    for q in range(len(w)):
        g = dN[q]  # (8, 3)
        for k in range(8):
            for l in range(8):
                gg = g[k] @ g[l]  # Σ_j dN_kj dN_lj
                for a in range(3):
                    for b in range(3):
                        Ke[k, a, l, b] += w[q] * (
                            lam * g[k, a] * g[l, b]
                            + mu * ((a == b) * gg + g[k, b] * g[l, a])
                        )
    return Ke


def _stencil_constants(Ke: np.ndarray):
    """K[δ][χ] (3,3) for node-pair offset δ∈{-1,0,1}³ and incident-cell
    origin χ∈{-1,0}³ (relative to the node): corner a = -χ of the cell is
    our node, corner b = a + δ the neighbor."""
    cidx = {c: k for k, c in enumerate(_CORNERS)}
    out = {}
    for delta in product((-1, 0, 1), repeat=3):
        terms = []
        for chi in product((-1, 0), repeat=3):
            a = tuple(-c for c in chi)
            b = tuple(ai + di for ai, di in zip(a, delta))
            if all(v in (0, 1) for v in b):
                terms.append(
                    (chi, Ke[cidx[a], :, cidx[b], :].astype(np.float32))
                )
        out[delta] = terms
    return out


def make_linear_matvec(grid: StructuredGrid3D, E: float = None,
                       nu: float = None, *, block_z: int = 4):
    """Returns matvec(x (3, NZ1, NY1, NX1)) → K x, fused Pallas kernel.

    Isotropic linear elasticity only (the stencil constants are computed
    analytically from E, nu; grid.energy_density must be the matching
    law — validated by the tests)."""
    if E is None or nu is None:
        raise ValueError("make_linear_matvec requires explicit E and nu")
    nx, ny, nz = grid.nx, grid.ny, grid.nz
    NZ1, NY1, NX1 = nz + 1, ny + 1, nx + 1
    YP = -(-NY1 // 8) * 8
    XP = -(-NX1 // 128) * 128
    BZ = block_z
    nb = -(-NZ1 // BZ)
    L = BZ + 2 * _HALO
    ZPAD = _HALO + nb * BZ + 2 * _HALO

    stencil = _stencil_constants(_cell_matrix(grid, E, nu))

    def kernel(x_ref, o_ref):
        i = pl.program_id(0)

        def body(xs, acc, sem):
            z0 = i * BZ
            cps = [
                pltpu.make_async_copy(
                    # np.int32: bare Python ints lower as i64 constants
                    # under jax_enable_x64, which Mosaic rejects
                    x_ref.at[np.int32(c), pl.ds(z0, L), :, :],
                    xs.at[np.int32(c)], sem.at[np.int32(c)]
                )
                for c in range(3)
            ]
            for cp in cps:
                cp.start()
            for cp in cps:
                cp.wait()

            # per-axis cell-existence indicators, kept THIN (broadcast
            # lazily) so they never occupy full-slab VMEM: cell
            # (z+cz, y+cy, x+cx) exists iff each coord ∈ [0, n*)
            gz = (
                jax.lax.broadcasted_iota(jnp.int32, (L, 1, XP), 0)
                + (z0 - _HALO)
            )
            gy = jax.lax.broadcasted_iota(jnp.int32, (1, YP, XP), 1)
            gx = jax.lax.broadcasted_iota(jnp.int32, (1, 1, XP), 2)

            def axis_mask(g, chi_c, n):
                c = g + chi_c
                return jnp.logical_and(c >= 0, c < n).astype(jnp.float32)

            mz = {c: axis_mask(gz, c, nz) for c in (-1, 0)}
            my = {c: axis_mask(gy, c, ny) for c in (-1, 0)}
            mx = {c: axis_mask(gx, c, nx) for c in (-1, 0)}

            def roll3(a, dz, dy, dx):
                if dz:
                    a = pltpu.roll(a, np.int32((L - dz) % L), 0)
                if dy:
                    a = pltpu.roll(a, np.int32((YP - dy) % YP), 1)
                if dx:
                    a = pltpu.roll(a, np.int32((XP - dx) % XP), 2)
                return a

            # in-place scratch accumulators: keeps the unrolled dataflow's
            # live set bounded (pure-SSA accumulation blew past the VMEM
            # stack limit — Mosaic kept every intermediate alive)
            for a in range(3):
                acc[a, :, :, :] = jnp.zeros((L, YP, XP), jnp.float32)
            for delta, terms in stencil.items():
                xb = [roll3(xs[c], *delta) for c in range(3)]
                for chi, Kab in terms:
                    m = mz[chi[0]] * my[chi[1]]  # (L, YP, XP) broadcast
                    m = m * mx[chi[2]]
                    for b in range(3):
                        mxb = m * xb[b]
                        for a in range(3):
                            ka = float(Kab[a, b])
                            if ka != 0.0:
                                acc[a, :, :, :] += ka * mxb

            for c in range(3):
                o_ref[c, :, :, :] = acc[c, _HALO : _HALO + BZ, :, :]

        pl.run_scoped(
            body,
            xs=pltpu.VMEM((3, L, YP, XP), jnp.float32),
            acc=pltpu.VMEM((3, L, YP, XP), jnp.float32),
            sem=pltpu.SemaphoreType.DMA((3,)),
        )

    @jax.jit
    def matvec(x):
        xp = jnp.pad(
            x,
            (
                (0, 0),
                (_HALO, ZPAD - NZ1 - _HALO),
                (0, YP - NY1),
                (0, XP - NX1),
            ),
        ).astype(jnp.float32)
        out = pl.pallas_call(
            kernel,
            grid=(nb,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
            out_specs=pl.BlockSpec(
                (3, BZ, YP, XP), lambda i: (0, i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct((3, nb * BZ, YP, XP), jnp.float32),
        )(xp)
        return out[:, :NZ1, :NY1, :NX1].astype(x.dtype)

    return matvec
