"""Pallas fused-kernel tests (interpreter mode on CPU).

The kernel must match the XLA structured path (itself validated against
the unstructured assembler) across sizes, block splits, and BC-driven
states — including the ghost-row masking at slab seams.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

import tpufem.structured.pallas2d as p2d
from tpufem.forms import asym_damage_psi
from tpufem.structured import StructuredGrid2D

E, NU = 1.0e6, 0.3


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    orig = pl.pallas_call

    def interp(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    monkeypatch.setattr(p2d.pl, "pallas_call", interp)


def _grid(nx, ny):
    return StructuredGrid2D(
        nx=nx, ny=ny, hx=1 / nx, hy=1 / ny, bs=2,
        energy_density=lambda g, c: asym_damage_psi(
            0.5 * (g + g.T), c["d"], E, NU
        ),
        field_kinds={"d": "vertex"},
    )


@pytest.mark.parametrize(
    "nx,ny,br",
    [(13, 9, 8), (16, 16, 8), (7, 30, 16), (40, 12, 8)],
)
def test_matches_xla_structured(nx, ny, br):
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.normal(size=(2, ny + 1, nx + 1)).astype(np.float32) * 1e-3)
    d = jnp.asarray(rng.uniform(0, 1, (ny + 1, nx + 1)).astype(np.float32))
    pal = p2d.make_residual_kernel(nx, ny, 1 / nx, 1 / ny, E, NU,
                                   block_rows=br)
    r_pal = np.asarray(pal(u, d))
    r_ref = np.asarray(_grid(nx, ny).residual(u, {"d": d}))
    err = np.abs(r_pal - r_ref).max() / np.abs(r_ref).max()
    assert err < 2e-6, err


def test_zero_state_zero_residual():
    nx = ny = 12
    pal = p2d.make_residual_kernel(nx, ny, 1 / nx, 1 / ny, E, NU,
                                   block_rows=8)
    u = jnp.zeros((2, ny + 1, nx + 1), jnp.float32)
    d = jnp.full((ny + 1, nx + 1), 0.5, jnp.float32)
    r = np.asarray(pal(u, d))
    np.testing.assert_allclose(r, 0.0)


def test_bc_driven_state():
    """Linear ramp in x: residual nonzero only at the clamped columns
    (interior equilibrium of a uniform strain state)."""
    nx = ny = 16
    pal = p2d.make_residual_kernel(nx, ny, 1 / nx, 1 / ny, E, NU,
                                   block_rows=8)
    x = np.linspace(0, 0.01, nx + 1)[None, :]
    u = np.zeros((2, ny + 1, nx + 1), np.float32)
    u[0] = x
    d = np.zeros((ny + 1, nx + 1), np.float32)
    r = np.asarray(pal(jnp.asarray(u), jnp.asarray(d)))
    interior = r[:, 1:-1, 1:-1]
    assert np.abs(interior).max() < 1e-3 * np.abs(r).max()
