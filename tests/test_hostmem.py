"""Arena allocator (native/hostmem.c): correctness under NumPy.

The allocator is installed by ``import tpufem`` (PyDataMem_SetHandler);
these tests exercise the paths that differ from the default allocator —
large mmap blocks, calloc zeroing of RECYCLED blocks, realloc across
the libc/mmap threshold — and the stats/trim control surface.
"""

import numpy as np
import pytest

from tpufem import hostmem

pytestmark = pytest.mark.skipif(
    not hostmem.install(), reason="hostmem extension unavailable"
)


def test_large_alloc_value_integrity():
    for dtype in (np.int32, np.float64, np.int8):
        a = np.full(3_000_000, 7, dtype=dtype)
        assert (a == 7).all()
        a[::1000] = 9
        assert (a[::1000] == 9).all() and (a[1::1000] == 7).all()


def test_calloc_zeroing_on_recycled_block():
    # dirty a big block, free it, then np.zeros of the same class must
    # still be all-zero (the arena memsets recycled blocks on calloc)
    a = np.full(4_000_000, -1, np.float64)
    del a
    z = np.zeros(4_000_000, np.float64)
    assert not z.any()


def test_resize_across_threshold():
    # small (libc path) -> large (mmap path) and back
    b = np.arange(1000)
    big = np.resize(b, 3_000_000)
    assert (big[:1000] == b).all()
    small = np.resize(big, 500)
    assert (small == b[:500]).all()


def test_reuse_and_stats():
    s0 = hostmem.stats()
    for _ in range(4):
        a = np.empty(5_000_000, np.float64)
        a[0] = 1.0
        del a
    s1 = hostmem.stats()
    assert s1["n_reuse"] > s0["n_reuse"]  # free list actually recycles
    hostmem.trim()
    assert hostmem.stats()["cached_bytes"] == 0


def test_many_shapes_stress():
    rng = np.random.default_rng(0)
    for _ in range(100):
        n = int(rng.integers(1, 2_000_000))
        a = np.ones(n)
        assert a.sum() == n
