"""Checkpoint/resume for solution state (npz-based; orbax optional).

The reference has no checkpointing (SURVEY.md §5.4) — runs are always
start-to-finish; its closest artifact is the OUT_COMP binary displacement
dump (MFEM/...cc:1671-1687). We add proper save/restore of the solver
state pytree so long Newton runs on large cases resume cleanly.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np


def save_checkpoint(path: str, state: Dict[str, Any]) -> None:
    """Save a flat dict of arrays/scalars to a .npz file."""
    flat = {}
    for k, v in state.items():
        flat[k] = np.asarray(v)
    np.savez_compressed(path, **flat)


def load_checkpoint(path: str) -> Dict[str, np.ndarray]:
    with np.load(path, allow_pickle=False) as data:
        return {k: data[k] for k in data.files}
