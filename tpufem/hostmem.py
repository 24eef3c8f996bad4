"""Host memory allocator for NumPy: mmap + MADV_POPULATE_WRITE arena.

On snapshot-restored microVMs (the TPU build hosts), first-touch page
faults on new anonymous memory cost ~440 us/page (~9 MB/s) while
kernel-side population (MADV_POPULATE_WRITE) runs at 1.7-2.9 GB/s.
NumPy's default allocator munmaps every large temporary, so host-side
mesh preprocessing re-pays the fault cost constantly — 90 s of np.full
in one profiled 6.2M-DoF lane-plan build. This module compiles and
installs native/hostmem.c via the documented PyDataMem_SetHandler API:
large blocks are mmapped, batch-populated once, and recycled through a
size-classed free list.

``install()`` is called from ``tpufem/__init__`` (set TPUFEM_NO_HOSTMEM
to disable); it is a silent no-op when the toolchain or kernel support
is missing — plain NumPy allocation still works everywhere.
"""

from __future__ import annotations

import os
import subprocess
import sysconfig
import threading
from typing import Optional

_lock = threading.Lock()
_mod = None
_failed = False
_installed = False

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SRC = os.path.join(_REPO, "native", "hostmem.c")
_SO = os.path.join(_REPO, "native", "build", "tpufem_hostmem.so")


def _load():
    global _mod, _failed
    with _lock:
        if _mod is not None or _failed:
            return _mod
        try:
            import numpy as np

            if not os.path.exists(_SO) or os.path.getmtime(
                _SO
            ) < os.path.getmtime(_SRC):
                os.makedirs(os.path.dirname(_SO), exist_ok=True)
                subprocess.run(
                    [
                        "cc", "-O3", "-shared", "-fPIC",
                        "-I" + sysconfig.get_paths()["include"],
                        "-I" + np.get_include(),
                        _SRC, "-o", _SO,
                    ],
                    check=True,
                    capture_output=True,
                )
            import importlib.util

            spec = importlib.util.spec_from_file_location(
                "tpufem_hostmem", _SO
            )
            mod = importlib.util.module_from_spec(spec)
            spec.loader.exec_module(mod)
            _mod = mod
        except Exception:
            _failed = True
            _mod = None
        return _mod


def install() -> bool:
    """Install the arena as NumPy's data-memory handler (idempotent).
    Returns True when active."""
    global _installed
    if os.environ.get("TPUFEM_NO_HOSTMEM"):
        return False
    mod = _load()
    if mod is None:
        return False
    if not _installed:
        mod.install()
        cap = os.environ.get("TPUFEM_HOSTMEM_CACHE_MB")
        if cap:
            mod.set_cache_cap(int(cap) << 20)
        _installed = True
    return True


def uninstall() -> None:
    global _installed
    if _installed and _mod is not None:
        _mod.uninstall()
        _installed = False


def stats() -> Optional[dict]:
    return _mod.stats() if _mod is not None else None


def trim() -> None:
    if _mod is not None:
        _mod.trim()
