"""Root conftest: make tpufem importable and configure JAX for tests.

Tests run on CPU with 8 virtual devices — the TPU analog of
``mpirun -np 8`` without a cluster (SURVEY.md §4) — and float64 enabled
for bit-faithful comparisons with the reference's PETSc-double numerics.

Note: the session's sitecustomize imports jax at interpreter start (to
register the TPU PJRT plugin), so JAX_PLATFORMS set here via os.environ
is too late; the platform must be switched through jax.config. XLA_FLAGS
is still read at backend init, which has not happened yet.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# persistent XLA compilation cache: every test process re-traces the
# same programs (fresh Assembler pytrees -> new jit cache keys), and
# compilation dominates suite wall time; the disk cache cuts reruns
# from ~30 min to minutes.
# The dir is keyed by the host CPU signature: this microVM is snapshot-
# restored across machine generations, and XLA:CPU AOT executables
# compiled for a newer ISA SIGILL (or wedge the loader) on an older
# host. A host change now just starts a cold cache.


def _cpu_cache_dir():
    import hashlib
    sig = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("model name", "flags")):
                    sig = sig + line
                    if "flags" in line:
                        break
    except OSError:
        pass
    tag = hashlib.sha256(sig.encode()).hexdigest()[:12]
    return os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        f".jax_cache_cpu_{tag}")


jax.config.update("jax_compilation_cache_dir", _cpu_cache_dir())
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
