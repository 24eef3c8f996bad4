"""Profiling: the reference's 16-phase timer table + JAX profiler hooks."""

from tpufem.perf.timers import PhaseTimers, PHASES

__all__ = ["PhaseTimers", "PHASES"]
