"""Profiling: the reference's 16-phase timer table + per-kernel device
timing (PROF_KERNEL analog) + JAX profiler hooks."""

from tpufem.perf.timers import PhaseTimers, PHASES
from tpufem.perf.kernels import device_trace, slope_time, time_lane_kernels

__all__ = ["PhaseTimers", "PHASES", "device_trace", "slope_time",
           "time_lane_kernels"]
