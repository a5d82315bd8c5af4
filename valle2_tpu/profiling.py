"""Tracing, profiling and numerics-debugging hooks (SURVEY §5).

The reference has no profiler/sanitizer integration at all; the TPU-native analogs:

- ``trace(logdir)`` — jax.profiler device trace, viewable in TensorBoard's profile
  plugin (or Perfetto).
- ``annotate(name)`` — named region inside a trace (shows up on the TPU timeline).
- ``enable_nan_checks()`` — jax_debug_nans: every jitted function re-runs eagerly on
  NaN production and raises with the offending primitive (the TPU-world equivalent of
  a sanitizer; SURVEY §5 'race detection' row).
- ``log_compiles()`` — jax_log_compiles: surface recompilation storms (shape leaks
  from the bucketing collate show up here first).
"""

from __future__ import annotations

import contextlib
from pathlib import Path

import jax


@contextlib.contextmanager
def trace(logdir: str | Path):
    """Capture a device trace: ``with trace('logs/profile'): step(...)``."""
    jax.profiler.start_trace(str(logdir), create_perfetto_trace=False)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region for the profiler timeline (usable as decorator or context)."""
    return jax.profiler.TraceAnnotation(name)


def enable_nan_checks(enable: bool = True) -> None:
    jax.config.update('jax_debug_nans', enable)


def log_compiles(enable: bool = True) -> None:
    jax.config.update('jax_log_compiles', enable)


def memory_stats(device=None) -> dict:
    """Live/peak HBM usage for the given (default first) device."""
    device = device or jax.devices()[0]
    stats = device.memory_stats() or {}
    return {'bytes_in_use': stats.get('bytes_in_use', 0),
            'peak_bytes_in_use': stats.get('peak_bytes_in_use', 0),
            'bytes_limit': stats.get('bytes_limit', 0)}
