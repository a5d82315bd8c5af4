"""Persistent XLA compilation cache — serving/training cold-start fix.

The torch reference has no compile step, so it has no cold-start problem;
the TPU design does: everything under ``jit`` is traced and compiled once,
and the fused-decode serving stack costs minutes of XLA/Mosaic compilation
on first use (BENCH_r02: 180 s at 204M).  ``TTSServer.warmup()`` moves that
cost to startup, but every process restart pays it again.

This module turns on JAX's persistent compilation cache: compiled
executables are serialized to a directory keyed by (HLO module, compile
options, backend version), so a restarted server — or a re-run CLI, or a
resumed training job — *deserializes* instead of recompiling.  The cache is
content-addressed and safe to share between configs; stale entries are
simply never hit, and ``max_size_bytes`` bounds the directory with LRU
eviction.

Resolution order for the directory (first non-empty wins):

1. explicit ``cache_dir`` argument (CLI ``--compile-cache``),
2. ``$VALLE2_COMPILE_CACHE``,
3. the caller's fallback (entry points pass ``config.compile_cache_dir``).

Empty/None everywhere = disabled (JAX's default behavior, nothing written).

Call this BEFORE the first jit execution in the process.  Calling later
still takes effect for subsequent compilations (JAX initializes its
persistent-cache handle lazily on first compile and then ignores config
updates, so this module explicitly resets the handle when the directory
changes) — but anything already compiled is not retroactively cached.
"""

from __future__ import annotations

import os
from pathlib import Path

from .utils import log_info

__all__ = ['enable_compilation_cache', 'resolve_cache_dir']

_ENV_VAR = 'VALLE2_COMPILE_CACHE'


def resolve_cache_dir(cache_dir: str | os.PathLike | None = None,
                      fallback: str | os.PathLike | None = None) -> str | None:
    """Apply the documented precedence; returns None when disabled."""
    for candidate in (cache_dir, os.environ.get(_ENV_VAR), fallback):
        if candidate is not None and str(candidate):
            return str(Path(candidate).expanduser())
    return None


def enable_compilation_cache(cache_dir: str | os.PathLike | None = None,
                             *,
                             fallback: str | os.PathLike | None = None,
                             min_compile_time_s: float = 1.0,
                             max_size_bytes: int = -1) -> str | None:
    """Enable the persistent cache; returns the directory in use (or None).

    ``min_compile_time_s``: skip persisting compilations cheaper than this —
    dispatch-sized jits churn the directory for no restart-time win.  The
    serving/training programs this exists for compile in seconds-to-minutes.
    ``max_size_bytes``: LRU-bound the directory; -1 = unbounded.
    """
    path = resolve_cache_dir(cache_dir, fallback)
    if path is None:
        return None
    Path(path).mkdir(parents=True, exist_ok=True)
    import jax
    changed = jax.config.jax_compilation_cache_dir != path
    jax.config.update('jax_enable_compilation_cache', True)
    jax.config.update('jax_compilation_cache_dir', path)
    if changed:
        # JAX binds the persistent cache to a directory lazily on the first
        # compile and ignores later config updates; drop the handle so the
        # new directory actually takes effect in already-warm processes.
        from jax.experimental.compilation_cache import compilation_cache
        compilation_cache.reset_cache()
    jax.config.update('jax_persistent_cache_min_compile_time_secs',
                      float(min_compile_time_s))
    jax.config.update('jax_compilation_cache_max_size', int(max_size_bytes))
    log_info('Persistent compilation cache: %s', path)
    return path
