"""AOT executable cache — serving/training cold start in seconds, not minutes.

The persistent XLA compilation cache (compile_cache.py) removes *re*-compiles,
but a restarted process still pays tracing + lowering + a cache-served compile
round-trip per program — measured at **242 s** for a full serving warmup even
with a warm compile cache on this runtime (docs/serving.md "Warm-start").
This module removes that too: after a program compiles once, its *compiled
executable* is serialized to disk (`jax.experimental.serialize_executable`);
a later process deserializes and runs it directly — no trace, no lower, no
compile-server round trip (~ms to load on runtimes with local executable
finalization, e.g. the CPU tests).  Caveat, measured: on compile-server-backed
runtimes the *first execution* of a deserialized executable can pay the
server-side finalization that a compile-cache-served program amortizes —
154 s vs 29 s for the fused TTS program on the axon v5e runtime — so measure
with ``tools/coldstart_bench.py`` before enabling in production there
(docs/serving.md "Compile-count management").

The torch reference has no compile step and therefore no analog; this is the
TPU-native deployment story for the reference's serving gap (it has no serving
entry point at all — SURVEY §1 "no CLI/serving entry point exists").

Design:

- ``cached_jit(fn, tag=...)`` is a drop-in for ``jax.jit`` used at the serving
  call sites.  With no cache directory configured it IS just ``jax.jit`` (one
  attribute check of overhead).  With a directory enabled
  (``enable_aot_cache`` / CLI ``--aot-cache`` / ``$VALLE2_AOT_CACHE``), each
  distinct call signature maps to one ``.aotx`` file: load-or-compile, then
  memoize in-process.
- The cache key hashes everything that could change the executable or make a
  stale hit unsafe: jax/jaxlib versions, backend platform + device kind +
  device count, a content hash of every ``.py`` file in this package (an AOT
  cache is keyed by *signature*, not by HLO like the XLA persistent cache —
  hashing the sources is what makes reuse sound across code changes), the
  call-site ``tag``/``extra_key`` (config fingerprint), static argument
  values, and the pytree structure + shape/dtype/sharding of every dynamic
  argument.
- Every failure path (version skew, corrupt file, sharding mismatch, a
  backend that refuses deserialization) falls back to the plain jitted call
  and logs a warning — enabling the cache can never break serving.

Statics are *baked into* a compiled executable: a ``jax.stages.Compiled`` is
called with the dynamic arguments only, so the wrapper strips static
args/kwargs at call time (verified against jax 0.9 semantics).
"""

from __future__ import annotations

import hashlib
import io
import os
import pickle
import threading
from pathlib import Path

import jax

from .utils import log_info, log_warning

__all__ = ['enable_aot_cache', 'disable_aot_cache', 'aot_cache_dir',
           'resolve_aot_dir', 'cached_jit', 'CachedJit']

_ENV_VAR = 'VALLE2_AOT_CACHE'

_lock = threading.Lock()
_state: dict = {'dir': None, 'pkg_hash': None}


def resolve_aot_dir(cache_dir: str | os.PathLike | None = None,
                    fallback: str | os.PathLike | None = None) -> str | None:
    """Same precedence as compile_cache.resolve_cache_dir:
    explicit arg > $VALLE2_AOT_CACHE > fallback; empty everywhere = disabled."""
    for candidate in (cache_dir, os.environ.get(_ENV_VAR), fallback):
        if candidate is not None and str(candidate):
            return str(Path(candidate).expanduser())
    return None


def enable_aot_cache(cache_dir: str | os.PathLike | None = None,
                     *, fallback: str | os.PathLike | None = None) -> str | None:
    """Activate the AOT executable cache process-wide; returns the directory
    in use (or None when disabled everywhere)."""
    d = resolve_aot_dir(cache_dir, fallback)
    if d is None:
        return None
    Path(d).mkdir(parents=True, exist_ok=True)
    with _lock:
        _state['dir'] = d
    log_info('AOT executable cache enabled at %s', d)
    return d


def disable_aot_cache() -> None:
    with _lock:
        _state['dir'] = None


def aot_cache_dir() -> str | None:
    return _state['dir']


def _package_hash() -> str:
    """Content hash of every .py file in this package — the part of the key
    that makes signature-keyed executable reuse sound across code changes."""
    with _lock:
        if _state['pkg_hash'] is not None:
            return _state['pkg_hash']
    root = Path(__file__).resolve().parent
    h = hashlib.sha256()
    for p in sorted(root.rglob('*.py')):
        h.update(str(p.relative_to(root)).encode())
        h.update(p.read_bytes())
    digest = h.hexdigest()[:16]
    with _lock:
        _state['pkg_hash'] = digest
    return digest


def _backend_key() -> str:
    dev = jax.devices()[0]
    return (f'{jax.__version__}|{getattr(jax, "jaxlib", jax).__version__}|'
            f'{dev.platform}|{getattr(dev, "device_kind", "?")}|'
            f'{jax.device_count()}|{jax.process_count()}')


def _leaf_sig(x) -> str:
    """shape|dtype|sharding of one dynamic argument leaf."""
    try:
        aval = jax.api_util.shaped_abstractify(x)
        sig = f'{aval.str_short()}'
    except Exception:
        sig = repr(type(x))
    shard = getattr(x, 'sharding', None)
    if shard is not None:
        sig += f'|{shard}'
    return sig


class CachedJit:
    """``jax.jit`` with a disk-backed compiled-executable cache.

    Behaves exactly like the jitted function when no cache dir is configured.
    ``static_argnums``/``static_argnames``/``donate_argnums`` are forwarded to
    ``jax.jit``; at call time statics are hashed into the key (they are baked
    into the executable) and stripped before invoking a loaded Compiled.
    """

    def __init__(self, fn, *, tag: str, extra_key: str = '',
                 static_argnums=(), static_argnames=(), **jit_kwargs):
        self._jitted = jax.jit(fn, static_argnums=static_argnums,
                               static_argnames=static_argnames, **jit_kwargs)
        self._tag = tag
        self._extra = extra_key
        self._static_nums = tuple(static_argnums) if not isinstance(
            static_argnums, int) else (static_argnums,)
        self._static_names = ((static_argnames,) if isinstance(
            static_argnames, str) else tuple(static_argnames))
        self._memo: dict[str, object] = {}
        self._memo_lock = threading.Lock()
        # instrumentation (tests + /stats)
        self.n_compiles = 0
        self.n_disk_loads = 0
        self.n_fallbacks = 0

    # -- key --------------------------------------------------------------

    def _split_static(self, args, kwargs):
        dyn_args = [a for i, a in enumerate(args) if i not in self._static_nums]
        sta = [(f'#{i}', args[i]) for i in self._static_nums if i < len(args)]
        dyn_kwargs = {}
        for k, v in kwargs.items():
            if k in self._static_names:
                sta.append((k, v))
            else:
                dyn_kwargs[k] = v
        return tuple(dyn_args), dyn_kwargs, sta

    def _key(self, args, kwargs) -> str:
        dyn_args, dyn_kwargs, sta = self._split_static(args, kwargs)
        leaves, treedef = jax.tree_util.tree_flatten((dyn_args, dyn_kwargs))
        h = hashlib.sha256()
        h.update(_backend_key().encode())
        h.update(_package_hash().encode())
        h.update(self._tag.encode())
        h.update(self._extra.encode())
        h.update(repr(sorted((k, repr(v)) for k, v in sta)).encode())
        h.update(str(treedef).encode())
        for leaf in leaves:
            h.update(_leaf_sig(leaf).encode())
        return h.hexdigest()[:24]

    def _path(self, cache_dir: str, key: str) -> Path:
        return Path(cache_dir) / f'{self._tag}-{key}.aotx'

    # -- load / compile ---------------------------------------------------

    def _load(self, cache_dir: str, key: str):
        path = self._path(cache_dir, key)
        if not path.exists():
            return None
        try:
            from jax.experimental import serialize_executable as se
            with path.open('rb') as f:
                blob = pickle.load(f)
            loaded = se.deserialize_and_load(blob['payload'], blob['in_tree'],
                                             blob['out_tree'])
            self.n_disk_loads += 1
            log_info('AOT cache hit: %s', path.name)
            return loaded
        except Exception as e:  # corrupt file / version skew / backend refusal
            log_warning('AOT cache load failed for %s (%s: %s) — recompiling',
                        path.name, type(e).__name__, e)
            try:
                path.unlink()
            except OSError:
                pass
            return None

    def _compile_and_save(self, cache_dir: str, key: str, args, kwargs):
        compiled = self._jitted.lower(*args, **kwargs).compile()
        self.n_compiles += 1
        try:
            from jax.experimental import serialize_executable as se
            payload, in_tree, out_tree = se.serialize(compiled)
            buf = io.BytesIO()
            pickle.dump({'payload': payload, 'in_tree': in_tree,
                         'out_tree': out_tree, 'tag': self._tag}, buf)
            path = self._path(cache_dir, key)
            tmp = path.with_suffix(f'.tmp.{os.getpid()}')
            tmp.write_bytes(buf.getvalue())
            os.replace(tmp, path)          # atomic publish
            log_info('AOT cache wrote %s (%.1f MB)', path.name,
                     len(buf.getvalue()) / 1e6)
        except Exception as e:
            log_warning('AOT cache serialize failed for %s (%s: %s) — '
                        'executable not persisted', self._tag,
                        type(e).__name__, e)
        return compiled

    # -- call -------------------------------------------------------------

    def __call__(self, *args, **kwargs):
        cache_dir = _state['dir']
        if cache_dir is None:
            return self._jitted(*args, **kwargs)
        try:
            key = self._key(args, kwargs)
        except Exception as e:
            log_warning('AOT key construction failed for %s (%s: %s) — '
                        'plain jit', self._tag, type(e).__name__, e)
            self.n_fallbacks += 1
            return self._jitted(*args, **kwargs)
        with self._memo_lock:
            entry = self._memo.get(key)
        if entry is None:
            entry = self._load(cache_dir, key)
            if entry is None:
                entry = self._compile_and_save(cache_dir, key, args, kwargs)
            with self._memo_lock:
                self._memo[key] = entry
        dyn_args, dyn_kwargs, _ = self._split_static(args, kwargs)
        try:
            return entry(*dyn_args, **dyn_kwargs)
        except Exception as e:
            # Stale/incompatible executable (e.g. sharding or layout drift):
            # drop it and serve through the plain jitted path.
            log_warning('AOT executable call failed for %s (%s: %s) — '
                        'falling back to jit', self._tag, type(e).__name__, e)
            self.n_fallbacks += 1
            with self._memo_lock:
                self._memo.pop(key, None)
            return self._jitted(*args, **kwargs)

    # Parity with jax.jit surface used elsewhere in the package.
    def lower(self, *args, **kwargs):
        return self._jitted.lower(*args, **kwargs)

    def __getattr__(self, name):
        # Everything else (_cache_size, trace, eval_shape, ...) delegates to
        # the underlying jitted function.  Only reached for names not set in
        # __init__ (Python falls back to __getattr__ on miss).
        return getattr(self._jitted, name)


def cached_jit(fn, *, tag: str, extra_key: str = '', **kwargs) -> CachedJit:
    """Drop-in for ``jax.jit`` at call sites whose executables should persist
    across processes.  ``tag`` names the program (file prefix); ``extra_key``
    carries anything the closure bakes in that the arguments don't show —
    pass the config fingerprint."""
    return CachedJit(fn, tag=tag, extra_key=extra_key, **kwargs)


def config_key(config) -> str:
    """Stable fingerprint of a ConfigValle for ``extra_key`` — jitted model
    fns close over the config, so it must participate in the cache key."""
    import json
    try:
        return hashlib.sha256(json.dumps(
            config.to_dict(), sort_keys=True, default=str).encode()
        ).hexdigest()[:16]
    except Exception:
        return hashlib.sha256(repr(config).encode()).hexdigest()[:16]
