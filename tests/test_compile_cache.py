"""Persistent compilation cache (valle2_tpu/compile_cache.py).

Covers: directory resolution precedence, entries actually written on enable,
and the feature's whole point — a FRESH PROCESS with the same cache dir reuses
the serialized executables instead of recompiling (asserted structurally: the
second run adds zero new cache entries, i.e. every compilation hit).
"""

import os
import subprocess
import sys

import jax
import pytest

from valle2_tpu.compile_cache import enable_compilation_cache, resolve_cache_dir


@pytest.fixture
def restore_cache_config():
    keys = ('jax_enable_compilation_cache', 'jax_compilation_cache_dir',
            'jax_persistent_cache_min_compile_time_secs',
            'jax_compilation_cache_max_size')
    old = {k: getattr(jax.config, k) for k in keys}
    yield
    for k, v in old.items():
        jax.config.update(k, v)


class TestResolution:
    def test_explicit_arg_wins(self, monkeypatch):
        monkeypatch.setenv('VALLE2_COMPILE_CACHE', '/env/dir')
        assert resolve_cache_dir('/arg/dir', fallback='/cfg/dir') == '/arg/dir'

    def test_env_beats_config_fallback(self, monkeypatch):
        monkeypatch.setenv('VALLE2_COMPILE_CACHE', '/env/dir')
        assert resolve_cache_dir(None, fallback='/cfg/dir') == '/env/dir'

    def test_config_fallback(self, monkeypatch):
        monkeypatch.delenv('VALLE2_COMPILE_CACHE', raising=False)
        assert resolve_cache_dir(None, fallback='/cfg/dir') == '/cfg/dir'

    def test_disabled_when_all_empty(self, monkeypatch):
        monkeypatch.delenv('VALLE2_COMPILE_CACHE', raising=False)
        assert resolve_cache_dir(None, fallback='') is None
        assert resolve_cache_dir('', fallback=None) is None

    def test_expanduser(self, monkeypatch):
        monkeypatch.delenv('VALLE2_COMPILE_CACHE', raising=False)
        got = resolve_cache_dir('~/cc')
        assert got is not None and not got.startswith('~')

    def test_disabled_enable_is_noop(self, monkeypatch):
        monkeypatch.delenv('VALLE2_COMPILE_CACHE', raising=False)
        assert enable_compilation_cache(None, fallback='') is None


class TestEnable:
    def test_entries_written(self, tmp_path, restore_cache_config, monkeypatch):
        monkeypatch.delenv('VALLE2_COMPILE_CACHE', raising=False)
        path = enable_compilation_cache(tmp_path / 'cc', min_compile_time_s=0.0)
        assert path == str(tmp_path / 'cc')
        # A constant unique to this test keeps the key distinct from any other
        # compilation this process has done under the conftest-wide cache.
        f = jax.jit(lambda x: (x * 31.337).sum())
        f(jax.numpy.ones((64, 64))).block_until_ready()
        entries = list((tmp_path / 'cc').iterdir())
        assert entries, 'enable_compilation_cache persisted nothing'

    def test_enable_after_first_compile_takes_effect(
            self, tmp_path, restore_cache_config, monkeypatch):
        """JAX binds the persistent cache lazily on the first compile and then
        ignores `jax_compilation_cache_dir` updates; enable_compilation_cache
        must reset the handle so a late enable (any warm process — the test
        suite itself has compiled plenty by now) still lands entries."""
        monkeypatch.delenv('VALLE2_COMPILE_CACHE', raising=False)
        # Ensure the persistent-cache handle is bound to some other dir.
        enable_compilation_cache(tmp_path / 'first', min_compile_time_s=0.0)
        jax.jit(lambda x: (x * 17.117).sum())(
            jax.numpy.ones((64, 64))).block_until_ready()
        enable_compilation_cache(tmp_path / 'second', min_compile_time_s=0.0)
        jax.jit(lambda x: (x * 19.119).sum())(
            jax.numpy.ones((64, 64))).block_until_ready()
        assert list((tmp_path / 'second').iterdir()), \
            'cache-dir switch after first compile was silently ignored'


_PROBE = """
import pathlib, sys
sys.path.insert(0, {repo!r})
import os
os.environ['JAX_PLATFORMS'] = 'cpu'
import jax
jax.config.update('jax_platforms', 'cpu')
from valle2_tpu.compile_cache import enable_compilation_cache
assert enable_compilation_cache({cache!r}, min_compile_time_s=0.0)
import jax.numpy as jnp
f = jax.jit(lambda x: jnp.tanh(x * 7.25) @ x.T)
f(jnp.ones((96, 96))).block_until_ready()
print('ok')
"""


class TestCrossProcessReuse:
    def test_second_process_hits(self, tmp_path):
        repo = str(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        cache = str(tmp_path / 'cc')
        probe = _PROBE.format(repo=repo, cache=cache)

        def run():
            env = {k: v for k, v in os.environ.items()
                   if k != 'VALLE2_COMPILE_CACHE'}
            r = subprocess.run([sys.executable, '-c', probe], env=env,
                               capture_output=True, text=True, timeout=300)
            assert r.returncode == 0, r.stderr[-2000:]
            assert 'ok' in r.stdout

        run()
        names = sorted(p.name for p in (tmp_path / 'cc').iterdir())
        assert names, 'first process persisted nothing'
        run()
        # Identical program + options + backend => identical keys: a second
        # process that compiles anything would ADD entries; reuse adds none.
        assert sorted(p.name for p in (tmp_path / 'cc').iterdir()) == names
