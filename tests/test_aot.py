"""AOT executable cache (valle2_tpu/aot.py): compiled programs persist to disk
and a fresh wrapper (= a restarted process) loads them without re-compiling.

The torch reference has no compile step and no serving stack, so no analog
exists; this is the deployment layer above the persistent XLA compilation
cache (cold start in milliseconds instead of minutes — docs/serving.md)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from valle2_tpu import aot
from valle2_tpu.aot import CachedJit, cached_jit, enable_aot_cache, disable_aot_cache


@pytest.fixture()
def aot_dir(tmp_path):
    d = enable_aot_cache(tmp_path / 'aot')
    yield d
    disable_aot_cache()


def _files(d):
    from pathlib import Path
    return sorted(p.name for p in Path(d).glob('*.aotx'))


class TestCachedJitUnit:
    def test_disabled_is_plain_jit(self, tmp_path):
        disable_aot_cache()
        cj = cached_jit(lambda x: x * 2, tag='t0')
        out = cj(jnp.arange(4.0))
        np.testing.assert_array_equal(np.asarray(out), [0, 2, 4, 6])
        assert cj.n_compiles == 0 and cj.n_disk_loads == 0
        assert _files(tmp_path) == []

    def test_compile_writes_and_memoizes(self, aot_dir):
        cj = cached_jit(lambda x: x + 1, tag='t1')
        x = jnp.ones((8,))
        np.testing.assert_array_equal(np.asarray(cj(x)), np.full(8, 2.0))
        assert cj.n_compiles == 1
        assert len(_files(aot_dir)) == 1
        # same signature again: in-memory memo, no second compile/load
        cj(x)
        assert cj.n_compiles == 1 and cj.n_disk_loads == 0

    def test_fresh_instance_loads_from_disk(self, aot_dir):
        x = jnp.full((8,), 3.0)
        a = cached_jit(lambda v: v * v, tag='t2')
        ra = np.asarray(a(x))
        b = cached_jit(lambda v: v * v, tag='t2')   # "restarted process"
        rb = np.asarray(b(x))
        np.testing.assert_array_equal(ra, rb)
        assert b.n_compiles == 0 and b.n_disk_loads == 1

    def test_distinct_shapes_get_distinct_entries(self, aot_dir):
        cj = cached_jit(lambda x: x.sum(), tag='t3')
        cj(jnp.ones((4,)))
        cj(jnp.ones((8,)))
        assert cj.n_compiles == 2
        assert len(_files(aot_dir)) == 2

    def test_static_args_baked_and_keyed(self, aot_dir):
        cj = cached_jit(lambda x, *, n: x + n, tag='t4', static_argnames=('n',))
        x = jnp.zeros((4,))
        np.testing.assert_array_equal(np.asarray(cj(x, n=3)), np.full(4, 3.0))
        np.testing.assert_array_equal(np.asarray(cj(x, n=5)), np.full(4, 5.0))
        assert cj.n_compiles == 2                     # statics are key material
        fresh = cached_jit(lambda x, *, n: x + n, tag='t4', static_argnames=('n',))
        np.testing.assert_array_equal(np.asarray(fresh(x, n=5)), np.full(4, 5.0))
        assert fresh.n_compiles == 0 and fresh.n_disk_loads == 1

    def test_static_argnums_positional(self, aot_dir):
        cj = cached_jit(lambda x, n: x * n, tag='t5', static_argnums=(1,))
        np.testing.assert_array_equal(np.asarray(cj(jnp.ones(3), 4)),
                                      np.full(3, 4.0))
        fresh = cached_jit(lambda x, n: x * n, tag='t5', static_argnums=(1,))
        np.testing.assert_array_equal(np.asarray(fresh(jnp.ones(3), 4)),
                                      np.full(3, 4.0))
        assert fresh.n_disk_loads == 1

    def test_donated_args_roundtrip(self, aot_dir):
        cj = cached_jit(lambda st, y: (st + y, st * y), tag='t6',
                        donate_argnums=(0,))
        a, b = cj(jnp.ones((4,)), jnp.full((4,), 2.0))
        np.testing.assert_array_equal(np.asarray(a), np.full(4, 3.0))
        fresh = cached_jit(lambda st, y: (st + y, st * y), tag='t6',
                           donate_argnums=(0,))
        a2, b2 = fresh(jnp.ones((4,)), jnp.full((4,), 2.0))
        assert fresh.n_disk_loads == 1
        np.testing.assert_array_equal(np.asarray(a2), np.full(4, 3.0))
        np.testing.assert_array_equal(np.asarray(b2), np.full(4, 2.0))

    def test_pytree_and_rng_key_args(self, aot_dir):
        def fn(params, k):
            return {'o': params['w'] @ params['b'] + jax.random.uniform(k, (3,))}
        params = {'w': jnp.eye(3), 'b': jnp.ones((3,))}
        cj = cached_jit(fn, tag='t7')
        r1 = np.asarray(cj(params, jax.random.key(0))['o'])
        fresh = cached_jit(fn, tag='t7')
        r2 = np.asarray(fresh(params, jax.random.key(0))['o'])
        assert fresh.n_disk_loads == 1
        np.testing.assert_array_equal(r1, r2)

    def test_corrupt_file_recompiles_and_replaces(self, aot_dir):
        from pathlib import Path
        cj = cached_jit(lambda x: x - 1, tag='t8')
        x = jnp.ones((5,))
        cj(x)
        (path,) = Path(aot_dir).glob('t8-*.aotx')
        path.write_bytes(b'garbage')
        fresh = cached_jit(lambda x: x - 1, tag='t8')
        np.testing.assert_array_equal(np.asarray(fresh(x)), np.zeros(5))
        assert fresh.n_compiles == 1 and fresh.n_disk_loads == 0
        # valid again for the next "process"
        again = cached_jit(lambda x: x - 1, tag='t8')
        again(x)
        assert again.n_disk_loads == 1

    def test_key_depends_on_sources_and_extra(self, aot_dir, monkeypatch):
        cj = cached_jit(lambda x: x, tag='t9', extra_key='cfgA')
        x = jnp.ones((2,))
        k1 = cj._key((x,), {})
        cj._extra = 'cfgB'
        k2 = cj._key((x,), {})
        assert k1 != k2
        cj._extra = 'cfgA'
        monkeypatch.setitem(aot._state, 'pkg_hash', 'deadbeef')
        assert cj._key((x,), {}) != k1   # source change invalidates

    def test_broken_entry_falls_back_to_jit(self, aot_dir):
        cj = cached_jit(lambda x: x * 10, tag='t10')
        x = jnp.ones((4,))
        key = cj._key((x,), {})

        def broken(*a, **k):
            raise RuntimeError('stale executable')
        cj._memo[key] = broken
        np.testing.assert_array_equal(np.asarray(cj(x)), np.full(4, 10.0))
        assert cj.n_fallbacks == 1
        assert key not in cj._memo        # evicted

    def test_resolve_precedence(self, tmp_path, monkeypatch):
        from valle2_tpu.aot import resolve_aot_dir
        assert resolve_aot_dir(None, None) is None
        monkeypatch.setenv('VALLE2_AOT_CACHE', str(tmp_path / 'env'))
        assert resolve_aot_dir(None, 'fb').endswith('env')
        assert resolve_aot_dir(str(tmp_path / 'arg'), 'fb').endswith('arg')
        monkeypatch.delenv('VALLE2_AOT_CACHE')
        assert resolve_aot_dir(None, str(tmp_path / 'fb')).endswith('fb')


class TestAOTServingIntegration:
    def test_fused_pipeline_persists_and_reloads(self, aot_dir):
        from valle2_tpu.config import ConfigValle
        from valle2_tpu.tts import ValleTTS
        cfg = ConfigValle(d_model=32, n_heads=2, dim_feedforward=64,
                          num_layers=2, max_audio_len=12, num_beams=2,
                          dropout=0.0, temperature=0.0,
                          bucket_sizes=(32, 64, 128))
        rs = np.random.RandomState(0)
        pt = rs.randint(0, 70, (6,))
        pc = rs.randint(0, 1024, (8, 8))
        tts = ValleTTS(cfg)
        r1 = tts.synthesize_fused('hi.', pt, pc, rng=jax.random.key(0))
        assert isinstance(tts._fused_jit, CachedJit)
        assert tts._fused_jit.n_compiles == 1
        assert any(f.startswith('tts_fused-') for f in _files(aot_dir))

        # "restarted server": a fresh pipeline over the same config + weights
        tts2 = ValleTTS(cfg, ar=tts.ar, nar=tts.nar, codec=tts.codec)
        r2 = tts2.synthesize_fused('hi.', pt, pc, rng=jax.random.key(0))
        assert tts2._fused_jit.n_compiles == 0
        assert tts2._fused_jit.n_disk_loads == 1
        np.testing.assert_array_equal(r1.codes, r2.codes)
        np.testing.assert_array_equal(np.asarray(r1.waveform),
                                      np.asarray(r2.waveform))

    def test_train_step_persists_and_reloads(self, aot_dir):
        from valle2_tpu.config import ConfigValle
        from valle2_tpu.train import TrainState, make_optimizer, make_train_step
        from valle2_tpu.models.ar import init_params
        cfg = ConfigValle(d_model=32, n_heads=2, dim_feedforward=64,
                          num_layers=2, dropout=0.0)
        tx = make_optimizer(cfg)
        rs = np.random.RandomState(1)
        batch = {'tokens': jnp.asarray(rs.randint(0, 70, (2, 8)), jnp.int32),
                 'tokens_lens': jnp.asarray([8, 6], jnp.int32),
                 'codes': jnp.asarray(rs.randint(0, 1024, (2, 12)), jnp.int32),
                 'target': jnp.asarray(rs.randint(0, 1024, (2, 12)), jnp.int32),
                 'codes_lens': jnp.asarray([12, 9], jnp.int32)}

        def run(step):
            # fresh params per run: donate_argnums=(0,) consumes the state
            params = init_params(jax.random.key(0), cfg)
            state = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
            state, metrics = step(state, batch, jax.random.key(2))
            return float(metrics['loss'])

        s1 = make_train_step(cfg, 'ValleAR')
        l1 = run(s1)
        assert s1.n_compiles == 1
        s2 = make_train_step(cfg, 'ValleAR')
        l2 = run(s2)
        assert s2.n_compiles == 0 and s2.n_disk_loads == 1
        assert l1 == l2
