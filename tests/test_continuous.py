"""Continuous batching (models/continuous.py): concurrent sessions share one
batched decode loop, each row at its own depth.

The parity surface: every session's GREEDY tokens must be bit-identical to
its solo ``ValleAR.generate`` decode, regardless of join order, co-tenants,
or when it joined (rows are mathematically independent; masks and per-row
positions make the shared program exact).  The reference has no batched or
incremental inference at all (/root/reference/valle/models/valle_ar.py:141-171
is a host-driven batch-1 loop).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from valle2_tpu.config import ConfigValle
from valle2_tpu.models.ar import ValleAR
from valle2_tpu.models.continuous import BatcherFull, ContinuousDecoder
from valle2_tpu.ops import KVCache, transformer_decode_step, transformer_init


def tiny_cfg(**kw):
    base = dict(d_model=32, n_heads=2, dim_feedforward=64, num_layers=2,
                max_audio_len=12, num_beams=1, dropout=0.0, temperature=0.0,
                bucket_sizes=(32, 64, 128))
    base.update(kw)
    return ConfigValle(**base)


def solo(model, tokens, pcodes):
    return np.asarray(model.generate(tokens, pcodes,
                                     rng=jax.random.key(model.config.seed)))


def drain(cb, slots):
    """advance() until every slot in ``slots`` is finished; returns the
    accumulated tokens per slot."""
    got = {s: [] for s in slots}
    for _ in range(200):
        out = cb.advance(4)
        for s, new in out.items():
            if s in got:
                got[s].extend(new)
        if all(cb.finished(s) for s in slots):
            return {s: np.asarray(v, np.int32) for s, v in got.items()}
    raise AssertionError('batcher did not finish in 200 advances')


class TestPerRowDecodeStep:
    """ops.transformer.transformer_decode_step with a per-row index vector."""

    def _setup(self, b=3, quant=False):
        key = jax.random.key(0)
        d, h, L, S = 32, 2, 2, 16
        p = transformer_init(key, L, d, h, d * 2, adaptive_norm=False)
        cache = KVCache.zeros(L, b, h, S, d // h,
                              jnp.int8 if quant else jnp.float32)
        # Pre-fill some slots so attention has context.
        k1, k2, k3 = jax.random.split(jax.random.key(1), 3)
        x = jax.random.normal(k3, (b, 1, d))
        return p, cache, x, h

    @pytest.mark.parametrize('quant', [False, True])
    def test_vector_index_equals_scalar(self, quant):
        """All rows at the same position: vector index == scalar index."""
        p, cache, x, h = self._setup(quant=quant)
        idx = 5
        y_s, c_s = transformer_decode_step(p, x, h, cache, jnp.int32(idx))
        y_v, c_v = transformer_decode_step(
            p, x, h, cache, jnp.full((x.shape[0],), idx, jnp.int32))
        np.testing.assert_allclose(np.asarray(y_v), np.asarray(y_s),
                                   rtol=1e-6, atol=1e-6)
        for a, b_ in zip(jax.tree.leaves(c_v), jax.tree.leaves(c_s)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))

    def test_distinct_rows_equal_solo_rows(self):
        """Rows at DIFFERENT positions equal per-row batch-1 scalar steps."""
        p, cache, x, h = self._setup(b=3)
        idx = jnp.asarray([2, 7, 11], jnp.int32)
        y_v, c_v = transformer_decode_step(p, x, h, cache, idx)
        for r in range(3):
            row_cache = jax.tree.map(lambda a: a[:, r:r + 1], cache)
            y_r, c_r = transformer_decode_step(
                p, x[r:r + 1], h, row_cache, idx[r])
            np.testing.assert_allclose(np.asarray(y_v[r]), np.asarray(y_r[0]),
                                       rtol=1e-6, atol=1e-6)
            for a, b_ in zip(jax.tree.leaves(c_v), jax.tree.leaves(c_r)):
                np.testing.assert_allclose(np.asarray(a[:, r]),
                                           np.asarray(b_[:, 0]),
                                           rtol=1e-6, atol=1e-6)


class TestContinuousDecoder:
    def _prompts(self, n, seed=0):
        rs = np.random.RandomState(seed)
        return [(rs.randint(0, 70, (rs.randint(4, 9),)),
                 rs.randint(0, 1024, (rs.randint(3, 8), 8))) for _ in range(n)]

    def test_joint_greedy_equals_solo(self):
        model = ValleAR(tiny_cfg(), seed=0)
        prompts = self._prompts(3)
        want = [solo(model, t, c) for t, c in prompts]
        cb = ContinuousDecoder(model, n_slots=3)
        slots = [cb.join(t, c) for t, c in prompts]
        got = drain(cb, slots)
        for s, w in zip(slots, want):
            np.testing.assert_array_equal(got[s], w)

    def test_staggered_joins(self):
        """A session joining mid-flight decodes exactly as if it were solo."""
        model = ValleAR(tiny_cfg(), seed=1)
        (ta, ca), (tb, cb_codes) = self._prompts(2, seed=3)
        want_a, want_b = solo(model, ta, ca), solo(model, tb, cb_codes)
        cb = ContinuousDecoder(model, n_slots=2)
        sa = cb.join(ta, ca)
        got_a = list(cb.advance(5).get(sa, []))
        sb = cb.join(tb, cb_codes)
        got_b = []
        while not (cb.finished(sa) and cb.finished(sb)):
            out = cb.advance(4)
            got_a.extend(out.get(sa, []))
            got_b.extend(out.get(sb, []))
        np.testing.assert_array_equal(np.asarray(got_a, np.int32), want_a)
        np.testing.assert_array_equal(np.asarray(got_b, np.int32), want_b)

    def test_release_and_slot_reuse(self):
        model = ValleAR(tiny_cfg(), seed=2)
        (ta, ca), (tc, cc) = self._prompts(2, seed=7)
        want_c = solo(model, tc, cc)
        cb = ContinuousDecoder(model, n_slots=1)
        sa = cb.join(ta, ca)
        cb.advance(3)
        cb.release(sa)                      # abort mid-decode
        assert cb.free_slots() == 1
        sc = cb.join(tc, cc)
        assert sc == sa                     # same row, fully overwritten
        got = drain(cb, [sc])
        np.testing.assert_array_equal(got[sc], want_c)

    def test_batcher_full_and_geometry_errors(self):
        model = ValleAR(tiny_cfg(), seed=0)
        cb = ContinuousDecoder(model, n_slots=1, ttm=16, pm=16)
        t, c = self._prompts(1)[0]
        cb.join(t, c)
        with pytest.raises(BatcherFull):
            cb.join(t, c)
        cb2 = ContinuousDecoder(model, n_slots=1, ttm=4, pm=16)
        with pytest.raises(ValueError, match='exceed'):
            cb2.join(np.zeros(10, np.int32), c)

    def test_requires_single_beam(self):
        model = ValleAR(tiny_cfg(num_beams=2), seed=0)
        with pytest.raises(ValueError, match='num_beams'):
            ContinuousDecoder(model, n_slots=2)

    def test_advance_empty_is_noop(self):
        model = ValleAR(tiny_cfg(), seed=0)
        cb = ContinuousDecoder(model, n_slots=2)
        assert cb.advance(8) == {}

    def test_decode_unroll_roundtrip(self):
        """decode_unroll > 1 advances in unroll-sized turns; tokens unchanged."""
        model = ValleAR(tiny_cfg(decode_unroll=4, max_audio_len=11), seed=3)
        t, c = self._prompts(1, seed=5)[0]
        want = solo(model, t, c)
        cb = ContinuousDecoder(model, n_slots=2)
        s = cb.join(t, c)
        got = drain(cb, [s])
        np.testing.assert_array_equal(got[s], want)

    def test_fused_joint_equals_fused_solo(self):
        """Joint decode through the per-row fused kernel (interpret mode on
        CPU) matches each session's solo fused decode."""
        cfg = tiny_cfg(use_fused_decode=True, max_audio_len=8)
        model = ValleAR(cfg, seed=5)
        prompts = self._prompts(2, seed=11)
        want = [solo(model, t, c) for t, c in prompts]
        cb = ContinuousDecoder(model, n_slots=2, ttm=16, pm=16)
        assert cb._use_fused
        slots = [cb.join(t, c) for t, c in prompts]
        got = drain(cb, slots)
        for s, w in zip(slots, want):
            np.testing.assert_array_equal(got[s], w)

    def test_fused_staggered_join(self):
        """A session joining a fused joint loop mid-flight still matches its
        solo fused decode (per-row indices + chunk clamp at the deepest row)."""
        cfg = tiny_cfg(use_fused_decode=True, max_audio_len=8)
        model = ValleAR(cfg, seed=6)
        (ta, ca), (tb, cbc) = self._prompts(2, seed=13)
        want_a, want_b = solo(model, ta, ca), solo(model, tb, cbc)
        cb = ContinuousDecoder(model, n_slots=2, ttm=16, pm=16)
        sa = cb.join(ta, ca)
        got_a = list(cb.advance(3).get(sa, []))
        sb = cb.join(tb, cbc)
        got_b = []
        while not (cb.finished(sa) and cb.finished(sb)):
            out = cb.advance(3)
            got_a.extend(out.get(sa, []))
            got_b.extend(out.get(sb, []))
        np.testing.assert_array_equal(np.asarray(got_a, np.int32), want_a)
        np.testing.assert_array_equal(np.asarray(got_b, np.int32), want_b)

    def test_sampled_equals_solo(self):
        """temperature > 0: per-row rng chains make SAMPLED sessions
        bit-identical to their solo decode too (each row consumes exactly the
        solo split-per-step sequence while active)."""
        model = ValleAR(tiny_cfg(temperature=1.0, top_k=50), seed=7)
        prompts = self._prompts(3, seed=21)
        keys = [jax.random.key(100 + i) for i in range(3)]
        want = [np.asarray(model.generate(t, c, rng=k))
                for (t, c), k in zip(prompts, keys)]
        cb = ContinuousDecoder(model, n_slots=3)
        slots = [cb.join(t, c, rng=k) for (t, c), k in zip(prompts, keys)]
        got = drain(cb, slots)
        for s, w in zip(slots, want):
            np.testing.assert_array_equal(got[s], w)

    def test_sampled_staggered_join_and_slot_reuse(self):
        """Sampled parity survives mid-flight joins and slot reuse: the
        session's chain is its own (adopted at insert), never the previous
        occupant's or the co-tenants'."""
        model = ValleAR(tiny_cfg(temperature=1.0, top_k=50), seed=8)
        prompts = self._prompts(3, seed=31)
        keys = [jax.random.key(200 + i) for i in range(3)]
        want = [np.asarray(model.generate(t, c, rng=k))
                for (t, c), k in zip(prompts, keys)]
        cb = ContinuousDecoder(model, n_slots=2)
        s0 = cb.join(*prompts[0], rng=keys[0])
        got0 = list(cb.advance(5).get(s0, []))
        s1 = cb.join(*prompts[1], rng=keys[1])
        got1 = []
        while not cb.finished(s0):
            out = cb.advance(4)
            got0.extend(out.get(s0, []))
            got1.extend(out.get(s1, []))
        cb.release(s0)
        s2 = cb.join(*prompts[2], rng=keys[2])     # reuses slot s0
        got2 = []
        while not (cb.finished(s1) and cb.finished(s2)):
            out = cb.advance(4)
            got1.extend(out.get(s1, []))
            got2.extend(out.get(s2, []))
        np.testing.assert_array_equal(np.asarray(got0, np.int32), want[0])
        np.testing.assert_array_equal(np.asarray(got1, np.int32), want[1])
        np.testing.assert_array_equal(np.asarray(got2, np.int32), want[2])

    def test_int8_kv_cache_runs(self):
        """Quantized KV cache: per-row writes cover the scale planes too."""
        model = ValleAR(tiny_cfg(kv_cache_dtype='int8'), seed=4)
        t, c = self._prompts(1, seed=9)[0]
        want = solo(model, t, c)
        cb = ContinuousDecoder(model, n_slots=2)
        s = cb.join(t, c)
        got = drain(cb, [s])
        np.testing.assert_array_equal(got[s], want)

    def test_int4_weights_equal_solo(self):
        """int4 W4A16 decode weights through the batcher (the shared quantized
        view, models/continuous.py) — greedy tokens bit-identical to the solo
        int4 decode, staggered joins included."""
        model = ValleAR(tiny_cfg(weight_dtype='int4'), seed=5)
        assert 'q4' in model.decode_params['transformer']['attn']['qkv']
        (ta, ca), (tb, cbc) = self._prompts(2, seed=11)
        want_a, want_b = solo(model, ta, ca), solo(model, tb, cbc)
        cb = ContinuousDecoder(model, n_slots=2)
        sa = cb.join(ta, ca)
        got_a = list(cb.advance(3).get(sa, []))
        sb = cb.join(tb, cbc)
        got_b = []
        while not (cb.finished(sa) and cb.finished(sb)):
            out = cb.advance(4)
            got_a.extend(out.get(sa, []))
            got_b.extend(out.get(sb, []))
        np.testing.assert_array_equal(np.asarray(got_a, np.int32), want_a)
        np.testing.assert_array_equal(np.asarray(got_b, np.int32), want_b)


class TestSpecContinuous:
    """Speculative continuous batching (``ContinuousDecoder(speculative=
    True)``): the joint loop runs n-gram verify turns — rows commit 1..K
    tokens per turn at independent depths — and every session's tokens stay
    bit-identical to its solo decode (plain greedy for temperature=0; the
    solo SPECULATIVE decode for sampled, which is itself distribution-exact
    vs plain sampling)."""

    def _prompts(self, n, seed=0):
        rs = np.random.RandomState(seed)
        return [(rs.randint(0, 70, (rs.randint(4, 9),)),
                 rs.randint(0, 1024, (rs.randint(3, 8), 8))) for _ in range(n)]

    def _models(self, seed=0, **kw):
        import dataclasses
        plain = ValleAR(tiny_cfg(**kw), seed=seed)
        spec = ValleAR(dataclasses.replace(plain.config, speculative_k=4),
                       params=plain.params)
        return plain, spec

    def test_spec_greedy_equals_solo(self):
        plain, spec = self._models(seed=10)
        prompts = self._prompts(3, seed=41)
        want = [solo(plain, t, c) for t, c in prompts]
        cb = ContinuousDecoder(spec, n_slots=3, speculative=True)
        slots = [cb.join(t, c) for t, c in prompts]
        got = drain(cb, slots)
        for s, w in zip(slots, want):
            np.testing.assert_array_equal(got[s], w)

    def test_spec_staggered_join_and_slot_reuse(self):
        """Rows at different depths committing different amounts per turn:
        join mid-flight, abort, reuse the row — every session still matches
        its solo decode."""
        plain, spec = self._models(seed=11)
        prompts = self._prompts(3, seed=43)
        want = [solo(plain, t, c) for t, c in prompts]
        cb = ContinuousDecoder(spec, n_slots=2, speculative=True)
        s0 = cb.join(*prompts[0])
        got0 = list(cb.advance(2).get(s0, []))
        s1 = cb.join(*prompts[1])
        got1 = []
        while not cb.finished(s0):
            out = cb.advance(1)
            got0.extend(out.get(s0, []))
            got1.extend(out.get(s1, []))
        cb.release(s0)
        s2 = cb.join(*prompts[2])                  # reuses slot s0
        got2 = []
        while not (cb.finished(s1) and cb.finished(s2)):
            out = cb.advance(2)
            got1.extend(out.get(s1, []))
            got2.extend(out.get(s2, []))
        np.testing.assert_array_equal(np.asarray(got0, np.int32), want[0])
        np.testing.assert_array_equal(np.asarray(got1, np.int32), want[1])
        np.testing.assert_array_equal(np.asarray(got2, np.int32), want[2])

    def test_spec_sampled_equals_solo_spec(self):
        """Sampled sessions: per-row 4-way-split chains reproduce the solo
        SPECULATIVE decode bit-for-bit (the strong determinism claim — the
        solo spec decode is in turn distribution-exact vs plain sampling,
        tests/test_spec_decode.py)."""
        _, spec = self._models(seed=12, temperature=1.0, top_k=50)
        prompts = self._prompts(3, seed=47)
        keys = [jax.random.key(300 + i) for i in range(3)]
        want = [np.asarray(spec.generate(t, c, rng=k))
                for (t, c), k in zip(prompts, keys)]
        cb = ContinuousDecoder(spec, n_slots=2, speculative=True)
        s0 = cb.join(*prompts[0], rng=keys[0])
        got0 = list(cb.advance(2).get(s0, []))
        s1 = cb.join(*prompts[1], rng=keys[1])
        got1 = []
        while not cb.finished(s0):
            out = cb.advance(1)
            got0.extend(out.get(s0, []))
            got1.extend(out.get(s1, []))
        cb.release(s0)
        s2 = cb.join(*prompts[2], rng=keys[2])
        got2 = []
        while not (cb.finished(s1) and cb.finished(s2)):
            out = cb.advance(2)
            got1.extend(out.get(s1, []))
            got2.extend(out.get(s2, []))
        np.testing.assert_array_equal(np.asarray(got0, np.int32), want[0])
        np.testing.assert_array_equal(np.asarray(got1, np.int32), want[1])
        np.testing.assert_array_equal(np.asarray(got2, np.int32), want[2])

    def test_spec_fused_joint(self):
        """Speculative joint loop through the fused q-block verify kernel
        (interpret mode on CPU) — per-row write indices at different depths,
        staggered join included."""
        plain, spec = self._models(seed=13, use_fused_decode=True,
                                   max_audio_len=8)
        (ta, ca), (tb, cbc) = self._prompts(2, seed=53)
        want_a, want_b = solo(plain, ta, ca), solo(plain, tb, cbc)
        cb = ContinuousDecoder(spec, n_slots=2, ttm=16, pm=16,
                               speculative=True)
        assert cb._use_fused
        sa = cb.join(ta, ca)
        got_a = list(cb.advance(1).get(sa, []))
        sb = cb.join(tb, cbc)
        got_b = []
        while not (cb.finished(sa) and cb.finished(sb)):
            out = cb.advance(1)
            got_a.extend(out.get(sa, []))
            got_b.extend(out.get(sb, []))
        np.testing.assert_array_equal(np.asarray(got_a, np.int32), want_a)
        np.testing.assert_array_equal(np.asarray(got_b, np.int32), want_b)

    def test_spec_requires_k(self):
        model = ValleAR(tiny_cfg(), seed=0)
        with pytest.raises(ValueError, match='speculative_k'):
            ContinuousDecoder(model, n_slots=2, speculative=True)
