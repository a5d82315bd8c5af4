"""N-gram (prompt-lookup) speculative decoding (models/ar.py
``_decode_advance_spec``): bit-identical tokens AND logprob statistics vs the
plain greedy loop — drafting/acceptance must never change outputs, only the
number of verify passes.  (No reference counterpart — the reference decodes one
host-driven token at a time, /root/reference/valle/models/valle_ar.py:141-171.)
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from valle2_tpu.config import ConfigValle
from valle2_tpu.models.ar import (ValleAR, _decode_advance_spec,
                                  _decode_prefill, _ngram_draft, _spec_gate)


def cfg(**kw):
    base = dict(d_model=48, n_heads=2, dim_feedforward=96, num_layers=2,
                num_audio_tokens=96, vocab_size=24, dropout=0.0,
                temperature=0.0, num_beams=1, max_audio_len=18,
                norm='LayerNorm', bucket_sizes=(16, 32),
                matmul_precision='highest')
    base.update(kw)
    return ConfigValle(**base)


def decode_pair(base_cfg, items, **spec_kw):
    """Greedy-decode items with and without speculation, SAME params."""
    plain = ValleAR(base_cfg)
    spec_cfg = dataclasses.replace(base_cfg, speculative_k=4, **spec_kw)
    spec = ValleAR(spec_cfg, params=plain.params)
    tokens = [t for t, _ in items]
    codes = [c for _, c in items]
    return (plain.generate_batch(tokens, codes, bucket=False),
            spec.generate_batch(tokens, codes, bucket=False))


class TestSpecParity:
    def _items(self, n, seed=0):
        rs = np.random.RandomState(seed)
        return [(rs.randint(0, 24, (3 + 2 * i,)), rs.randint(0, 96, (2 + i, 8)))
                for i in range(n)]

    def test_tokens_identical_fixed_length(self):
        """ignore_eos: every row runs to max_audio_len; per-row accept counts
        diverge (different prompts) — steps advance per row."""
        want, got = decode_pair(cfg(ignore_eos=True), self._items(3))
        for w, g in zip(want, got):
            np.testing.assert_array_equal(np.asarray(g), np.asarray(w))

    def test_tokens_identical_with_eos(self):
        """EOS freezing: bias the EOS logit so rows terminate early at
        different steps; a committed draft EOS must freeze the row exactly
        where the plain loop would."""
        base = cfg()
        plain = ValleAR(base)
        # Nudge EOS upward via an injected proj bias (linear() applies 'b'
        # when present): random logits are diffuse, so rows hit EOS at
        # varying early steps instead of never.
        eos = plain.eos_token
        w = plain.params['proj']['w']
        b = jnp.zeros((w.shape[1],), w.dtype).at[eos].set(1.5)
        plain.params = {**plain.params,
                        'proj': {**plain.params['proj'], 'b': b}}
        spec = ValleAR(dataclasses.replace(base, speculative_k=4),
                       params=plain.params)
        items = self._items(3, seed=1)
        want = plain.generate_batch([t for t, _ in items],
                                    [c for _, c in items], bucket=False)
        got = spec.generate_batch([t for t, _ in items],
                                  [c for _, c in items], bucket=False)
        lens = set()
        for w, g in zip(want, got):
            np.testing.assert_array_equal(np.asarray(g), np.asarray(w))
            lens.add(len(np.asarray(w)))
        assert any(n < base.max_audio_len for n in lens), \
            'EOS bias did not shorten any row — test is vacuous'

    def test_tokens_identical_across_k_and_ngram(self):
        items = self._items(2, seed=2)
        base = cfg(ignore_eos=True)
        plain = ValleAR(base)
        want = plain.generate_batch([t for t, _ in items],
                                    [c for _, c in items], bucket=False)
        for k, g in [(2, 1), (3, 2), (6, 4)]:
            spec = ValleAR(dataclasses.replace(base, speculative_k=k,
                                               speculative_ngram=g),
                           params=plain.params)
            got = spec.generate_batch([t for t, _ in items],
                                      [c for _, c in items], bucket=False)
            for w, gg in zip(want, got):
                np.testing.assert_array_equal(np.asarray(gg), np.asarray(w))

    def test_asr_direction_parity(self):
        """direction='asr' (codes -> phonemes, swapped vocabs): spec greedy
        must match plain greedy — transcription is the natural greedy
        consumer of speculation."""
        base = cfg(direction='asr', ignore_eos=True)
        plain = ValleAR(base)
        spec = ValleAR(dataclasses.replace(base, speculative_k=4),
                       params=plain.params)
        rs = np.random.RandomState(14)
        # ASR source = first-codebook codes; target/prompt = phoneme ids.
        items = [(rs.randint(0, 96, (6,)), rs.randint(0, 24, (3, 8)))]
        want = plain.generate_batch([t for t, _ in items],
                                    [c for _, c in items], bucket=False)
        got = spec.generate_batch([t for t, _ in items],
                                  [c for _, c in items], bucket=False)
        np.testing.assert_array_equal(np.asarray(got[0]), np.asarray(want[0]))

    def test_logprob_statistics_match(self):
        """sum_logprobs feeds the beam pick; the spec path must accumulate the
        same per-token logprobs the plain loop does."""
        base = cfg(ignore_eos=True)
        plain = ValleAR(base)
        spec = ValleAR(dataclasses.replace(base, speculative_k=4),
                       params=plain.params)
        items = self._items(2, seed=3)
        tok = [jnp.asarray(t, jnp.int32) for t, _ in items]
        cds = [jnp.concatenate([jnp.array([plain.bos_token], jnp.int32),
                                jnp.asarray(c, jnp.int32)[:, 0]])
               for _, c in items]
        ttm = max(t.shape[0] for t in tok)
        pm = max(c.shape[0] for c in cds)
        args = (jnp.stack([jnp.pad(t, (0, ttm - t.shape[0])) for t in tok]),
                jnp.asarray([t.shape[0] for t in tok], jnp.int32),
                jnp.stack([jnp.pad(c, (0, pm - c.shape[0])) for c in cds]),
                jnp.asarray([c.shape[0] for c in cds], jnp.int32),
                jax.random.key(0))
        _, lp_plain, _ = plain._decode_jit(plain.params, *args)
        _, lp_spec, _ = spec._decode_jit(spec.params, *args)
        np.testing.assert_allclose(np.asarray(lp_spec), np.asarray(lp_plain),
                                   rtol=1e-5, atol=1e-5)

    def test_repetitive_model_accepts_multi_token_blocks(self):
        """A constant-output model (EOS-suppressed, one dominant token) is the
        best case for prompt-lookup: after the n-gram warmup every verify pass
        should commit the full block, so turns ≈ max_new / K, not max_new."""
        config = dataclasses.replace(cfg(ignore_eos=True), speculative_k=4)
        model = ValleAR(config)
        dom = 7
        w = model.params['proj']['w']
        b = jnp.zeros((w.shape[1],), w.dtype).at[dom].set(50.0)
        params = {**model.params,
                  'proj': {**model.params['proj'], 'b': b}}
        rs = np.random.RandomState(4)
        tokens = jnp.asarray(rs.randint(0, 24, (1, 5)), jnp.int32)
        codes = jnp.asarray(rs.randint(0, 96, (1, 4)), jnp.int32)
        state, tl_f, pl_f = _decode_prefill(
            params, tokens, jnp.asarray([5], jnp.int32), codes,
            jnp.asarray([4], jnp.int32), jax.random.key(0), config)
        final, turns = jax.jit(
            lambda p, s: _decode_advance_spec(p, s, tl_f, pl_f, config,
                                              tokens.shape[1], codes.shape[1])
        )(params, state)
        assert int(final.step[0]) == config.max_audio_len
        # 18 tokens at K=4: perfect acceptance after the first few solo turns
        # needs ~<=8 turns; a broken accept path would take 18.
        assert int(turns) <= 9, int(turns)
        row = np.asarray(final.codes[0, codes.shape[1]:])
        assert (row[:config.max_audio_len] == dom).all()


class TestSpecGate:
    def test_gate_rejects_beams(self):
        with pytest.raises(ValueError, match='num_beams'):
            _spec_gate(cfg(num_beams=2, speculative_k=4))

    def test_gate_allows_sampling(self):
        assert _spec_gate(cfg(temperature=1.0, speculative_k=4))

    def test_gate_allows_forced_fused(self):
        """The verify pass follows the fused gate (fused_verify_step) — a
        forced fused config is valid with speculation (r3: previously the
        XLA-only verify rejected it)."""
        assert _spec_gate(cfg(use_fused_decode=True, speculative_k=4))

    def test_gate_off_by_default(self):
        assert not _spec_gate(cfg())

    def test_gate_rejects_ngram_zero(self):
        with pytest.raises(ValueError, match='ngram'):
            _spec_gate(cfg(speculative_k=4, speculative_ngram=0))


class TestSpecFused:
    """Speculation through the fused whole-stack Pallas verify kernel
    (kernels/fused_decode.fused_verify_step): greedy tokens must be identical
    to the plain (non-speculative) loop — same bar as the XLA verify path."""

    def _items(self, n, seed=5):
        rs = np.random.RandomState(seed)
        return [(rs.randint(0, 24, (3 + 2 * i,)), rs.randint(0, 96, (2 + i, 8)))
                for i in range(n)]

    def test_fused_spec_tokens_identical(self):
        base = cfg(ignore_eos=True)
        plain = ValleAR(base)
        items = self._items(3)
        want = plain.generate_batch([t for t, _ in items],
                                    [c for _, c in items], bucket=False)
        spec = ValleAR(dataclasses.replace(base, speculative_k=4,
                                           use_fused_decode=True),
                       params=plain.params)
        got = spec.generate_batch([t for t, _ in items],
                                  [c for _, c in items], bucket=False)
        for w, g in zip(want, got):
            np.testing.assert_array_equal(np.asarray(g), np.asarray(w))

    def test_fused_spec_eos_freezing(self):
        """Committed draft EOS must freeze rows exactly as the plain loop —
        through the fused verify path."""
        base = cfg()
        plain = ValleAR(base)
        eos = plain.eos_token
        w = plain.params['proj']['w']
        b = jnp.zeros((w.shape[1],), w.dtype).at[eos].set(1.5)
        plain.params = {**plain.params,
                        'proj': {**plain.params['proj'], 'b': b}}
        spec = ValleAR(dataclasses.replace(base, speculative_k=4,
                                           use_fused_decode=True),
                       params=plain.params)
        items = self._items(3, seed=6)
        want = plain.generate_batch([t for t, _ in items],
                                    [c for _, c in items], bucket=False)
        got = spec.generate_batch([t for t, _ in items],
                                  [c for _, c in items], bucket=False)
        lens = set()
        for w_, g in zip(want, got):
            np.testing.assert_array_equal(np.asarray(g), np.asarray(w_))
            lens.add(len(np.asarray(w_)))
        assert any(n < base.max_audio_len for n in lens)

    def test_fused_spec_chunked_cache(self):
        """config.decode_chunk forces the chunked verify path (the streaming
        prefix-skip default); tokens unchanged."""
        base = cfg(ignore_eos=True)
        plain = ValleAR(base)
        items = self._items(2, seed=7)
        want = plain.generate_batch([t for t, _ in items],
                                    [c for _, c in items], bucket=False)
        spec = ValleAR(dataclasses.replace(base, speculative_k=4,
                                           use_fused_decode=True,
                                           decode_chunk=16),
                       params=plain.params)
        got = spec.generate_batch([t for t, _ in items],
                                  [c for _, c in items], bucket=False)
        for w, g in zip(want, got):
            np.testing.assert_array_equal(np.asarray(g), np.asarray(w))

    def test_fused_spec_logprobs_match(self):
        """sum_logprobs through the fused verify path match the plain loop's
        (same accumulation semantics)."""
        base = cfg(ignore_eos=True)
        plain = ValleAR(base)
        spec = ValleAR(dataclasses.replace(base, speculative_k=3,
                                           use_fused_decode=True),
                       params=plain.params)
        items = self._items(2, seed=8)
        tok = [jnp.asarray(t, jnp.int32) for t, _ in items]
        cds = [jnp.concatenate([jnp.array([plain.bos_token], jnp.int32),
                                jnp.asarray(c, jnp.int32)[:, 0]])
               for _, c in items]
        ttm = max(t.shape[0] for t in tok)
        pm = max(c.shape[0] for c in cds)
        args = (jnp.stack([jnp.pad(t, (0, ttm - t.shape[0])) for t in tok]),
                jnp.asarray([t.shape[0] for t in tok], jnp.int32),
                jnp.stack([jnp.pad(c, (0, pm - c.shape[0])) for c in cds]),
                jnp.asarray([c.shape[0] for c in cds], jnp.int32),
                jax.random.key(0))
        _, lp_plain, _ = plain._decode_jit(plain.params, *args)
        _, lp_spec, _ = spec._decode_jit(spec.params, *args)
        np.testing.assert_allclose(np.asarray(lp_spec), np.asarray(lp_plain),
                                   rtol=1e-4, atol=1e-4)


class TestSpecSampled:
    """temperature > 0: rejection sampling must reproduce the plain loop's
    output DISTRIBUTION exactly (bitwise parity is impossible — the rng draw
    pattern differs by construction)."""

    def test_dominant_model_sampled_matches_greedy(self):
        """A near-deterministic model (one dominant token, +50 logits): the
        sampled spec decode must emit the dominant token everywhere, like the
        plain sampled loop — catches gross acceptance/forcing bugs without
        statistics."""
        base = cfg(ignore_eos=True, temperature=1.0, max_audio_len=12)
        model = ValleAR(dataclasses.replace(base, speculative_k=4))
        dom = 5
        w = model.params['proj']['w']
        b = jnp.zeros((w.shape[1],), w.dtype).at[dom].set(50.0)
        model.params = {**model.params,
                        'proj': {**model.params['proj'], 'b': b}}
        rs = np.random.RandomState(7)
        out = model.generate_batch([rs.randint(0, 24, (4,))],
                                   [rs.randint(0, 96, (3, 8))], bucket=False)
        row = np.asarray(out[0])
        assert (row == dom).all(), row

    @staticmethod
    def _marginals(model, t, c, rows, seed):
        """One batched decode of ``rows`` identical prompts = ``rows`` iid
        sequence samples; per-position empirical marginals (T, vocab)."""
        outs = model.generate_batch([t] * rows, [c] * rows, bucket=False,
                                    rng=jax.random.key(seed))
        # Output trimming strips sampled EOS ids, so rows vary in length; pad
        # back with the EOS bucket (both arms trim identically, so marginals
        # stay comparable).
        T = model.config.max_audio_len
        eos = model.eos_token
        arr = np.stack([np.pad(np.asarray(o), (0, T - len(o)),
                               constant_values=eos)[:T] for o in outs])
        vocab = model.config.num_audio_tokens + 2
        m = np.zeros((T, vocab))
        for j in range(T):
            np.add.at(m[j], arr[:, j], 1.0)
        return m / arr.shape[0]

    def test_sampled_distribution_matches_plain(self):
        """Per-position total-variation distance between spec-sampled and
        plain-sampled marginals must sit at the plain-vs-plain sampling-noise
        level (512 iid sequences per arm, diffuse random-init logits — the
        rejection path fires constantly)."""
        base = cfg(ignore_eos=True, temperature=1.0, max_audio_len=4,
                   num_audio_tokens=8, top_k=0)
        plain = ValleAR(base)
        spec = ValleAR(dataclasses.replace(base, speculative_k=3,
                                           speculative_ngram=1),
                       params=plain.params)
        rs = np.random.RandomState(8)
        t, c = rs.randint(0, 24, (4,)), rs.randint(0, 8, (3, 8))
        rows = 512
        m_plain = self._marginals(plain, t, c, rows, seed=1)
        m_plain2 = self._marginals(plain, t, c, rows, seed=2)
        m_spec = self._marginals(spec, t, c, rows, seed=3)
        tv_noise = 0.5 * np.abs(m_plain - m_plain2).sum(axis=1)
        tv_spec = 0.5 * np.abs(m_spec - m_plain).sum(axis=1)
        # Same-distribution TV at n=512 over <=10 outcomes is ~0.05; a biased
        # accept/residual would shift whole-token mass (TV >> 0.15).
        assert tv_spec.max() < 0.15, (tv_spec, tv_noise)
        assert tv_spec.max() < max(0.08, 3.0 * tv_noise.max()), \
            (tv_spec, tv_noise)

    def test_sampled_topk_filter_respected(self):
        """top_k=1 sampling == greedy; the spec path must honor the filter
        (a residual that ignored filtering would emit off-support tokens)."""
        base = cfg(ignore_eos=True, temperature=1.0, top_k=1)
        plain = ValleAR(dataclasses.replace(base, temperature=0.0))
        spec = ValleAR(dataclasses.replace(base, speculative_k=4),
                       params=plain.params)
        rs = np.random.RandomState(9)
        items = [(rs.randint(0, 24, (4,)), rs.randint(0, 96, (3, 8)))]
        want = plain.generate_batch([t for t, _ in items],
                                    [c for _, c in items], bucket=False)
        got = spec.generate_batch([t for t, _ in items],
                                  [c for _, c in items], bucket=False)
        np.testing.assert_array_equal(np.asarray(got[0]), np.asarray(want[0]))


class TestSpecInteractions:
    def test_continuous_batcher_strips_spec(self):
        """ContinuousDecoder advances one token per row (speculation is a
        solo-decode feature) — a spec-enabled config must not leak into its
        geometry (the rows=1 prefill would pad K slots past the joint cache)
        and its greedy tokens still match the solo decode bit-for-bit."""
        from valle2_tpu.models.continuous import ContinuousDecoder
        base = cfg(ignore_eos=True)
        plain = ValleAR(base)
        spec_model = ValleAR(dataclasses.replace(base, speculative_k=4),
                             params=plain.params)
        rs = np.random.RandomState(5)
        t, c = rs.randint(0, 24, (4,)), rs.randint(0, 96, (3, 8))
        want = np.asarray(plain.generate_batch([t], [c], bucket=False)[0])
        cb = ContinuousDecoder(spec_model, n_slots=2, ttm=8, pm=8)
        slot = cb.join(t, c)
        got = []
        while not cb.finished(slot):
            got.extend(cb.advance(6).get(slot, ()))
        np.testing.assert_array_equal(np.asarray(got, np.int32), want)

    def test_decode_stream_keeps_plain_path(self):
        """Streaming keeps the plain one-token loop (segment-bounded advance);
        a spec config only adds unused cache slack — tokens unchanged."""
        from valle2_tpu.models.ar import DecodeStream
        base = cfg(ignore_eos=True)
        plain = ValleAR(base)
        spec_model = ValleAR(dataclasses.replace(base, speculative_k=4),
                             params=plain.params)
        rs = np.random.RandomState(6)
        t, c = rs.randint(0, 24, (4,)), rs.randint(0, 96, (3, 8))
        want = np.asarray(plain.generate_batch([t], [c], bucket=False)[0])
        stream = DecodeStream(spec_model, t, c, bucket=False)
        got = []
        while not stream.finished:
            got.extend(stream.advance(5))
        np.testing.assert_array_equal(np.asarray(got, np.int32), want)


class TestSpecPipeline:
    def test_fused_tts_pipeline_with_spec_matches_plain(self):
        """The fused single-dispatch TTS pipeline routes through _decode_fn,
        so speculative_k applies inside it: greedy waveforms must be
        bit-identical to the plain config (same AR tokens -> same NAR ->
        same codec)."""
        from valle2_tpu.config import ConfigValle
        from valle2_tpu.tts import ValleTTS
        base = ConfigValle(d_model=32, n_heads=2, dim_feedforward=64,
                           num_layers=2, max_audio_len=10, num_beams=1,
                           dropout=0.0, temperature=0.0,
                           bucket_sizes=(16, 32))
        plain = ValleTTS(base)
        spec = ValleTTS(dataclasses.replace(base, speculative_k=3),
                        ar=ValleAR(dataclasses.replace(base, speculative_k=3),
                                   params=plain.ar.params),
                        nar=plain.nar, codec=plain.codec)
        rs = np.random.RandomState(12)
        pt, pc = rs.randint(0, 70, (5,)), rs.randint(0, 1024, (6, 8))
        want = plain.synthesize_fused('hello there.', pt, pc)
        got = spec.synthesize_fused('hello there.', pt, pc)
        np.testing.assert_array_equal(got.waveform, want.waveform)

    def test_int8_weights_with_spec_matches_plain_int8(self):
        """speculative decode over the int8 weight-quantized view: greedy
        tokens must equal the plain int8 decode (the q-block step runs the
        same quantized linears)."""
        base = cfg(ignore_eos=True, weight_dtype='int8')
        plain = ValleAR(base)
        spec = ValleAR(dataclasses.replace(base, speculative_k=4),
                       params=plain.params)
        rs = np.random.RandomState(13)
        items = [(rs.randint(0, 24, (4,)), rs.randint(0, 96, (3, 8)))]
        want = plain.generate_batch([t for t, _ in items],
                                    [c for _, c in items], bucket=False)
        got = spec.generate_batch([t for t, _ in items],
                                  [c for _, c in items], bucket=False)
        np.testing.assert_array_equal(np.asarray(got[0]), np.asarray(want[0]))

    def test_int4_weights_with_spec_matches_plain_int4(self):
        """speculative decode over the int4 W4A16 view: greedy tokens equal
        the plain int4 decode — the q-block verify runs the same q4 linears
        (int4_matmul / fused _q4_dot)."""
        base = cfg(ignore_eos=True, weight_dtype='int4')
        plain = ValleAR(base)
        spec = ValleAR(dataclasses.replace(base, speculative_k=4),
                       params=plain.params)
        assert 'q4' in spec.decode_params['transformer']['attn']['qkv']
        rs = np.random.RandomState(14)
        items = [(rs.randint(0, 24, (4,)), rs.randint(0, 96, (3, 8)))]
        want = plain.generate_batch([t for t, _ in items],
                                    [c for _, c in items], bucket=False)
        got = spec.generate_batch([t for t, _ in items],
                                  [c for _, c in items], bucket=False)
        np.testing.assert_array_equal(np.asarray(got[0]), np.asarray(want[0]))


class TestSpecOnMesh:
    def test_sharded_spec_decode_matches_unmeshed_plain(self):
        """Speculative decode under the 8-way data shard_map (the multi-chip
        serving path): per-item tokens must equal the UNMESHED PLAIN greedy
        decode — speculation and meshing both bit-invisible."""
        from valle2_tpu.parallel import make_mesh
        mesh = make_mesh(data=8, model=1)
        base = cfg(ignore_eos=True)
        plain = ValleAR(base)
        spec_cfg = dataclasses.replace(base, speculative_k=4)
        meshed_spec = ValleAR(spec_cfg, params=plain.params, mesh=mesh)
        rs = np.random.RandomState(9)
        # 5 items: exercises the pad-to-axis-multiple path (5 -> 8 rows).
        items = [(rs.randint(0, 24, (3 + i,)), rs.randint(0, 96, (2 + i, 8)))
                 for i in range(5)]
        want = plain.generate_batch([t for t, _ in items],
                                    [c for _, c in items])
        got = meshed_spec.generate_batch([t for t, _ in items],
                                         [c for _, c in items])
        assert len(got) == 5
        for w, g in zip(want, got):
            np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


class TestNgramDraft:
    def test_draft_continues_latest_match(self):
        # Row: ... 5 6 [1 2 3] 9 8 ... 1 2 3  -> draft continues 9 8 after the
        # LATEST earlier [1 2 3].
        row = jnp.asarray([[4, 1, 2, 3, 7, 7, 1, 2, 3, 9, 8, 5, 1, 2, 3, 0, 0]],
                          jnp.int32)
        d = _ngram_draft(row, jnp.asarray([15]), 3, 2,
                         jnp.asarray([99], jnp.int32))
        np.testing.assert_array_equal(np.asarray(d), [[9, 8]])

    def test_no_match_falls_back(self):
        row = jnp.asarray([[1, 2, 3, 4, 5, 6, 0, 0]], jnp.int32)
        d = _ngram_draft(row, jnp.asarray([6]), 3, 3,
                         jnp.asarray([42], jnp.int32))
        np.testing.assert_array_equal(np.asarray(d), [[42, 42, 42]])
