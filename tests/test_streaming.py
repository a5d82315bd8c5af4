"""Streaming decode + streaming synthesis.

The AR token stream must be segment-invariant (N bounded advances == one full
decode: the rng chain, EOS freezing, and logprob stats all ride in DecodeState),
and with lookahead >= max_audio_len the streamed waveform must equal the fused
single-dispatch pipeline bit-for-bit.  (The reference has no incremental
inference; its host-driven loop is /root/reference/valle/models/valle_ar.py:141-171.)
"""

import dataclasses

import jax
import numpy as np
import pytest

from valle2_tpu.config import ConfigValle
from valle2_tpu.models.ar import DecodeStream, ValleAR
from valle2_tpu.tts import ValleTTS


def tiny_cfg(**kw):
    base = dict(d_model=32, n_heads=2, dim_feedforward=64, num_layers=2,
                max_audio_len=12, num_beams=1, dropout=0.0, temperature=0.0,
                bucket_sizes=(32, 64, 128))
    base.update(kw)
    return ConfigValle(**base)


class TestDecodeStream:
    def test_segmented_advance_matches_full_decode(self):
        model = ValleAR(tiny_cfg(), seed=0)
        rs = np.random.RandomState(0)
        tokens = rs.randint(0, 70, (7,))
        pcodes = rs.randint(0, 1024, (6, 8))
        rng = jax.random.key(3)
        want = np.asarray(model.generate(tokens, pcodes, rng=rng))

        stream = DecodeStream(model, tokens, pcodes, rng=rng)
        got = []
        while not stream.finished:
            got.extend(stream.advance(3))
        np.testing.assert_array_equal(np.asarray(got, np.int32), want)

    def test_single_advance_matches_full_decode(self):
        model = ValleAR(tiny_cfg(), seed=1)
        rs = np.random.RandomState(1)
        tokens = rs.randint(0, 70, (5,))
        pcodes = rs.randint(0, 1024, (4, 8))
        rng = jax.random.key(9)
        want = np.asarray(model.generate(tokens, pcodes, rng=rng))
        stream = DecodeStream(model, tokens, pcodes, rng=rng)
        got = stream.advance(10_000)
        assert stream.finished
        np.testing.assert_array_equal(got, want)

    def test_segmented_advance_with_decode_unroll(self):
        """decode_unroll > 1: advance() rounds its limit to unroll multiples and
        still reproduces the full decode exactly (the loop body runs unroll
        steps per turn, so an un-rounded limit would overshoot)."""
        model = ValleAR(tiny_cfg(decode_unroll=4, max_audio_len=11), seed=3)
        rs = np.random.RandomState(3)
        tokens = rs.randint(0, 70, (5,))
        pcodes = rs.randint(0, 1024, (4, 8))
        rng = jax.random.key(21)
        want = np.asarray(model.generate(tokens, pcodes, rng=rng))
        stream = DecodeStream(model, tokens, pcodes, rng=rng)
        got = []
        while not stream.finished:
            new = stream.advance(3)          # rounds up to 4
            assert stream.steps_done % 4 == 0 or stream.finished
            got.extend(new)
        np.testing.assert_array_equal(np.asarray(got, np.int32), want)

    def test_streaming_validates_eagerly(self):
        """Bad chunk/lookahead args raise at CALL time (a deferred generator
        with chunk_frames=0 would spin forever)."""
        from valle2_tpu.tts import ValleTTS
        tts = ValleTTS(tiny_cfg())
        rs = np.random.RandomState(8)
        pt, pc = rs.randint(0, 70, (4,)), rs.randint(0, 1024, (5, 8))
        with pytest.raises(ValueError, match='chunk_frames'):
            tts.synthesize_streaming('x.', pt, pc, chunk_frames=0)
        with pytest.raises(ValueError, match='lookahead'):
            tts.synthesize_streaming('x.', pt, pc, lookahead_frames=-1)

    def test_streaming_follows_params_rebind(self):
        """tts.ar params rebinding (e.g. load()) must reach the cached
        streaming model — stale weights would silently produce wrong audio."""
        from valle2_tpu.tts import ValleTTS
        tts = ValleTTS(tiny_cfg())
        rs = np.random.RandomState(9)
        pt, pc = rs.randint(0, 70, (4,)), rs.randint(0, 1024, (5, 8))
        list(tts.synthesize_streaming('a.', pt, pc))     # warm the cache
        fresh = ValleAR(tiny_cfg(), seed=123)
        tts.ar.params = fresh.params                      # rebind (as load does)
        got = np.concatenate(
            list(tts.synthesize_streaming('a.', pt, pc)) or
            [np.zeros(0, np.float32)])
        tts2 = ValleTTS(tiny_cfg(), ar=ValleAR(tiny_cfg(), params=fresh.params))
        want = np.concatenate(
            list(tts2.synthesize_streaming('a.', pt, pc)) or
            [np.zeros(0, np.float32)])
        np.testing.assert_array_equal(got, want)

    def test_requires_single_beam(self):
        model = ValleAR(tiny_cfg(num_beams=2), seed=0)
        with pytest.raises(AssertionError):
            DecodeStream(model, np.zeros((3,), np.int32),
                         np.zeros((2, 8), np.int32))

    def test_sampled_stream_is_segment_invariant(self):
        """Temperature > 0: the rng chain rides in the state, so segmentation
        must not change the sampled tokens either."""
        model = ValleAR(tiny_cfg(temperature=1.0), seed=2)
        rs = np.random.RandomState(2)
        tokens = rs.randint(0, 70, (6,))
        pcodes = rs.randint(0, 1024, (5, 8))
        rng = jax.random.key(17)
        s1 = DecodeStream(model, tokens, pcodes, rng=rng)
        one = s1.advance(10_000)
        s2 = DecodeStream(model, tokens, pcodes, rng=rng)
        many = []
        while not s2.finished:
            many.extend(s2.advance(2))
        np.testing.assert_array_equal(np.asarray(many, np.int32), one)


class TestStreamingSynthesis:
    def test_full_lookahead_equals_fused(self):
        cfg = tiny_cfg()
        tts = ValleTTS(cfg)
        rs = np.random.RandomState(5)
        pt = rs.randint(0, 70, (6,))
        pc = rs.randint(0, 1024, (7, 8))
        rng = jax.random.key(0)
        fused = tts.synthesize_fused('hello.', pt, pc, rng=rng)
        chunks = list(tts.synthesize_streaming(
            'hello.', pt, pc, chunk_frames=4,
            lookahead_frames=cfg.max_audio_len, rng=rng))
        assert len(chunks) == 1            # everything finalized at the end
        np.testing.assert_allclose(chunks[0], fused.waveform, atol=2e-5)

    def test_incremental_chunks_cover_all_frames(self):
        cfg = tiny_cfg()
        tts = ValleTTS(cfg)
        rs = np.random.RandomState(6)
        pt = rs.randint(0, 70, (5,))
        pc = rs.randint(0, 1024, (6, 8))
        rng = jax.random.key(1)
        n_frames = len(np.asarray(
            ValleAR(cfg, params=tts.ar.params).generate(
                np.concatenate([pt, tts.tokenizer('go on.')]), pc, rng=rng)))
        chunks = list(tts.synthesize_streaming('go on.', pt, pc, chunk_frames=3,
                                               lookahead_frames=2, rng=rng))
        assert len(chunks) >= 2            # emitted incrementally
        total = np.concatenate(chunks)
        assert total.shape[0] == n_frames * 320
        assert np.isfinite(total).all()

    def test_streamed_tokens_match_fused_codes(self):
        """The streamed AR token sequence is the fused pipeline's first-layer
        code sequence (segment-invariance end-to-end)."""
        cfg = tiny_cfg()
        tts = ValleTTS(cfg)
        rs = np.random.RandomState(7)
        pt = rs.randint(0, 70, (4,))
        pc = rs.randint(0, 1024, (5, 8))
        rng = jax.random.key(2)
        fused = tts.synthesize_fused('yes.', pt, pc, rng=rng)
        chunks = list(tts.synthesize_streaming('yes.', pt, pc, chunk_frames=3,
                                               lookahead_frames=1, rng=rng))
        total = np.concatenate(chunks)
        assert total.shape[0] == fused.codes.shape[0] * 320


class TestNARWidthBucketing:
    def test_streamed_output_invariant_to_nar_width_buckets(self):
        """The per-chunk NAR pass runs over a bucketed prefix width (long-form
        TTFA optimization); positions past gen_lens are masked, so the
        emitted audio must be bit-identical whether the pass uses narrow
        buckets or the full max_audio_len width."""
        cfg_narrow = tiny_cfg(max_audio_len=48, bucket_sizes=(16, 32))
        cfg_full = tiny_cfg(max_audio_len=48, bucket_sizes=(64, 128))
        tts_n = ValleTTS(cfg_narrow)
        tts_f = ValleTTS(cfg_full, ar=ValleAR(cfg_full, params=tts_n.ar.params),
                         nar=tts_n.nar, codec=tts_n.codec)
        rs = np.random.RandomState(4)
        pt = rs.randint(0, 70, (5,))
        pc = rs.randint(0, 1024, (6, 8))
        a = np.concatenate(list(tts_n.synthesize_streaming(
            'a longer test sentence here.', pt, pc, chunk_frames=7,
            lookahead_frames=4)) or [np.zeros(0, np.float32)])
        b = np.concatenate(list(tts_f.synthesize_streaming(
            'a longer test sentence here.', pt, pc, chunk_frames=7,
            lookahead_frames=4)) or [np.zeros(0, np.float32)])
        # Masked positions contribute exactly zero, but XLA's reduction tiling
        # differs per buffer shape, so the codec waveform matches to f32
        # accumulation order (~1e-7), not bit-for-bit.
        np.testing.assert_allclose(a, b, atol=1e-6)
        assert len(a) > 0
