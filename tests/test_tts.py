"""End-to-end pipeline tests: TTS (text→waveform) and batched ASR."""

import jax
import numpy as np
import pytest

from valle2_tpu.config import ConfigValle
from valle2_tpu.tts import ValleASRPipeline, ValleTTS


def tiny_cfg(**kw):
    base = dict(d_model=32, n_heads=2, dim_feedforward=64, num_layers=2,
                max_audio_len=12, num_beams=2, dropout=0.0, temperature=0.0,
                bucket_sizes=(32, 64, 128))
    base.update(kw)
    return ConfigValle(**base)


class TestValleTTS:
    @pytest.fixture(scope='class')
    def tts(self):
        return ValleTTS(tiny_cfg())

    def test_synthesize_produces_waveform(self, tts):
        rs = np.random.RandomState(0)
        prompt_tokens = rs.randint(0, 70, (6,))
        prompt_codes = rs.randint(0, 1024, (8, 8))
        res = tts.synthesize('hi.', prompt_tokens, prompt_codes)
        assert res.waveform.ndim == 1
        assert len(res.waveform) % 320 == 0
        assert res.codes.shape[1] == 8
        assert res.rtf > 0
        assert set(res.timings) == {'frontend', 'ar_decode', 'nar_refine',
                                    'codec_decode'}

    def test_call_with_prompt_audio(self, tts):
        rs = np.random.RandomState(1)
        prompt_audio = rs.randn(4800).astype(np.float32)
        res = tts('ok.', prompt_audio, 24000, 'a b.')
        assert res.waveform.ndim == 1 and len(res.waveform) > 0

    def test_greedy_deterministic(self, tts):
        rs = np.random.RandomState(2)
        pt = rs.randint(0, 70, (5,))
        pc = rs.randint(0, 1024, (6, 8))
        a = tts.synthesize('go.', pt, pc, rng=jax.random.key(0))
        b = tts.synthesize('go.', pt, pc, rng=jax.random.key(5))
        np.testing.assert_array_equal(a.codes, b.codes)


class TestValleASR:
    def test_batch_transcribe_matches_solo(self):
        asr = ValleASRPipeline(tiny_cfg(vocab_size=70))
        rs = np.random.RandomState(3)
        audios = [rs.randn(4800).astype(np.float32),
                  rs.randn(7200).astype(np.float32)]
        batch = asr.batch_transcribe(audios, [24000, 24000])
        assert len(batch) == 2
        solo0 = asr.transcribe(audios[0], 24000)
        assert batch[0] == solo0
        for text in batch:
            assert isinstance(text, str)       # default output: English text
        # output='phonemes' exposes the raw ARPAbet stream; its inversion is
        # exactly the text output.
        phon = asr.batch_transcribe(audios, [24000, 24000], output='phonemes')
        from valle2_tpu.data.frontend import phonemes_to_text
        assert [phonemes_to_text(p) for p in phon] == batch
        with pytest.raises(ValueError, match='output'):
            asr.batch_transcribe(audios, [24000, 24000], output='words')


class TestFusedPipeline:
    def test_fused_matches_staged_greedy(self):
        tts = ValleTTS(tiny_cfg())
        rs = np.random.RandomState(5)
        pt = rs.randint(0, 70, (6,))
        pc = rs.randint(0, 1024, (7, 8))
        staged = tts.synthesize('hello.', pt, pc)
        fused = tts.synthesize_fused('hello.', pt, pc)
        np.testing.assert_array_equal(fused.codes, staged.codes)
        np.testing.assert_allclose(fused.waveform, staged.waveform, atol=2e-5)

    def test_fused_bucket_invariant(self):
        tts = ValleTTS(tiny_cfg())
        rs = np.random.RandomState(6)
        pt = rs.randint(0, 70, (4,))
        pc = rs.randint(0, 1024, (5, 8))
        a = tts.synthesize_fused('go.', pt, pc, bucket=True)
        b = tts.synthesize_fused('go.', pt, pc, bucket=False)
        np.testing.assert_array_equal(a.codes, b.codes)

    def test_fused_sampled_path_runs(self):
        import dataclasses
        tts = ValleTTS(dataclasses.replace(tiny_cfg(), temperature=1.0))
        rs = np.random.RandomState(7)
        res = tts.synthesize_fused('yes.', rs.randint(0, 70, (4,)),
                                   rs.randint(0, 1024, (5, 8)))
        assert res.waveform.ndim == 1
        assert res.codes.shape[1] == 8

    def test_empty_batch_returns_empty(self):
        tts = ValleTTS(tiny_cfg())
        assert tts.batch_synthesize([], [], []) == []

    def test_batch_synthesize_matches_singles(self):
        tts = ValleTTS(tiny_cfg())
        rs = np.random.RandomState(9)
        texts = ['one.', 'two two.', 'three.']
        pts = [rs.randint(0, 70, (n,)) for n in (4, 7, 3)]
        pcs = [rs.randint(0, 1024, (n, 8)) for n in (5, 8, 4)]
        batch = tts.batch_synthesize(texts, pts, pcs)
        assert len(batch) == 3
        for text, pt, pc, got in zip(texts, pts, pcs, batch):
            solo = tts.synthesize_fused(text, pt, pc)
            np.testing.assert_array_equal(got.codes, solo.codes)
            np.testing.assert_allclose(got.waveform, solo.waveform, atol=2e-5)
