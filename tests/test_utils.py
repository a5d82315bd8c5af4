"""Audio utility tests (jittable resampler, normalize, WAV I/O)."""

import numpy as np
import pytest

from valle2_tpu import utils


class TestResample:
    @pytest.mark.parametrize('sr_in,sr_out', [(16000, 24000), (22050, 24000),
                                              (48000, 24000)])
    def test_tone_frequency_preserved(self, sr_in, sr_out):
        t = np.arange(sr_in) / sr_in
        x = np.sin(2 * np.pi * 440 * t).astype(np.float32)
        y = np.asarray(utils.resample(x, sr_in, sr_out))
        assert abs(len(y) - sr_out) <= 2
        seg = y[1000:-1000]
        crossings = np.sum(np.diff(np.signbit(seg)) != 0)
        freq = crossings / 2 / (len(seg) / sr_out)
        assert abs(freq - 440) < 2.0, freq

    def test_amplitude_preserved_on_upsample(self):
        """The fixed cutoff (0.5/max) must not attenuate or alias the passband."""
        sr_in, sr_out = 16000, 24000
        t = np.arange(sr_in) / sr_in
        x = np.sin(2 * np.pi * 440 * t).astype(np.float32)
        y = np.asarray(utils.resample(x, sr_in, sr_out))
        peak = np.abs(y[1000:-1000]).max()
        assert 0.97 < peak < 1.03, peak

    def test_identity(self):
        x = np.random.RandomState(0).randn(500).astype(np.float32)
        np.testing.assert_array_equal(np.asarray(utils.resample(x, 16000, 16000)), x)


class TestNormalizeAudio:
    def test_mono_mix_and_peak(self):
        stereo = np.stack([np.full(100, 0.2), np.full(100, 0.6)]).astype(np.float32)
        out = np.asarray(utils.normalize_audio(stereo, 16000, 16000))
        np.testing.assert_allclose(out, 1.0, atol=1e-6)   # (0.4 peak) / 0.4

    def test_resamples_to_target(self):
        x = np.random.RandomState(1).randn(22050).astype(np.float32)
        out = utils.normalize_audio(x, 22050, 24000)
        assert abs(out.shape[0] - 24000) <= 2


class TestWav:
    def test_save_load_roundtrip(self, tmp_path):
        wav = (0.5 * np.sin(np.linspace(0, 100, 8000))).astype(np.float32)
        p = tmp_path / 'a.wav'
        utils.save_wav(p, wav, 16000)
        out = np.asarray(utils.load_audio(p, target_sr=16000))
        want = wav / np.abs(wav).max()
        np.testing.assert_allclose(out, want, atol=2e-3)
