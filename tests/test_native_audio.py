"""libvalle_audio (C++ via ctypes) vs the Python/JAX reference implementations."""

import numpy as np
import pytest

from valle2_tpu.native import audio as native
from valle2_tpu import utils

pytestmark = pytest.mark.skipif(not native.available(),
                                reason='libvalle_audio failed to build')


class TestWavIO:
    def test_roundtrip_native_write_native_read(self, tmp_path):
        wav = np.sin(np.linspace(0, 440 * 2 * np.pi, 16000)).astype(np.float32) * 0.7
        path = tmp_path / 'tone.wav'
        native.wav_write(path, wav, 16000)
        got, sr = native.wav_read(path)
        assert sr == 16000
        assert got.shape == wav.shape
        np.testing.assert_allclose(got, wav, atol=1.5 / 16384)  # 16-bit quantization

    def test_native_read_python_written(self, tmp_path):
        wav = np.random.RandomState(0).uniform(-0.5, 0.5, 8000).astype(np.float32)
        path = tmp_path / 'noise.wav'
        utils.save_wav(path, wav, 24000)                 # stdlib `wave` writer
        got, sr = native.wav_read(path)
        assert sr == 24000
        np.testing.assert_allclose(got, wav, atol=1.5 / 16384)

    def test_python_read_native_written(self, tmp_path):
        wav = np.random.RandomState(1).uniform(-0.9, 0.9, 4000).astype(np.float32)
        path = tmp_path / 'x.wav'
        native.wav_write(path, wav, 16000)
        got = np.asarray(utils.load_audio(path, target_sr=16000))
        # utils.load_audio peak-normalizes; compare normalized signals.
        want = wav / np.abs(wav).max()
        np.testing.assert_allclose(got, want, atol=2e-3)

    def test_read_missing_file_raises(self, tmp_path):
        with pytest.raises(IOError):
            native.wav_read(tmp_path / 'missing.wav')


class TestDSP:
    def test_mono_mix(self):
        stereo = np.stack([np.ones(100), np.zeros(100)], axis=1).astype(np.float32)
        mono = native.mono_mix(stereo)
        np.testing.assert_allclose(mono, 0.5)

    def test_peak_normalize(self):
        x = np.asarray([0.1, -0.25, 0.2], np.float32)
        np.testing.assert_allclose(native.peak_normalize(x),
                                   np.asarray([0.4, -1.0, 0.8]), atol=1e-6)

    @pytest.mark.parametrize('sr_in,sr_out', [(22050, 24000), (16000, 24000),
                                              (48000, 24000), (24000, 16000)])
    def test_resample_matches_jax_lowpass(self, sr_in, sr_out):
        """Native polyphase == the JAX conv resampler (same Hann-sinc design)."""
        t = np.arange(int(sr_in * 0.25)) / sr_in
        x = (np.sin(2 * np.pi * 440 * t) + 0.3 * np.sin(2 * np.pi * 1200 * t)
             ).astype(np.float32)
        got = native.resample(x, sr_in, sr_out)
        want = np.asarray(utils.resample(x, sr_in, sr_out))
        assert got.shape == want.shape
        # Ignore filter-length edges.
        edge = 256
        np.testing.assert_allclose(got[edge:-edge], want[edge:-edge], atol=5e-3)

    def test_resample_identity(self):
        x = np.random.RandomState(2).randn(1000).astype(np.float32)
        np.testing.assert_array_equal(native.resample(x, 16000, 16000), x)

    def test_resample_preserves_tone_frequency(self):
        """A 440 Hz tone stays 440 Hz after 16k → 24k (zero-crossing count)."""
        sr_in, sr_out = 16000, 24000
        t = np.arange(sr_in) / sr_in
        x = np.sin(2 * np.pi * 440 * t).astype(np.float32)
        y = native.resample(x, sr_in, sr_out)
        crossings = np.sum(np.diff(np.signbit(y[1000:-1000])) != 0)
        dur = (len(y) - 2000) / sr_out
        freq = crossings / 2 / dur
        assert abs(freq - 440) < 2.0, freq


class TestLoadAudio:
    def test_end_to_end_load(self, tmp_path):
        sr = 22050
        t = np.arange(sr) / sr
        wav = (0.5 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
        path = tmp_path / 'in.wav'
        native.wav_write(path, wav, sr)
        out = native.load_audio(path, target_sr=24000)
        assert abs(len(out) - 24000) <= 2
        assert abs(np.abs(out).max() - 1.0) < 1e-5   # peak-normalized
