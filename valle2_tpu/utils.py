"""Logging + on-device audio utilities.

Equivalent of the reference utils (``/root/reference/valle/utils.py``): colored console
logging, tree/device helpers (JAX natives), and audio normalization — with resampling
implemented as a jittable polyphase sinc filter (one ``conv_general_dilated``) instead
of torchaudio on CPU, so audio prep can run on-chip (north-star item #3).
"""

from __future__ import annotations

import logging
import math
from functools import lru_cache
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger('valle2_tpu')
if not logger.handlers:
    _handler = logging.StreamHandler()
    try:
        import coloredlogs
        _handler.setFormatter(coloredlogs.ColoredFormatter(
            fmt='%(asctime)s :: %(levelname)s :: %(message)s',
            datefmt='%Y-%m-%d %H:%M:%S'))
    except ImportError:
        _handler.setFormatter(logging.Formatter(
            fmt='%(asctime)s :: %(levelname)s :: %(message)s',
            datefmt='%Y-%m-%d %H:%M:%S'))
    _handler.setLevel(logging.INFO)
    logger.addHandler(_handler)
    logger.setLevel(logging.INFO)
    logger.propagate = False


def log_debug(*args, **kwargs):
    logger.debug(*args, **kwargs)


def log_info(*args, **kwargs):
    logger.info(*args, **kwargs)


def log_warning(*args, **kwargs):
    logger.warning(*args, **kwargs)


def log_error(*args, **kwargs):
    logger.error(*args, **kwargs)


# The reference's tree_map/to_device (utils.py:46-59) exist natively in JAX.
tree_map = jax.tree.map


def to_device(x, device=None):
    return jax.device_put(x, device)


# ---------------------------------------------------------------------------
# Audio ops (jittable)
# ---------------------------------------------------------------------------

@lru_cache(maxsize=32)
def _sinc_kernel(l_up: int, m_down: int, width: int = 6) -> np.ndarray:
    """Hann-windowed sinc lowpass for rational L/M resampling (numpy, trace-time)."""
    # Cutoff at the dense grid's Nyquist (0.5) scaled by the rate ratio + rolloff.
    cutoff = 0.99 * 0.5 / max(l_up, m_down)
    half = width * max(l_up, m_down)
    n = np.arange(-half, half + 1, dtype=np.float64)
    taps = 2.0 * cutoff * np.sinc(2.0 * cutoff * n)
    window = 0.5 * (1.0 + np.cos(np.pi * n / half)) if half > 0 else np.ones_like(n)
    return (taps * window * l_up).astype(np.float32)


def resample(wav: jax.Array, orig_sr: int, target_sr: int) -> jax.Array:
    """Polyphase sinc resample of a (..., T) waveform — jittable, one TPU conv.

    Output length = ceil(T * target / orig), matching torchaudio's convention.
    """
    if orig_sr == target_sr:
        return wav
    g = math.gcd(orig_sr, target_sr)
    l_up, m_down = target_sr // g, orig_sr // g
    kernel = jnp.asarray(_sinc_kernel(l_up, m_down))
    k = kernel.shape[0]
    half = (k - 1) // 2

    squeeze = wav.ndim == 1
    x = wav[None] if squeeze else wav
    b = x.shape[0]
    t = x.shape[-1]
    out_len = -(-t * l_up // m_down)           # ceil

    y = jax.lax.conv_general_dilated(
        x[:, :, None].astype(jnp.float32), kernel[:, None, None],
        window_strides=(m_down,), padding=[(half, half + m_down)],
        lhs_dilation=(l_up,), dimension_numbers=('NWC', 'WIO', 'NWC'))
    y = y[:, :out_len, 0]
    return y[0] if squeeze else y


def normalize_audio(audio: jax.Array, original_sr: int, target_sr: int = 16_000
                    ) -> jax.Array:
    """Mono-mix, resample, peak-normalize to [-1, 1] (reference utils.py:62-72)."""
    audio = jnp.asarray(audio, jnp.float32)
    if audio.ndim > 1:                          # (channels, T) → mono
        audio = audio.mean(axis=0)
    audio = resample(audio, original_sr, target_sr)
    peak = jnp.max(jnp.abs(audio))
    return audio / jnp.maximum(peak, 1e-9)


def load_audio(path: Path | str, target_sr: int = 16_000) -> jax.Array:
    """Load a WAV file (stdlib wave; no torchaudio in this stack) and normalize."""
    import wave

    with wave.open(str(path), 'rb') as f:
        sr = f.getframerate()
        n_ch = f.getnchannels()
        raw = f.readframes(f.getnframes())
        width = f.getsampwidth()
    dtype = {1: np.uint8, 2: np.int16, 4: np.int32}[width]
    pcm = np.frombuffer(raw, dtype=dtype).astype(np.float32)
    if width == 1:
        pcm = pcm - 128.0
    pcm = pcm / float(np.iinfo(dtype).max if width > 1 else 127.0)
    if n_ch > 1:
        pcm = pcm.reshape(-1, n_ch).T           # (channels, T)
    return normalize_audio(jnp.asarray(pcm), sr, target_sr)


def pcm16(wav: np.ndarray, dtype: str = '<i2') -> np.ndarray:
    """Float waveform → 16-bit PCM samples (clip, round-to-nearest).  THE
    quantization rule shared by the WAV writer and the streaming endpoint;
    ``dtype`` selects byte order ('<i2' WAV, '>i2' network/audio-L16)."""
    return np.round(np.clip(np.asarray(wav), -1.0, 1.0)
                    * 32767.0).astype(dtype)


def wav_pcm16_bytes(wav: np.ndarray, sr: int) -> bytes:
    """Mono float waveform → complete 16-bit WAV file bytes (round-to-nearest).
    Single encoder shared by the CLI writer and the HTTP server."""
    import io
    import wave

    pcm = pcm16(wav, '<i2')
    buf = io.BytesIO()
    with wave.open(buf, 'wb') as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(sr)
        f.writeframes(pcm.tobytes())
    return buf.getvalue()


def save_wav(path: Path | str, wav: np.ndarray, sr: int) -> None:
    """Write mono float waveform to a 16-bit WAV."""
    with open(path, 'wb') as f:
        f.write(wav_pcm16_bytes(wav, sr))


def wav_bytes_to_float(data: bytes) -> tuple[np.ndarray, int]:
    """Complete WAV file bytes → (mono float32 waveform in [-1, 1], sample
    rate).  Inverse of ``wav_pcm16_bytes`` for 16-bit mono; multi-channel
    input mixes down; 8/32-bit PCM widths are scaled by their own full range.
    Shared by the HTTP ASR endpoint (serve.py) and tests."""
    import io
    import wave

    with wave.open(io.BytesIO(data), 'rb') as f:
        sr = f.getframerate()
        n_ch = f.getnchannels()
        width = f.getsampwidth()
        raw = f.readframes(f.getnframes())
    if width == 2:
        pcm = np.frombuffer(raw, '<i2').astype(np.float32) / 32767.0
    elif width == 4:
        pcm = np.frombuffer(raw, '<i4').astype(np.float32) / 2147483647.0
    elif width == 1:                      # 8-bit WAV is unsigned
        pcm = (np.frombuffer(raw, np.uint8).astype(np.float32) - 128.0) / 127.0
    else:
        raise ValueError(f'unsupported WAV sample width {width}')
    if n_ch > 1:
        pcm = pcm.reshape(-1, n_ch).mean(axis=1)
    return pcm, sr
