"""ctypes bindings for libvalle_audio (native WAV I/O + DSP).

Builds on demand with the in-tree Makefile (g++, no external deps) and falls back to
the pure-Python implementations in valle2_tpu.utils when compilation is unavailable.
Check ``available()`` or just call the functions — the dispatch is automatic.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parents[2] / 'native'
_LIB_PATH = _NATIVE_DIR / 'libvalle_audio.so'
_lib: ctypes.CDLL | None = None


def _load() -> ctypes.CDLL | None:
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB_PATH.exists():
        try:
            subprocess.run(['make', '-C', str(_NATIVE_DIR)], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError:
        return None

    f32p = ctypes.POINTER(ctypes.c_float)
    i32p = ctypes.POINTER(ctypes.c_int32)
    lib.valle_wav_read.restype = ctypes.c_int64
    lib.valle_wav_read.argtypes = [ctypes.c_char_p, f32p, ctypes.c_int64, i32p, i32p]
    lib.valle_wav_write.restype = ctypes.c_int32
    lib.valle_wav_write.argtypes = [ctypes.c_char_p, f32p, ctypes.c_int64,
                                    ctypes.c_int32]
    lib.valle_mono_mix.restype = None
    lib.valle_mono_mix.argtypes = [f32p, ctypes.c_int64, ctypes.c_int32, f32p]
    lib.valle_peak_normalize.restype = None
    lib.valle_peak_normalize.argtypes = [f32p, ctypes.c_int64]
    lib.valle_resample_out_len.restype = ctypes.c_int64
    lib.valle_resample_out_len.argtypes = [ctypes.c_int64, ctypes.c_int32,
                                           ctypes.c_int32]
    lib.valle_resample.restype = ctypes.c_int64
    lib.valle_resample.argtypes = [f32p, ctypes.c_int64, ctypes.c_int32,
                                   ctypes.c_int32, f32p, ctypes.c_int64]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def wav_read(path: str | Path) -> tuple[np.ndarray, int]:
    """→ (interleaved float32 samples shaped (frames,) or (frames, ch), sr)."""
    lib = _load()
    if lib is None:
        raise RuntimeError('libvalle_audio unavailable')
    sr = ctypes.c_int32(0)
    ch = ctypes.c_int32(0)
    n = lib.valle_wav_read(str(path).encode(), None, 0,
                           ctypes.byref(sr), ctypes.byref(ch))
    if n < 0:
        raise IOError(f'failed to parse WAV: {path}')
    buf = np.empty(n, np.float32)
    n2 = lib.valle_wav_read(str(path).encode(), _fptr(buf), n,
                            ctypes.byref(sr), ctypes.byref(ch))
    if n2 < 0:
        raise IOError(f'failed to read WAV data: {path}')
    buf = buf[:n2]
    if ch.value > 1:
        buf = buf.reshape(-1, ch.value)
    return buf, sr.value


def wav_write(path: str | Path, samples: np.ndarray, sample_rate: int) -> None:
    lib = _load()
    if lib is None:
        raise RuntimeError('libvalle_audio unavailable')
    samples = np.ascontiguousarray(samples, np.float32)
    if lib.valle_wav_write(str(path).encode(), _fptr(samples), samples.size,
                           sample_rate) != 0:
        raise IOError(f'failed to write WAV: {path}')


def mono_mix(interleaved: np.ndarray) -> np.ndarray:
    lib = _load()
    if interleaved.ndim == 1:
        return interleaved.astype(np.float32)
    if lib is None:   # pure-Python fallback (module docstring contract)
        return np.ascontiguousarray(interleaved, np.float32).mean(axis=1)
    frames, ch = interleaved.shape
    src = np.ascontiguousarray(interleaved, np.float32)
    out = np.empty(frames, np.float32)
    lib.valle_mono_mix(_fptr(src), frames, ch, _fptr(out))
    return out


def peak_normalize(samples: np.ndarray) -> np.ndarray:
    lib = _load()
    out = np.ascontiguousarray(samples, np.float32).copy()
    if lib is None:
        peak = np.abs(out).max() if out.size else 0.0
        return out / peak if peak > 0 else out
    lib.valle_peak_normalize(_fptr(out), out.size)
    return out


def resample(samples: np.ndarray, sr_in: int, sr_out: int) -> np.ndarray:
    lib = _load()
    src = np.ascontiguousarray(samples, np.float32)
    if lib is None:
        from .. import utils
        return np.asarray(utils.resample(src, sr_in, sr_out), np.float32)
    n_out = lib.valle_resample_out_len(src.size, sr_in, sr_out)
    out = np.empty(n_out, np.float32)
    n = lib.valle_resample(_fptr(src), src.size, sr_in, sr_out, _fptr(out), n_out)
    return out[:n]


def load_audio(path: str | Path, target_sr: int = 16_000) -> np.ndarray:
    """Native load → mono → resample → peak-normalize (reference utils.py:62-79)."""
    samples, sr = wav_read(path)
    mono = mono_mix(samples)
    if sr != target_sr:
        mono = resample(mono, sr, target_sr)
    return peak_normalize(mono)
