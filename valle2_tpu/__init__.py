"""valle2_tpu — TPU-native VALL-E X neural-codec TTS/ASR framework.

A from-scratch JAX/XLA/Pallas re-design of KubiakJakub01/Valle2 (PyTorch+Lightning):

- ``config``    — flat dataclass + JSON loader (reference-compatible surface)
- ``ops``       — functional NN primitives; scanned transformer; masks; sampling
- ``kernels``   — Pallas TPU kernels (flash prefix-LM attention, fused AdaLN, RVQ)
- ``codec``     — native EnCodec 24 kHz (SEANet + RVQ) with torch weight converter
- ``models``    — ValleAR (on-device while_loop decode), ValleNAR (7-stage scan),
                  ValleASR (direction-swapped AR), EncodecTPU
- ``data``      — phoneme frontend, bucketed static-shape collate, loaders
- ``parallel``  — device mesh + GSPMD sharding rules (data/tensor parallel)
- ``train``     — jitted optax train loop, orbax checkpoints, TB metrics
- ``tts``       — end-to-end text→waveform and audio→phonemes pipelines
"""

from .aot import enable_aot_cache
from .compile_cache import enable_compilation_cache
from .config import ConfigValle

__version__ = '0.3.0'

# User-facing classes resolve lazily (PEP 562): `from valle2_tpu import
# ValleTTS` works without paying the heavy jax/model import cost for users
# who only want the config or cache helpers.
_LAZY = {
    'ValleTTS': '.tts', 'ValleASRPipeline': '.tts',
    'TTSServer': '.serve', 'serve_http': '.serve',
    'StreamHub': '.stream_hub',
    'ValleAR': '.models', 'ValleNAR': '.models',
    'EncodecTPU': '.codec',
    'Trainer': '.train',
}

__all__ = ['ConfigValle', 'enable_aot_cache', 'enable_compilation_cache',
           '__version__', *sorted(_LAZY)]


def __getattr__(name: str):
    target = _LAZY.get(name)
    if target is None:
        raise AttributeError(f'module {__name__!r} has no attribute {name!r}')
    import importlib
    return getattr(importlib.import_module(target, __name__), name)


def __dir__():
    return sorted(set(globals()) | set(_LAZY))
