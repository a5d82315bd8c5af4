"""Model registry (reference /root/reference/valle/models/__init__.py:5-13).

``EncodecTPU`` is the native JAX codec (the reference wraps the pip ``encodec``
package; see valle2_tpu.codec).  ``ValleASR`` is the direction-swapped AR model
(codes → text) — the reference README claims ASR but ships no code (SURVEY §0).
"""

from ..codec import EncodecTPU
from .ar import ValleAR
from .nar import ValleNAR


def _asr(config, *args, **kwargs):
    import dataclasses
    if config.direction != 'asr':
        config = dataclasses.replace(config, direction='asr')
    return ValleAR(config, *args, **kwargs)


MODEL_DICT = {
    'EncodecPip': EncodecTPU,   # name kept for reference-config compatibility
    'EncodecTPU': EncodecTPU,
    'ValleAR': ValleAR,
    'ValleNAR': ValleNAR,
    'ValleASR': _asr,
}


def get_model_class(model_name: str):
    return MODEL_DICT[model_name]


__all__ = ['EncodecTPU', 'ValleAR', 'ValleNAR', 'get_model_class', 'MODEL_DICT']
