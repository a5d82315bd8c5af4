"""Native JAX EnCodec: SEANet encoder/decoder + residual VQ (SURVEY §2.2)."""

from .encodec import (CODEBOOK_SIZE, HOP, LATENT_DIM, NUM_QUANTIZERS, SAMPLE_RATE,
                      EncodecTPU, decode, embed, encode, init_params)
from .convert import convert_state_dict, load_torch_checkpoint
from .rvq import nearest_code, rvq_decode, rvq_encode, rvq_init

__all__ = ['CODEBOOK_SIZE', 'HOP', 'LATENT_DIM', 'NUM_QUANTIZERS', 'SAMPLE_RATE',
           'EncodecTPU', 'decode', 'embed', 'encode', 'init_params',
           'convert_state_dict', 'load_torch_checkpoint', 'nearest_code',
           'rvq_decode', 'rvq_encode', 'rvq_init']
