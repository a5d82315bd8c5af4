"""EncodecTPU — the native JAX audio codec with the reference wrapper's API.

Drop-in equivalent of the reference EncodecPip
(``/root/reference/valle/models/encodec_pip.py:23-129``): same method names, shapes and
layouts (codes (n_q, T); latents (128, T); 24 kHz, 6 kbps → 8 codebooks), but the
SEANet conv/LSTM stacks and the RVQ run as jitted XLA programs on TPU instead of torch
on CPU — the reference's real input-pipeline bottleneck (SURVEY §3.1).

Weights: pass a converted pretrained pytree (codec/convert.py) for token parity with
the pip model, or let it random-init (tests, geometry checks).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from . import rvq as _rvq
from . import seanet
from .convert import load_torch_checkpoint

Params = dict[str, Any]

SAMPLE_RATE = 24_000
NUM_QUANTIZERS = 8          # 6.0 kbps @ 75 fps, 10 bits/codebook
CODEBOOK_SIZE = 1024
LATENT_DIM = 128
HOP = seanet.HOP


def init_params(key: jax.Array, dtype=jnp.float32) -> Params:
    k_enc, k_dec, k_vq = jax.random.split(key, 3)
    return {'encoder': seanet.encoder_init(k_enc, dtype),
            'decoder': seanet.decoder_init(k_dec, dtype),
            'rvq': _rvq.rvq_init(k_vq, NUM_QUANTIZERS, CODEBOOK_SIZE, LATENT_DIM, dtype)}


def encode(params: Params, wav: jax.Array, n_q: int = NUM_QUANTIZERS) -> jax.Array:
    """(B, T) waveform → (B, n_q, ceil(T/320)) int32 codes."""
    latents = seanet.encode(params['encoder'], wav)
    return _rvq.rvq_encode(params['rvq'], latents, n_q)


def decode(params: Params, codes: jax.Array) -> jax.Array:
    """(B, n_q, F) codes → (B, F*320) waveform."""
    latents = _rvq.rvq_decode(params['rvq'], codes)
    return seanet.decode(params['decoder'], latents)


def embed(params: Params, wav: jax.Array) -> jax.Array:
    """(B, T) waveform → (B, F, 128) pre-VQ latents."""
    return seanet.encode(params['encoder'], wav)


class EncodecTPU:
    """Stateful wrapper with the reference EncodecPip surface.

    ``decode_dtype``: compute dtype for the decode path (waveform synthesis).
    bfloat16 roughly halves decode latency; encode always runs float32/highest —
    token IDs feed an argmin and must match the reference bit-for-bit.
    """

    def __init__(self, params: Params | None = None, checkpoint: str | None = None,
                 seed: int = 0, decode_dtype: str = 'float32',
                 use_pallas_rvq: bool = False):
        if params is not None and checkpoint is not None:
            raise ValueError('pass params OR checkpoint, not both (a silently '
                             'ignored checkpoint means garbage audio)')
        if checkpoint is not None:
            params = load_torch_checkpoint(checkpoint)
        if params is None:
            params = init_params(jax.random.key(seed))
        # Device placement ONCE here: convert_state_dict/load_torch_checkpoint
        # return numpy leaves, and numpy params would re-upload the full weight
        # set (incl. the 32x1024x128 codebook stack) on every jitted call.
        params = jax.tree.map(jnp.asarray, params)
        self.params = params
        self.use_pallas_rvq = use_pallas_rvq
        ddtype = jnp.dtype(decode_dtype)
        self._dec_params = (params if ddtype == jnp.float32 else
                            jax.tree.map(lambda a: a.astype(ddtype)
                                         if a.dtype == jnp.float32 else a, params))
        if use_pallas_rvq:
            from ..kernels.rvq import rvq_encode_fused

            def _encode_fused(params, wav, n_q):
                latents = seanet.encode(params['encoder'], wav)
                return rvq_encode_fused(params['rvq']['codebooks'], latents, n_q)
            from ..aot import cached_jit
            self._encode = cached_jit(_encode_fused, tag='codec_encode_rvq',
                                      static_argnums=(2,))
        else:
            from ..aot import cached_jit
            self._encode = cached_jit(encode, tag='codec_encode',
                                      static_argnums=(2,))
        self._decode = cached_jit(decode, tag='codec_decode',
                                  extra_key=str(ddtype))
        self._embed = cached_jit(embed, tag='codec_embed')

    @property
    def sampling_rate(self) -> int:
        return SAMPLE_RATE

    def fingerprint(self) -> str:
        """Stable hex identity of the ENCODE weights (encoder + RVQ codebooks),
        whether they came from a converted checkpoint or a seeded random init —
        keys the persistent codec-token disk cache (data/dataset.py).  Hashes
        the FULL leaf contents (~15 MB, ~10 ms, once per process): sampling
        would let checkpoints that differ only in later codebook entries
        collide and serve tokens from the wrong codec."""
        import hashlib

        import numpy as np
        h = hashlib.sha256()
        enc_tree = {'encoder': self.params['encoder'], 'rvq': self.params['rvq']}
        for path, leaf in jax.tree_util.tree_flatten_with_path(enc_tree)[0]:
            arr = np.asarray(leaf)
            h.update(jax.tree_util.keystr(path).encode())
            h.update(str(arr.shape).encode())
            h.update(np.ascontiguousarray(arr).tobytes())
        return h.hexdigest()[:16]

    @property
    def dec_params(self) -> Params:
        """Decoder params in the configured decode dtype — the public handle
        for fused pipelines that compose codec decode into their own program
        (tts.py); the underscored attribute is an implementation detail."""
        return self._dec_params

    # --- reference API (encodec_pip.py:23-129); shapes/layouts identical ---

    def encode(self, audio) -> jax.Array:
        """1D wave (T,) → codes (n_q, ceil(T/320))."""
        audio = jnp.asarray(audio, jnp.float32)
        assert audio.ndim == 1, f'Expected 1D audio tensor, got {audio.ndim}D'
        return self._encode(self.params, audio[None], NUM_QUANTIZERS)[0]

    def batch_encode(self, audios) -> jax.Array:
        """(B, T) waves → (B, n_q, F)."""
        audios = jnp.asarray(audios, jnp.float32)
        assert audios.ndim == 2, f'Expected 2D audio tensor, got {audios.ndim}D'
        return self._encode(self.params, audios, NUM_QUANTIZERS)

    def decode(self, codes) -> jax.Array:
        """(n_q, F) codes → 1D wave (F*320,)."""
        codes = jnp.asarray(codes, jnp.int32)
        assert codes.ndim == 2, f'Expected 2D codes tensor, got {codes.ndim}D'
        return self._decode(self._dec_params, codes[None])[0].astype(jnp.float32)

    def batch_decode(self, codes) -> jax.Array:
        codes = jnp.asarray(codes, jnp.int32)
        assert codes.ndim == 3, f'Expected 3D codes tensor, got {codes.ndim}D'
        return self._decode(self._dec_params, codes).astype(jnp.float32)

    def encode_decode(self, audio) -> jax.Array:
        return self.decode(self.encode(audio))

    def get_embedding(self, audio) -> jax.Array:
        """1D wave → (128, F) latents (channel-first like the reference)."""
        audio = jnp.asarray(audio, jnp.float32)
        assert audio.ndim == 1, f'Expected 1D audio tensor, got {audio.ndim}D'
        return self._embed(self.params, audio[None])[0].T

    def batch_get_embedding(self, audios) -> jax.Array:
        audios = jnp.asarray(audios, jnp.float32)
        assert audios.ndim == 2, f'Expected 2D audio tensor, got {audios.ndim}D'
        return self._embed(self.params, audios).transpose(0, 2, 1)
