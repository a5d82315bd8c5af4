"""Mask builders for the VALL-E prefix-LM attention pattern.

TPU-native port of the reference mask utilities
(``/root/reference/valle/models/utils.py:8-43`` and ``merge_masks`` at
``modules.py:175-207``).  Convention matches the reference: **True = masked**.

The jnp-native attention path materializes an additive bias once per step; the Pallas
flash kernel (``valle2_tpu.kernels.flash_attention``) instead derives the same pattern
on the fly from (tokens_len, total_len) scalars — no (s, s) tensor in HBM.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1e30  # finite large-negative: avoids NaN rows for fully-masked queries


def build_pad_mask(lens: jax.Array, max_len: int) -> jax.Array:
    """(b, max_len) bool, True where position >= length (i.e. padding).

    Reference models/utils.py:8-14, with ``max_len`` static (JAX needs static shapes;
    the reference derives it from ``lens.max()``).
    """
    pos = jnp.arange(max_len)
    return pos[None, :] >= lens[:, None]


def build_attn_mask(x_len: int, y_len: int) -> jax.Array:
    """VALL-E prefix-LM mask, (x_len+y_len, x_len+y_len) bool, True = masked.

    Token block attends to all tokens but no audio; audio block attends to all tokens
    and causally over audio.  Reference models/utils.py:17-43.
    """
    total = x_len + y_len
    q = jnp.arange(total)[:, None]
    k = jnp.arange(total)[None, :]
    is_token_q = q < x_len
    token_row = k >= x_len                      # tokens: mask all audio keys
    audio_row = k > q                           # audio: causal (mask strictly-future keys)
    return jnp.where(is_token_q, token_row, audio_row)


def merge_masks(attn_mask: jax.Array | None, padding_mask: jax.Array | None,
                batch_size: int) -> jax.Array | None:
    """Broadcast-merge to (b, 1, s, s) bool (True = masked); OR semantics.

    Reference modules.py:175-207 expands to (b, n_heads, s, s); heads are identical, so
    we keep a size-1 head axis and let XLA broadcast.

    Reference quirk, faithfully kept: with ``attn_mask=None`` the padding mask
    is DROPPED too (the reference merges key_padding only inside the
    attn_mask branch, modules.py:190-204).  The model paths never rely on
    this — AR builds its combined bias via ``prefix_lm_bias`` and the NAR
    masks padding explicitly — but callers of this public helper should pass
    an all-False attn_mask if they want padding-only masking.
    """
    if attn_mask is None:
        return None
    if attn_mask.ndim == 2:
        merged = jnp.broadcast_to(attn_mask[None, None],
                                  (batch_size, 1, *attn_mask.shape))
    else:  # (b, s, s)
        merged = attn_mask[:, None]
    if padding_mask is not None:
        merged = merged | padding_mask[:, None, None, :]
    return merged


def mask_to_bias(mask: jax.Array | None, dtype=jnp.float32) -> jax.Array | None:
    """Bool mask (True = masked) → additive bias (0 attend / NEG_INF masked)."""
    if mask is None:
        return None
    return jnp.where(mask, jnp.asarray(NEG_INF, dtype), jnp.asarray(0.0, dtype))


def prefix_lm_bias(tokens_len: int, codes_len: int, codes_lens: jax.Array | None,
                   dtype=jnp.float32) -> jax.Array:
    """Fused builder for the AR training bias: prefix-LM pattern + key-padding on the
    audio stream, as one (b, 1, s, s) additive bias.

    Matches reference valle_ar.py:69-74: the padding mask is the audio pad mask
    left-padded with ``tokens_len`` False columns (token keys never padded).
    """
    attn = build_attn_mask(tokens_len, codes_len)
    if codes_lens is None:
        return mask_to_bias(attn[None, None], dtype)
    pad = build_pad_mask(codes_lens, codes_len)                    # (b, codes_len)
    pad = jnp.pad(pad, ((0, 0), (tokens_len, 0)))                  # (b, s) False on tokens
    return mask_to_bias(merge_masks(attn, pad, codes_lens.shape[0]), dtype)
