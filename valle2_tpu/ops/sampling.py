"""Sampling utilities: top-k / top-p filtering, categorical sampling, best-of-N beam pick.

TPU-native equivalent of the reference sampling helpers
(``/root/reference/valle/models/utils.py:46-88``).  The reference depended on
``transformers.top_k_top_p_filtering`` (removed from transformers after 4.38 — SURVEY
Q11); this implements the same filtering natively in JAX so it can run *inside* the
jitted decode loop — no host round-trip per token.

Semantics matched:
- temperature scaling before filtering; ``temperature <= 0`` means greedy argmax (the
  reference cannot express greedy — temp 0 divides by zero — so argmax is the exact
  temp→0 limit used for the parity gate).
- top-k keeps the k highest logits (ties inclusive, like torch: filter is
  ``logit < kth_value``).
- top-p drops tokens once cumulative softmax prob exceeds p, always keeping the top-1.
- returned logprob is ``log_softmax`` of the **filtered** logits at the sampled token
  (reference models/utils.py:64-66).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .masks import NEG_INF


def top_k_top_p_filter(logits: jax.Array, top_k: int = 0, top_p: float = 1.0) -> jax.Array:
    """Filter a (..., vocab) logits tensor; filtered entries become NEG_INF.

    ``top_k`` / ``top_p`` must be static (they come from config).
    """
    vocab = logits.shape[-1]
    if 0 < top_k < vocab:
        kth = jax.lax.top_k(logits, top_k)[0][..., -1:]
        logits = jnp.where(logits < kth, NEG_INF, logits)
    if top_p < 1.0:
        sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
        cum_probs = jnp.cumsum(jax.nn.softmax(sorted_logits, axis=-1), axis=-1)
        # Drop tokens whose *preceding* cumulative mass already exceeds top_p
        # (the shift-right-by-one in the transformers implementation).
        sorted_remove = cum_probs > top_p
        sorted_remove = jnp.concatenate(
            [jnp.zeros_like(sorted_remove[..., :1]), sorted_remove[..., :-1]], axis=-1)
        # Smallest kept logit among the sorted order defines the threshold.
        # Threshold semantics keep EVERY token tied with the boundary logit;
        # transformers' scatter-by-sorted-index would drop ties past the
        # cumulative cut in whatever order its (unstable-across-backends)
        # sort put them — for exact-tie logits at the top-p boundary there is
        # no backend-independent "reference order", so the symmetric
        # keep-all-ties rule is deliberate.  Identical otherwise.
        min_kept = jnp.min(jnp.where(sorted_remove, jnp.inf, sorted_logits), axis=-1,
                           keepdims=True)
        logits = jnp.where(logits < min_kept, NEG_INF, logits)
    return logits


def topk_sampling(rng: jax.Array, logits: jax.Array, top_k: int = 50,
                  tok_p: float = 1.0, temperature: float = 1.0):
    """Sample one token per row from (b, vocab) logits.

    Returns (samples (b,), logprobs (b,)).  Matches reference
    models/utils.py:46-68 (``tok_p`` spelling kept for API parity).
    """
    if temperature is not None and temperature > 0.0:
        logits = logits / temperature
        filtered = top_k_top_p_filter(logits, top_k, tok_p)
        samples = jax.random.categorical(rng, filtered, axis=-1)
    else:  # greedy: argmax is the exact temperature->0 limit
        filtered = top_k_top_p_filter(logits, top_k, tok_p)
        samples = jnp.argmax(logits, axis=-1)
    logprobs = jax.nn.log_softmax(filtered, axis=-1)
    current = jnp.take_along_axis(logprobs, samples[:, None], axis=-1)[:, 0]
    return samples, current


def best_beam_index(codes: jax.Array, sum_logprobs: jax.Array, stop_token: int,
                    length_penalty: float = 1.0) -> jax.Array:
    """Length-penalized best-of-N pick (reference get_best_beam, models/utils.py:71-88).

    ``codes``: (beams, T) including prompt; padding slots must hold ``stop_token`` so the
    non-stop count equals the reference's dynamic-length count.
    """
    length = jnp.sum(codes != stop_token, axis=-1)
    avg = sum_logprobs / (length.astype(sum_logprobs.dtype) ** length_penalty)
    return jnp.argmax(avg)
