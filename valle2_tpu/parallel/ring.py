"""Ring attention: exact attention over a sequence sharded across chips.

Closes the one deliberately-scoped gap in the long-context story (SURVEY
§2.3 / §5 listed cross-chip ring attention as a future extension; the Pallas
flash kernel is the single-chip blockwise analog).  When one chip cannot hold
a sequence's activations, shard the SEQUENCE axis over a mesh axis and rotate
K/V blocks around the ring (Liu et al. 2023, "Ring Attention with Blockwise
Transformers"): each device keeps its Q block resident, consumes one K/V
block per hop via ``ppermute`` (ICI point-to-point, overlappable with the
block's compute), and merges partial attention with the online-softmax
recurrence — numerically EXACT, not an approximation.

Masking reuses the flash kernel's meta convention — per-row
``[tokens_valid, kv_end]`` + a static ``tokens_total`` boundary — evaluated
on GLOBAL indices derived from each block's ring position, so the VALL-E
prefix-LM pattern (source block fully visible, target block causal, pads
dropped) is identical to the single-chip paths (``ops.attention.mha`` /
``kernels.flash_attention``).

Autodiff: the rotation is a ``lax.scan`` whose transpose reverses the
``ppermute`` — ``jax.grad`` through the ring pipelines the backward the
opposite direction with no hand-written schedule (``jax.checkpoint`` on the
hop body keeps residuals O(local block)).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.masks import NEG_INF


def _block_attend(q_pos: jax.Array, k_pos: jax.Array, meta: jax.Array,
                  tokens_total: int, causal: bool) -> jax.Array:
    """(b, sq, sk) bool attend mask from GLOBAL indices — the flash kernel's
    in-kernel formula (kernels/flash_attention.py): key visible iff it is a
    valid source token, or (causal) a non-future target position; always
    bounded by the row's kv_end."""
    tv = meta[:, 0][:, None, None]
    ke = meta[:, 1][:, None, None]
    qp = q_pos[None, :, None]
    kp = k_pos[None, None, :]
    if causal:
        attend = (kp < tv) | ((kp >= tokens_total) & (kp <= qp))
    else:
        attend = (kp < tv) | (kp >= tokens_total)
    return attend & (kp < ke)


def ring_attention(q: jax.Array, k: jax.Array, v: jax.Array, meta: jax.Array,
                   tokens_total: int, axis: str, causal: bool = True,
                   remat: bool = True) -> jax.Array:
    """Device-local ring attention — call INSIDE a shard_map over ``axis``.

    q/k/v: (b, h, s_loc, hd) — this device's block of a global (b, h, S, hd)
    sequence sharded over ``axis`` (S = n_devices * s_loc, blocks in ring
    order).  meta: (b, 2) int32 [tokens_valid, kv_end] with GLOBAL indices,
    replicated.  Returns this device's (b, h, s_loc, hd) output block.

    Per hop r the device attends its Q block against the K/V block that
    started on rank ``(rank + r) mod n`` (blocks rotate i → i-1, so fresh
    blocks arrive from the right), accumulating (max, sum, weighted values)
    in float32.  Fully-masked rows degrade to the uniform average over all
    keys — exactly the finite-NEG_INF softmax semantics of the bias paths
    (masks.NEG_INF exists to avoid NaN rows), so outputs match sdpa
    bit-for-bit in behavior class, not just on valid rows.
    """
    n = jax.lax.axis_size(axis)
    rank = jax.lax.axis_index(axis)
    b, h, s_loc, hd = q.shape
    scale = 1.0 / (hd ** 0.5)
    q_pos = rank * s_loc + jnp.arange(s_loc)
    q32 = q.astype(jnp.float32) * scale
    # Rotation i -> i-1: after r hops this device holds block (rank + r) % n.
    perm = [(i, (i - 1) % n) for i in range(n)]

    def block(carry, kv, r):
        acc, m_run, l_run = carry
        k_r, v_r = kv[..., :hd], kv[..., hd:]
        src = jnp.mod(rank + r, n)
        k_pos = src * s_loc + jnp.arange(s_loc)
        attend = _block_attend(q_pos, k_pos, meta, tokens_total, causal)
        scores = jnp.einsum('bhqd,bhkd->bhqk', q32, k_r.astype(jnp.float32))
        scores = jnp.where(attend[:, None], scores, NEG_INF)
        m_new = jnp.maximum(m_run, scores.max(axis=-1))
        alpha = jnp.exp(m_run - m_new)                   # rescale old partials
        p = jnp.exp(scores - m_new[..., None])
        l_new = l_run * alpha + p.sum(axis=-1)
        acc = acc * alpha[..., None] + jnp.einsum(
            'bhqk,bhkd->bhqd', p, v_r.astype(jnp.float32))
        return acc, m_new, l_new

    def hop(carry, r):
        # Rotate FIRST, then attend the arriving block: n-1 transfers total —
        # a trailing rotation after the last block would move bytes nobody
        # reads (1/n of the ring's volume).  K and V travel as ONE collective:
        # two dataflow-independent ppermutes per hop could rendezvous-
        # interleave across devices on XLA:CPU's thunk executor (NOTES.md) —
        # and one transfer is cheaper on real ICI anyway.
        acc, m_run, l_run, kv = carry
        kv = jax.lax.ppermute(kv, axis, perm)
        acc, m_new, l_new = block((acc, m_run, l_run), kv, r)
        return (acc, m_new, l_new, kv), None

    if remat:
        hop = jax.checkpoint(hop)
    acc0 = jnp.zeros((b, h, s_loc, hd), jnp.float32)
    m0 = jnp.full((b, h, s_loc), NEG_INF, jnp.float32)
    l0 = jnp.zeros((b, h, s_loc), jnp.float32)
    kv0 = jnp.concatenate([k, v], axis=-1)
    # Resident block (r = 0) needs no transfer; hops 1..n-1 rotate-then-attend.
    carry0 = block((acc0, m0, l0), kv0, jnp.int32(0))
    (acc, _, l, _), _ = jax.lax.scan(hop, (*carry0, kv0), jnp.arange(1, n))
    out = acc / jnp.maximum(l, 1e-30)[..., None]
    return out.astype(v.dtype)
