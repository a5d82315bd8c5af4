"""Pallas TPU flash attention with the VALL-E prefix-LM mask computed in-kernel.

Replaces the materialized (b, 1, s, s) bias of the jnp path (ops/attention.sdpa) for
training/prefill: the mask — token block sees tokens only, audio block sees tokens +
causal audio, padded keys dropped (reference masks at
/root/reference/valle/models/utils.py:17-43 and valle_ar.py:69-74) — reduces to

    attend(q, k) = ((k < tokens_valid[b])                       # visible source keys
                    | ((k >= tokens_total) & (k <= q)))          # causal audio block
                   & (k < kv_end[b])                             # key padding

(with the causal clause dropped for the NAR's bidirectional pattern), so the kernel
derives it from two scalars per batch row (scalar-prefetched to SMEM)
instead of reading an (s, s) tensor from HBM.  Standard flash structure: grid over
(batch*heads, q-blocks); per q-block an online-softmax ``fori_loop`` over kv-blocks
resident in VMEM; running max/sum rescaling in float32.

Training: the custom VJP runs blockwise Pallas backward kernels that recompute the
masked scores from the saved per-row logsumexp — no (s, s) residual is materialized
in either direction.  At whole-row block sizes (the adaptive default for s ≤ 768)
the backward is ONE fused kernel producing dq/dk/dv with 5 dots; larger sequences
fall back to the two-kernel (dq, then dk/dv) blockwise form (7 dots, scores
recomputed twice).  ``use_flash_attention`` in the config ('auto' = on for TPU
backends) routes the AR/NAR training losses and the AR decode prefill through this
kernel; the jnp materialized-bias path is the fallback.

MXU dtype discipline: every dot takes the CALLER'S dtype as input (bf16 under the
bf16 training configs) with ``preferred_element_type=float32`` accumulation —
pre-upcasting operands to f32 would force f32-rate MXU passes (~4x slower on v5e)
and is exactly what the jnp bias path does NOT do.  Softmax statistics, rescaling,
and accumulators stay float32.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_Q = 128
DEFAULT_BLOCK_K = 128
NEG_INF = -1e30
# Largest whole-row size for the single-pass fused backward: three (s, s) f32
# temporaries (p, dp, ds) at 768² ≈ 7 MB fit the ~16 MB VMEM budget; 1024² would
# not alongside the operand rows.
FUSED_BWD_MAX_SEQ = 768

# dot_general dimension numbers: A (m, d) × B (n, d) → (m, n)  (A @ Bᵀ) and
# A (q, n) × B (q, d) → (n, d)  (Aᵀ @ B) — expressed without materializing the
# transpose in VMEM.
_CONTRACT_LAST = (((1,), (1,)), ((), ()))
_CONTRACT_FIRST = (((0,), (0,)), ((), ()))


def _auto_blocks(s: int, block_q, block_k) -> tuple[int, int]:
    """Resolve block sizes.  None → adaptive: one whole-row block when the
    sequence fits VMEM comfortably, else 512.  Measured on v5e (16, 16, 640, 64):
    128×128 blocks = 3.85 ms/layer, whole-row 640×640 = 1.54 ms/layer — the
    online-softmax rescale per kv block is pure VPU overhead, so fewer/bigger
    blocks win until the (block_q, block_k) probability tile pressures VMEM
    (1024² f32 = 4 MB; cap there)."""
    s128 = -(-s // 128) * 128
    auto = s128 if s128 <= 1024 else 512
    return (block_q or auto, block_k or auto)


def _attend_block(q_ids, k_ids, tokens_valid, kv_end, tokens_total: int,
                  causal: bool):
    """The prefix-LM visibility formula, shared by forward and backward kernels."""
    if causal:
        audio_vis = (k_ids >= tokens_total) & (k_ids <= q_ids)
    else:
        audio_vis = k_ids >= tokens_total
    return ((k_ids < tokens_valid) | audio_vis) & (k_ids < kv_end)


def _kv_block_bound(q_blk, block_q: int, block_k: int, tokens_valid, kv_end,
                    causal: bool):
    """Number of kv blocks a q-block can SEE — the causal/padding block skip.

    Visible keys are [0, tokens_valid) ∪ [tokens_total, min(q_max, kv_end - 1)]
    (causal) or [0, kv_end) (bidirectional; tokens_valid ≤ kv_end always), so
    every visible key index is < max(tokens_valid, min(q_end, kv_end)).  Blocks
    past that bound are fully masked — skipping them is exact, and at large
    sequence lengths removes up to half the kernel's work (the BENCHMARKS.md
    frames=1024 MFU collapse)."""
    if causal:
        vis_end = jnp.maximum(tokens_valid,
                              jnp.minimum((q_blk + 1) * block_q, kv_end))
    else:
        vis_end = kv_end
    return jax.lax.div(vis_end + (block_k - 1), block_k)


def _fwd_kernel(meta_ref, q_ref, k_ref, v_ref, o_ref, lse_ref, *, block_q: int,
                block_k: int, sm_scale: float, seq_len: int, n_heads: int,
                tokens_total: int, causal: bool):
    """One (batch*head, q-block) program.

    meta_ref: SMEM (b, 2) int32 — [tokens_valid, kv_end] per batch row (prefetched).
    q_ref: (1, block_q, hd); k_ref/v_ref: (1, seq_len, hd); o_ref: (1, block_q, hd);
    lse_ref: (1, block_q) row logsumexp of the scaled+masked scores (for the bwd).
    """
    bh_idx = pl.program_id(0)
    q_blk = pl.program_id(1)
    b_idx = bh_idx // n_heads
    tokens_valid = meta_ref[b_idx, 0]
    kv_end = meta_ref[b_idx, 1]

    q = q_ref[0]                                                      # (bq, hd)
    q_ids = q_blk * block_q + jax.lax.broadcasted_iota(
        jnp.int32, (block_q, 1), 0)

    def body(kb, carry):
        acc, m_prev, l_prev = carry
        k_blk = k_ref[0, pl.ds(kb * block_k, block_k), :]
        v_blk = v_ref[0, pl.ds(kb * block_k, block_k), :]
        # Input-dtype dot (bf16 MXU passes under bf16 configs), f32 accumulate.
        s = jax.lax.dot_general(q, k_blk, _CONTRACT_LAST,
                                preferred_element_type=jnp.float32) * sm_scale
        k_ids = kb * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (1, block_k), 1)
        attend = _attend_block(q_ids, k_ids, tokens_valid, kv_end,
                               tokens_total, causal)
        s = jnp.where(attend, s, NEG_INF)
        m_cur = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))  # (bq, 1)
        alpha = jnp.exp(m_prev - m_cur)
        p = jnp.exp(s - m_cur)
        l_cur = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jnp.dot(p.astype(v_blk.dtype), v_blk,
                                    preferred_element_type=jnp.float32)
        return acc, m_cur, l_cur

    acc = jnp.zeros((block_q, q.shape[-1]), jnp.float32)
    m0 = jnp.full((block_q, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((block_q, 1), jnp.float32)
    if seq_len <= block_k:
        # Single kv block (the whole-row adaptive default at s ≤ 1024): a
        # dynamic bound can skip nothing and only turns the unrollable
        # single-iteration loop into a while_loop — keep the static bound.
        n_blocks = 1
    else:
        n_blocks = _kv_block_bound(q_blk, block_q, block_k, tokens_valid,
                                   kv_end, causal)
    acc, m_f, l_f = jax.lax.fori_loop(0, n_blocks, body, (acc, m0, l0))
    o_ref[0] = (acc / jnp.maximum(l_f, 1e-30)).astype(o_ref.dtype)
    # lse block is the full (1, seq_len) row (Mosaic requires the trailing dims of a
    # block to be lane/sublane aligned or full); write just this program's slice.
    lse_ref[0, 0, pl.ds(q_blk * block_q, block_q)] = \
        (m_f + jnp.log(jnp.maximum(l_f, 1e-30)))[:, 0]


def _fwd_kernel_folded(meta_ref, q_ref, k_ref, v_ref, o_ref, lse_ref, *,
                       block_q: int, block_k: int, sm_scale: float,
                       seq_len: int, causal: bool, tokens_total: int):
    """Head-folded forward: one (batch, q-block) program carries ALL heads.

    q_ref: (1, h, block_q, hd); k/v_ref: (1, h, seq, hd); o like q;
    lse_ref: (1, h, seq).  The score/PV dots batch over the head axis, so one
    program issues h MXU contractions back to back with no grid turnaround
    between them — h× fewer programs, same bytes, and the per-program mask/
    softmax bookkeeping amortizes across heads (it is broadcast, not repeated).
    """
    b_idx = pl.program_id(0)
    q_blk = pl.program_id(1)
    tokens_valid = meta_ref[b_idx, 0]
    kv_end = meta_ref[b_idx, 1]

    q = q_ref[0]                                            # (h, bq, hd)
    h, _, hd = q.shape
    q_ids = q_blk * block_q + jax.lax.broadcasted_iota(
        jnp.int32, (block_q, 1), 0)

    def body(kb, carry):
        acc, m_prev, l_prev = carry
        k_blk = k_ref[0, :, pl.ds(kb * block_k, block_k), :]   # (h, bk, hd)
        v_blk = v_ref[0, :, pl.ds(kb * block_k, block_k), :]
        s = jax.lax.dot_general(q, k_blk, (((2,), (2,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32) * sm_scale
        k_ids = kb * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (1, block_k), 1)
        attend = _attend_block(q_ids, k_ids, tokens_valid, kv_end,
                               tokens_total, causal)           # (bq, bk)
        s = jnp.where(attend[None], s, NEG_INF)                # (h, bq, bk)
        m_cur = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        alpha = jnp.exp(m_prev - m_cur)
        p = jnp.exp(s - m_cur)
        l_cur = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        pv = jax.lax.dot_general(p.astype(v_blk.dtype), v_blk,
                                 (((2,), (1,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32)
        return acc * alpha + pv, m_cur, l_cur

    acc = jnp.zeros((h, block_q, hd), jnp.float32)
    m0 = jnp.full((h, block_q, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((h, block_q, 1), jnp.float32)
    if seq_len <= block_k:
        # Single kv block: a dynamic bound can skip nothing and only turns
        # the unrollable one-iteration loop into a while_loop (same bypass
        # as _fwd_kernel).
        n_blocks = 1
    else:
        n_blocks = _kv_block_bound(q_blk, block_q, block_k, tokens_valid,
                                   kv_end, causal)
    acc, m_f, l_f = jax.lax.fori_loop(0, n_blocks, body, (acc, m0, l0))
    o_ref[0] = (acc / jnp.maximum(l_f, 1e-30)).astype(o_ref.dtype)
    lse_ref[0, :, pl.ds(q_blk * block_q, block_q)] = \
        (m_f + jnp.log(jnp.maximum(l_f, 1e-30)))[..., 0]


def _folded_blocks(h: int, s_pad: int, block_q, block_k) -> tuple[int, int]:
    """Block sizes for the folded kernel: the (h, bq, bk) f32 score tile is the
    VMEM driver, so cap h*bq*bk*4 ≈ 4 MB (two such temporaries live at once)."""
    bk = block_k or min(512, s_pad)
    if block_q:
        return block_q, bk
    budget = 4 * 1024 * 1024 // 4
    bq = budget // max(h * bk, 1)
    bq = max(128, min(s_pad, (bq // 128) * 128))
    return bq, bk


def _flash_fwd_folded(q, k, v, meta, tokens_total: int, causal: bool,
                      block_q, block_k):
    b, h, s, hd = q.shape
    sm_scale = 1.0 / math.sqrt(hd)
    s128 = -(-s // 128) * 128
    block_q, block_k = _folded_blocks(h, s128, block_q, block_k)
    blk = math.lcm(block_q, block_k)
    s_pad = -(-s // blk) * blk
    if s_pad != s:
        pad = ((0, 0), (0, 0), (0, s_pad - s), (0, 0))
        q, k, v = jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad)
    kernel = functools.partial(_fwd_kernel_folded, block_q=block_q,
                               block_k=block_k, sm_scale=sm_scale,
                               seq_len=s_pad, causal=causal,
                               tokens_total=tokens_total)
    interpret = jax.default_backend() != 'tpu'
    out, lse = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, s_pad // block_q),
            in_specs=[
                pl.BlockSpec((1, h, block_q, hd), lambda bi, qi, meta: (bi, 0, qi, 0)),
                pl.BlockSpec((1, h, s_pad, hd), lambda bi, qi, meta: (bi, 0, 0, 0)),
                pl.BlockSpec((1, h, s_pad, hd), lambda bi, qi, meta: (bi, 0, 0, 0)),
            ],
            out_specs=(
                pl.BlockSpec((1, h, block_q, hd), lambda bi, qi, meta: (bi, 0, qi, 0)),
                pl.BlockSpec((1, h, s_pad), lambda bi, qi, meta: (bi, 0, 0)),
            ),
        ),
        out_shape=(jax.ShapeDtypeStruct((b, h, s_pad, hd), q.dtype),
                   jax.ShapeDtypeStruct((b, h, s_pad), jnp.float32)),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
    )(meta, q, k, v)
    return out[:, :, :s], lse[:, :, :s]


def _flash_fwd(q, k, v, meta, tokens_total: int, causal: bool,
               block_q: int, block_k: int):
    """q/k/v: (b, h, s, hd); meta: (b, 2) int32 [tokens_valid, kv_end].
    block_q/block_k: None -> adaptive (_auto_blocks)."""
    b, h, s, hd = q.shape
    block_q, block_k = _auto_blocks(s, block_q, block_k)
    sm_scale = 1.0 / math.sqrt(hd)
    # Pad to a COMMON multiple of both block sizes: padding to only the larger
    # would make the grid floor-division drop trailing q rows when the smaller
    # block does not divide it (e.g. block_q=96, block_k=128, s=128).
    blk = math.lcm(block_q, block_k)
    s_pad = -(-s // blk) * blk
    if s_pad != s:
        pad = ((0, 0), (0, 0), (0, s_pad - s), (0, 0))
        q, k, v = jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad)
    qf = q.reshape(b * h, s_pad, hd)
    kf = k.reshape(b * h, s_pad, hd)
    vf = v.reshape(b * h, s_pad, hd)

    kernel = functools.partial(_fwd_kernel, block_q=block_q, block_k=block_k,
                               sm_scale=sm_scale, seq_len=s_pad, n_heads=h,
                               tokens_total=tokens_total, causal=causal)
    interpret = jax.default_backend() != 'tpu'   # CPU tests run the interpreter
    out, lse = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b * h, s_pad // block_q),
            in_specs=[
                pl.BlockSpec((1, block_q, hd), lambda bi, qi, meta: (bi, qi, 0)),
                pl.BlockSpec((1, s_pad, hd), lambda bi, qi, meta: (bi, 0, 0)),
                pl.BlockSpec((1, s_pad, hd), lambda bi, qi, meta: (bi, 0, 0)),
            ],
            out_specs=(
                pl.BlockSpec((1, block_q, hd), lambda bi, qi, meta: (bi, qi, 0)),
                pl.BlockSpec((1, 1, s_pad), lambda bi, qi, meta: (bi, 0, 0)),
            ),
        ),
        out_shape=(jax.ShapeDtypeStruct((b * h, s_pad, hd), q.dtype),
                   jax.ShapeDtypeStruct((b * h, 1, s_pad), jnp.float32)),
        interpret=interpret,
    )(meta, qf, kf, vf)
    return (out.reshape(b, h, s_pad, hd)[:, :, :s],
            lse.reshape(b, h, s_pad)[:, :, :s])


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def _flash_attention_vjp(q, k, v, meta, tokens_total: int, causal: bool,
                         block_q: int, block_k: int, fold: bool):
    fwd = _flash_fwd_folded if fold else _flash_fwd
    out, _ = fwd(q, k, v, meta, tokens_total, causal, block_q, block_k)
    return out


def _fold_default(h: int, s: int) -> bool:
    """Head-fold policy: OFF — measured a consistent LOSS on v5e (r3 A/B,
    BENCHMARKS.md: 204M b=16x512 36.4% MFU folded vs 39.7% per-head; neutral
    to -1% everywhere else).  The batched (h, bq, hd) dots do not beat h
    separate grid programs: the per-head hd=64 contraction is the same MXU
    shape either way and Mosaic already pipelines the finer grid well.  Kept
    as an option for other head counts/hardware.  Env override:
    VALLE2_FLASH_FOLD=0/1."""
    import os
    env = os.environ.get('VALLE2_FLASH_FOLD')
    if env is not None:
        # Accept the common falsey spellings — 'False' silently enabling the
        # measured-slower path would be a nasty footgun.
        return env.strip().lower() not in ('0', 'false', 'off', 'no', '')
    return False


def flash_attention(q, k, v, meta, tokens_total: int, causal: bool = True,
                    block_q: int | None = None, block_k: int | None = None,
                    fold_heads: bool | None = None):
    """Prefix-LM flash attention.

    q, k, v: (b, h, s, hd); meta: (b, 2) int32 = [tokens_valid, kv_end] per row;
    tokens_total: static width of the source block; causal=False for the NAR's
    bidirectional audio block.  block_q/block_k default to adaptive sizes
    (see _auto_blocks); pass explicit values to override.  fold_heads=True runs
    the head-folded forward (one program per (batch, q-block) carrying all
    heads); None applies _fold_default.
    """
    if fold_heads is None:
        fold_heads = _fold_default(q.shape[1], q.shape[2])
    # Block sizes resolve inside each path (None -> adaptive): the per-head
    # kernels via _auto_blocks, the folded forward via _folded_blocks (its
    # (h, bq, bk) score tile has a different VMEM driver).  Explicit values
    # override BOTH paths' forward and the backward.
    return _flash_attention_vjp(q, k, v, meta, tokens_total, causal,
                                block_q, block_k, bool(fold_heads))


def reference_attention(q, k, v, meta, tokens_total: int, causal: bool = True):
    """jnp reference with the same mask semantics (tests)."""
    s = q.shape[2]
    scale = 1.0 / math.sqrt(q.shape[-1])
    scores = jnp.einsum('bhqd,bhkd->bhqk', q, k,
                        preferred_element_type=jnp.float32) * scale
    q_ids = jnp.arange(s)[:, None]
    k_ids = jnp.arange(s)[None, :]
    tokens_valid = meta[:, 0][:, None, None, None]
    kv_end = meta[:, 1][:, None, None, None]
    if causal:
        audio_vis = ((k_ids >= tokens_total) & (k_ids <= q_ids))[None, None]
    else:
        audio_vis = (k_ids >= tokens_total)[None, None] & jnp.ones(
            (1, 1, s, s), bool)
    attend = ((k_ids[None, None] < tokens_valid) | audio_vis) \
        & (k_ids[None, None] < kv_end)
    scores = jnp.where(attend, scores, NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum('bhqk,bhkd->bhqd', probs.astype(v.dtype), v,
                      preferred_element_type=jnp.float32).astype(v.dtype)


# ---------------------------------------------------------------------------
# Backward: blockwise recomputation using the saved logsumexp — no (s, s)
# residual in HBM in either direction.
# ---------------------------------------------------------------------------

def _bwd_dq_kernel(meta_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                   dq_ref, *, block_q: int, block_k: int, sm_scale: float,
                   seq_len: int, n_heads: int, tokens_total: int, causal: bool):
    """dq for one (batch*head, q-block): loop over kv blocks.

    ds = p * (dout·vᵀ − delta);  dq = scale · ds·k.
    """
    bh_idx = pl.program_id(0)
    q_blk = pl.program_id(1)
    b_idx = bh_idx // n_heads
    tokens_valid = meta_ref[b_idx, 0]
    kv_end = meta_ref[b_idx, 1]

    q = q_ref[0]                                                     # (bq, hd)
    do = do_ref[0]                                                   # (bq, hd)
    lse = lse_ref[0, 0, pl.ds(q_blk * block_q, block_q)][:, None]    # (bq, 1)
    delta = delta_ref[0, 0, pl.ds(q_blk * block_q, block_q)][:, None]
    q_ids = q_blk * block_q + jax.lax.broadcasted_iota(
        jnp.int32, (block_q, 1), 0)

    def body(kb, dq):
        k_blk = k_ref[0, pl.ds(kb * block_k, block_k), :]
        v_blk = v_ref[0, pl.ds(kb * block_k, block_k), :]
        sc = jax.lax.dot_general(q, k_blk, _CONTRACT_LAST,
                                 preferred_element_type=jnp.float32) * sm_scale
        k_ids = kb * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (1, block_k), 1)
        attend = _attend_block(q_ids, k_ids, tokens_valid, kv_end,
                               tokens_total, causal)
        p = jnp.where(attend, jnp.exp(sc - lse), 0.0)                # (bq, bk)
        dp = jax.lax.dot_general(do, v_blk, _CONTRACT_LAST,
                                 preferred_element_type=jnp.float32)
        ds = (p * (dp - delta)).astype(k_blk.dtype)
        return dq + jnp.dot(ds, k_blk, preferred_element_type=jnp.float32)

    if seq_len <= block_k:                 # single kv block: static bound
        n_blocks = 1
    else:
        n_blocks = _kv_block_bound(q_blk, block_q, block_k, tokens_valid,
                                   kv_end, causal)
    dq = jax.lax.fori_loop(0, n_blocks, body,
                           jnp.zeros((block_q, q.shape[-1]), jnp.float32))
    dq_ref[0] = (dq * sm_scale).astype(dq_ref.dtype)


def _bwd_dkv_kernel(meta_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                    dk_ref, dv_ref, *, block_q: int, block_k: int, sm_scale: float,
                    seq_len: int, n_heads: int, tokens_total: int, causal: bool):
    """dk, dv for one (batch*head, kv-block): loop over q blocks.

    dv = pᵀ·dout;  dk = scale · dsᵀ·q.
    """
    bh_idx = pl.program_id(0)
    k_blk_idx = pl.program_id(1)
    b_idx = bh_idx // n_heads
    tokens_valid = meta_ref[b_idx, 0]
    kv_end = meta_ref[b_idx, 1]

    k_blk = k_ref[0]                                                 # (bk, hd)
    v_blk = v_ref[0]                                                 # (bk, hd)
    k_ids = k_blk_idx * block_k + jax.lax.broadcasted_iota(
        jnp.int32, (1, block_k), 1)

    def body(qb, carry):
        dk, dv = carry
        q = q_ref[0, pl.ds(qb * block_q, block_q), :]
        do = do_ref[0, pl.ds(qb * block_q, block_q), :]
        lse = lse_ref[0, 0, pl.ds(qb * block_q, block_q)][:, None]
        delta = delta_ref[0, 0, pl.ds(qb * block_q, block_q)][:, None]
        q_ids = qb * block_q + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, 1), 0)
        sc = jax.lax.dot_general(q, k_blk, _CONTRACT_LAST,
                                 preferred_element_type=jnp.float32) * sm_scale
        attend = _attend_block(q_ids, k_ids, tokens_valid, kv_end,
                               tokens_total, causal)
        p = jnp.where(attend, jnp.exp(sc - lse), 0.0)                # (bq, bk)
        dv = dv + jax.lax.dot_general(p.astype(do.dtype), do, _CONTRACT_FIRST,
                                      preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(do, v_blk, _CONTRACT_LAST,
                                 preferred_element_type=jnp.float32)
        ds = (p * (dp - delta)).astype(q.dtype)
        dk = dk + jax.lax.dot_general(ds, q, _CONTRACT_FIRST,
                                      preferred_element_type=jnp.float32)
        return dk, dv

    hd = k_blk.shape[-1]
    # Block skip, mirrored from the forward bound: a pure-audio kv block
    # (first key ≥ tokens_valid, so no always-visible token keys) is invisible
    # to every q row before it (causal); a fully-padded block (first key ≥
    # kv_end) is invisible to everyone.  Skipped iterations contribute exactly
    # zero grads, so the skip is exact.
    n_q_blocks = pl.cdiv(seq_len, block_q)
    k0 = k_blk_idx * block_k
    if seq_len <= block_q:                 # single q block: static bound
        lower = 0
    elif causal:
        lower = jnp.where(k0 < tokens_valid, 0, jax.lax.div(k0, block_q))
        lower = jnp.where(k0 >= kv_end, n_q_blocks, lower)
    else:
        lower = jnp.where(k0 >= kv_end, n_q_blocks, 0)
    dk, dv = jax.lax.fori_loop(
        lower, n_q_blocks, body,
        (jnp.zeros((block_k, hd), jnp.float32), jnp.zeros((block_k, hd), jnp.float32)))
    dk_ref[0] = (dk * sm_scale).astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _bwd_fused_kernel(meta_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                      dq_ref, dk_ref, dv_ref, *, sm_scale: float, seq_len: int,
                      n_heads: int, tokens_total: int, causal: bool):
    """Whole-row single-pass backward: dq, dk, dv for one (batch*head) row.

    Recomputes the masked scores ONCE and shares p/ds across all three grads —
    5 dots total vs 7 for the two-kernel blockwise form (which recomputes sc and
    dp in each pass).  Only used when one kv block covers the row (s ≤
    FUSED_BWD_MAX_SEQ): p/dp/ds are (s, s) f32 temporaries in VMEM.
    """
    bh_idx = pl.program_id(0)
    b_idx = bh_idx // n_heads
    tokens_valid = meta_ref[b_idx, 0]
    kv_end = meta_ref[b_idx, 1]

    q = q_ref[0]                                                     # (s, hd)
    kk = k_ref[0]
    vv = v_ref[0]
    do = do_ref[0]
    lse = lse_ref[0, 0, pl.ds(0, seq_len)][:, None]                  # (s, 1)
    delta = delta_ref[0, 0, pl.ds(0, seq_len)][:, None]
    q_ids = jax.lax.broadcasted_iota(jnp.int32, (seq_len, 1), 0)
    k_ids = jax.lax.broadcasted_iota(jnp.int32, (1, seq_len), 1)

    sc = jax.lax.dot_general(q, kk, _CONTRACT_LAST,
                             preferred_element_type=jnp.float32) * sm_scale
    attend = _attend_block(q_ids, k_ids, tokens_valid, kv_end,
                           tokens_total, causal)
    p = jnp.where(attend, jnp.exp(sc - lse), 0.0)                    # (s, s)
    dv_ref[0] = jax.lax.dot_general(
        p.astype(do.dtype), do, _CONTRACT_FIRST,
        preferred_element_type=jnp.float32).astype(dv_ref.dtype)
    dp = jax.lax.dot_general(do, vv, _CONTRACT_LAST,
                             preferred_element_type=jnp.float32)
    ds = (p * (dp - delta)).astype(q.dtype)                          # (s, s)
    dq_ref[0] = (jnp.dot(ds, kk, preferred_element_type=jnp.float32)
                 * sm_scale).astype(dq_ref.dtype)
    dk_ref[0] = (jax.lax.dot_general(ds, q, _CONTRACT_FIRST,
                                     preferred_element_type=jnp.float32)
                 * sm_scale).astype(dk_ref.dtype)


def _flash_bwd(q, k, v, meta, out, lse, dout, tokens_total: int, causal: bool,
               block_q: int, block_k: int):
    b, h, s, hd = q.shape
    block_q, block_k = _auto_blocks(s, block_q, block_k)
    sm_scale = 1.0 / math.sqrt(hd)
    blk = math.lcm(block_q, block_k)     # see _flash_fwd: common multiple
    s_pad = -(-s // blk) * blk
    if s_pad != s:
        pad4 = ((0, 0), (0, 0), (0, s_pad - s), (0, 0))
        pad3 = ((0, 0), (0, 0), (0, s_pad - s))
        q, k, v = jnp.pad(q, pad4), jnp.pad(k, pad4), jnp.pad(v, pad4)
        out, dout = jnp.pad(out, pad4), jnp.pad(dout, pad4)
        lse = jnp.pad(lse, pad3)
    delta = jnp.sum(dout.astype(jnp.float32) * out.astype(jnp.float32), axis=-1)
    qf, kf, vf = (a.reshape(b * h, s_pad, hd) for a in (q, k, v))
    dof = dout.reshape(b * h, s_pad, hd)
    lsef = lse.reshape(b * h, 1, s_pad)
    deltaf = delta.reshape(b * h, 1, s_pad)
    interpret = jax.default_backend() != 'tpu'

    if block_q == block_k == s_pad and s_pad <= FUSED_BWD_MAX_SEQ:
        full_spec = pl.BlockSpec((1, s_pad, hd), lambda bi, meta: (bi, 0, 0))
        row_spec = pl.BlockSpec((1, 1, s_pad), lambda bi, meta: (bi, 0, 0))
        dq, dk, dv = pl.pallas_call(
            functools.partial(_bwd_fused_kernel, sm_scale=sm_scale, seq_len=s_pad,
                              n_heads=h, tokens_total=tokens_total, causal=causal),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(b * h,),
                in_specs=[full_spec, full_spec, full_spec, full_spec,
                          row_spec, row_spec],
                out_specs=(full_spec, full_spec, full_spec),
            ),
            out_shape=(jax.ShapeDtypeStruct((b * h, s_pad, hd), q.dtype),
                       jax.ShapeDtypeStruct((b * h, s_pad, hd), k.dtype),
                       jax.ShapeDtypeStruct((b * h, s_pad, hd), v.dtype)),
            interpret=interpret,
        )(meta, qf, kf, vf, dof, lsef, deltaf)
        unpad = lambda a: a.reshape(b, h, s_pad, hd)[:, :, :s]
        return unpad(dq), unpad(dk), unpad(dv)

    common = dict(block_q=block_q, block_k=block_k, sm_scale=sm_scale,
                  seq_len=s_pad, n_heads=h, tokens_total=tokens_total,
                  causal=causal)

    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, **common),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b * h, s_pad // block_q),
            in_specs=[
                pl.BlockSpec((1, block_q, hd), lambda bi, qi, meta: (bi, qi, 0)),
                pl.BlockSpec((1, s_pad, hd), lambda bi, qi, meta: (bi, 0, 0)),
                pl.BlockSpec((1, s_pad, hd), lambda bi, qi, meta: (bi, 0, 0)),
                pl.BlockSpec((1, block_q, hd), lambda bi, qi, meta: (bi, qi, 0)),
                pl.BlockSpec((1, 1, s_pad), lambda bi, qi, meta: (bi, 0, 0)),
                pl.BlockSpec((1, 1, s_pad), lambda bi, qi, meta: (bi, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, block_q, hd),
                                   lambda bi, qi, meta: (bi, qi, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((b * h, s_pad, hd), q.dtype),
        interpret=interpret,
    )(meta, qf, kf, vf, dof, lsef, deltaf)

    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, **common),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b * h, s_pad // block_k),
            in_specs=[
                pl.BlockSpec((1, s_pad, hd), lambda bi, ki, meta: (bi, 0, 0)),
                pl.BlockSpec((1, block_k, hd), lambda bi, ki, meta: (bi, ki, 0)),
                pl.BlockSpec((1, block_k, hd), lambda bi, ki, meta: (bi, ki, 0)),
                pl.BlockSpec((1, s_pad, hd), lambda bi, ki, meta: (bi, 0, 0)),
                pl.BlockSpec((1, 1, s_pad), lambda bi, ki, meta: (bi, 0, 0)),
                pl.BlockSpec((1, 1, s_pad), lambda bi, ki, meta: (bi, 0, 0)),
            ],
            out_specs=(
                pl.BlockSpec((1, block_k, hd), lambda bi, ki, meta: (bi, ki, 0)),
                pl.BlockSpec((1, block_k, hd), lambda bi, ki, meta: (bi, ki, 0)),
            ),
        ),
        out_shape=(jax.ShapeDtypeStruct((b * h, s_pad, hd), k.dtype),
                   jax.ShapeDtypeStruct((b * h, s_pad, hd), v.dtype)),
        interpret=interpret,
    )(meta, qf, kf, vf, dof, lsef, deltaf)

    unpad = lambda a: a.reshape(b, h, s_pad, hd)[:, :, :s]
    return unpad(dq), unpad(dk), unpad(dv)


def _fwd_rule(q, k, v, meta, tokens_total, causal, block_q, block_k, fold):
    fwd = _flash_fwd_folded if fold else _flash_fwd
    out, lse = fwd(q, k, v, meta, tokens_total, causal, block_q, block_k)
    return out, (q, k, v, meta, out, lse)


def _bwd_rule(tokens_total, causal, block_q, block_k, fold, residuals, g):
    # The backward always runs the blockwise (b*h)-grid kernels — the folded
    # layout only changes the forward; lse comes back in (b, h, s) either way.
    q, k, v, meta, out, lse = residuals
    dq, dk, dv = _flash_bwd(q, k, v, meta, out, lse, g, tokens_total, causal,
                            block_q, block_k)
    return dq, dk, dv, None


_flash_attention_vjp.defvjp(_fwd_rule, _bwd_rule)
