"""Fused AR decode step: the whole L-layer token update as ONE Pallas kernel.

Why (measured, NOTES.md r2): a decode step on the target runtime costs ~170 µs
on-device, of which the useful work is tiny — weights matmuls ~7 µs (XLA keeps the
default-scale weights VMEM-resident across while_loop iterations) and attention
~27 µs.  The other ~135 µs is per-op overhead across the ~150 HLO ops the unrolled
8-layer step emits (reference equivalent: the per-token torch loop at
/root/reference/valle/models/valle_ar.py:141-171 + modules.py:336-352).  Fusing the
transformer stack into one kernel removes that overhead class entirely.

Design:
- grid = (num_layers, n_chunks): sequential on TPU; Pallas pipelines the next
  grid step's weight and cache blocks into VMEM while the current one computes.
- The hidden state x lives in the output block (constant index map → stays resident
  in VMEM across grid steps; written back once at the end).
- **Head-major cache layout (rows, S, d)** (helper ``fused_cache_layout`` converts
  once after prefill): all heads of a row compute in TWO dots per chunk —
  scores = (block-diagonal q) (h, d) × kᵀ (d, S) → (h, S), and the PV product is
  the full cross (h, S) × (S, d) → (h, d) from which the per-head diagonal blocks
  are mask-reduced.  The cross terms cost h× redundant MACs (trivial on the MXU)
  but replace 2·h serialized M=1 dots + h separate softmaxes per row with 2 dots
  + one row-wise softmax — this runtime's Mosaic cannot reduce >2-D values, so
  the earlier per-(row, head) formulation was the only alternative.
- The attention is an **online softmax over cache chunks** (running max/denominator
  in SMEM, f32 accumulator in VMEM scratch).  The chunk index map CLAMPS at the
  last chunk containing ``index`` — Pallas skips the DMA when consecutive grid
  steps map to the same block, so slots past the valid prefix are neither fetched
  from HBM nor computed on (``@pl.when`` gates the arithmetic).  Chunking
  defaults to whole-S when it fits the VMEM block cap (forcing it measured
  NEGATIVE for full-length batch decodes, BENCHMARKS.md r2); the streaming
  path forces a chunk via ``config.decode_chunk`` so first-audio latency stops
  scaling with the cache width (r3), and ``VALLE2_FUSED_CHUNK`` overrides.
- The new token's k/v are merged IN REGISTER (the score/value for slot ``index``
  is patched via iota masks in the chunk that contains it), and the kernel emits
  per-layer k_new/v_new which the caller writes into the cache with two
  ``dynamic_update_slice`` ops for the whole stack.  The kernel itself is read-only
  on the cache (no aliasing, no manual DMA).
- The prefix-LM slot validity is computed in-kernel from per-row
  [tokens_len, prompt_len] scalars (SMEM prefetch) + the static [ttm, pm] layout,
  exactly mirroring ``ar._decode_fn``'s ``attend`` formula.
- int8 cache: values stored (rows, S, d) int8 with per-(slot, head) scales
  (rows, S, h); dequantized in VMEM (the fusion XLA would not do — it
  materialized the cache in HBM, BENCHMARKS.md r1 negative result).

Numerics match ``ops.transformer.transformer_decode_step`` (f32 softmax and
accumulation; the online-softmax chunking reorders the reduction within f32);
parity is tested in tests/test_kernels.py.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
DEFAULT_CHUNK = 256  # cache slots per grid step when chunking is forced


def env_chunk() -> int | None:
    """``VALLE2_FUSED_CHUNK`` override chunk size (see pick_chunk)."""
    import os
    val = os.environ.get('VALLE2_FUSED_CHUNK')
    return int(val) if val else None


BLOCK_BYTES_CAP = 8 * 1024 * 1024   # per-chunk k+v VMEM block budget


def pick_chunk(seq: int, rows: int, d: int, n_heads: int,
               cache_itemsize: int, quant: bool,
               forced: int | None = None) -> int:
    """Cache slots per grid step.

    Whole-``seq`` (single chunk) whenever the k+v block fits BLOCK_BYTES_CAP —
    chunking measured NEGATIVE/neutral at small per-chunk compute (BENCHMARKS
    r2: default scale AND S≈2.3k).  When the whole-S block is too big (large
    rows×d, e.g. 204M at num_beams=4: 28 MB), auto-chunk to the largest
    lane-aligned chunk under the cap — measured 1.59x over the XLA path there
    (the per-chunk compute is large enough to amortize the grid steps).
    ``forced`` (config.decode_chunk via chunk_for) or ``VALLE2_FUSED_CHUNK``
    override — streaming sets a forced chunk so the per-step HBM traffic stays
    bounded by the OCCUPIED prefix (the clamped index map re-reads the same
    chunk until the write index crosses into the next one) instead of scaling
    with the full cache width.  Callers pad the cache length to a chunk
    multiple (ar._decode_prefill does)."""
    # Env var WINS over config (and the implicit streaming default): it is the
    # operator's debugging escape hatch, documented as the final override.
    forced = env_chunk() or forced
    if forced is not None and 0 < forced < seq:
        return forced
    # k+v at cache_itemsize bytes each; int8 mode adds per-(slot, head) k/v
    # scales stored bfloat16 (2 bytes each — quantize_kv_rowmajor).
    per_slot = (rows * 2 * d * cache_itemsize
                + (rows * 4 * n_heads if quant else 0))
    if seq * per_slot <= BLOCK_BYTES_CAP:
        return seq
    chunk = max(128, (BLOCK_BYTES_CAP // per_slot) // 128 * 128)
    return min(chunk, seq)


def chunk_for(seq: int, rows: int, d: int, n_heads: int, cache_dtype,
              forced: int | None = None) -> int:
    """pick_chunk with itemsize/quant derived from the cache dtype — the ONE
    derivation shared by the gate, the prefill padding, and the kernel, so
    their chunk choices can never drift apart.  ``forced`` carries
    config.decode_chunk (0/None = auto)."""
    cd = jnp.dtype(cache_dtype)
    quant = cd == jnp.int8
    return pick_chunk(seq, rows, d, n_heads, 1 if quant else cd.itemsize, quant,
                      forced=forced)


def fused_cache_layout(cache):
    """Standard KVCache (L, rows, h, S, hd) → fused head-major layout
    (L, rows, S, h*hd), with int8 scales (L, rows, h, S, 1) → (L, rows, S, h).
    One device transpose, done ONCE after prefill (ar._decode_prefill)."""
    from ..ops.transformer import KVCache

    def to_rows(a):                       # (L, r, h, S, hd) -> (L, r, S, h*hd)
        L, r, h, S, hd = a.shape
        return a.transpose(0, 1, 3, 2, 4).reshape(L, r, S, h * hd)

    if cache.k_scale is not None:
        return KVCache(to_rows(cache.k), to_rows(cache.v),
                       cache.k_scale[..., 0].transpose(0, 1, 3, 2),
                       cache.v_scale[..., 0].transpose(0, 1, 3, 2))
    return KVCache(to_rows(cache.k), to_rows(cache.v))


def quantize_kv_rowmajor(x: jax.Array, n_heads: int):
    """Per-(slot, head) symmetric int8 quantization of a head-major (..., d)
    tensor → (int8 (..., d), scales (..., h)).  Matches
    ops.transformer.quantize_kv semantics on each head slice."""
    *lead, d = x.shape
    hd = d // n_heads
    # f32 quantization arithmetic regardless of the cache compute dtype — the
    # in-kernel _fake_quant_row predicts this roundtrip with an f32 scale, so
    # rounding here in bf16 would drift ±1 int8 step from its prediction.
    xs = x.reshape(*lead, n_heads, hd).astype(jnp.float32)
    amax = jnp.max(jnp.abs(xs), axis=-1, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(xs / scale), -127, 127).astype(jnp.int8)
    return (q.reshape(*lead, d),
            scale[..., 0].astype(jnp.bfloat16))


def _erf(x):
    """Abramowitz & Stegun 7.1.26 rational erf (max abs error 1.5e-7 — below
    bf16 resolution).  This Pallas TPU lowering implements neither erf nor erfc,
    so jax.nn.gelu(approximate=False) / lax.erf cannot be used in-kernel."""
    a1, a2, a3, a4, a5 = (0.254829592, -0.284496736, 1.421413741,
                          -1.453152027, 1.061405429)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    return jnp.sign(x) * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu_exact(x):
    """erf-form GELU (reference FeedForward numerics)."""
    return 0.5 * x * (1.0 + _erf(x * 0.7071067811865476))


def _layernorm(x, scale, bias, eps=1e-5):
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    return (x32 - mean) * jax.lax.rsqrt(var + eps) * scale + bias


def _q8_dot(x32, wq, scale_row):
    """``x @ dequant(wq)`` with dynamic per-row int8 activation quantization —
    the in-kernel twin of quantize.int8_matmul (same rounding: f32 activation
    scale, f32 rescale), so the fused int8-weight path matches the XLA int8
    path's numerics.  The dot runs s8 x s8 -> s32 on the MXU (2x the bf16
    rate) while streaming HALF the weight bytes.
    x32: (m, din) f32; wq: (din, dout) int8; scale_row: (dout,) f32."""
    ax = jnp.max(jnp.abs(x32), axis=-1, keepdims=True)
    sx = jnp.maximum(ax, 1e-8) / 127.0
    xq = jnp.clip(jnp.round(x32 / sx), -127, 127).astype(jnp.int8)
    y = jax.lax.dot_general(xq, wq, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
    return y.astype(jnp.float32) * sx * scale_row


def _q4_dot(x32, wq, scale, x_dtype):
    """``x @ dequant(wq)`` for int4 W4A16 weights — the in-kernel twin of
    quantize.int4_matmul (same dequant arithmetic: f32 group rescale, dot in
    the compute dtype), so the fused int4 path matches the XLA int4 path's
    numerics.  Streams QUARTER the bf16 weight bytes; activations stay fp
    (no activation quantization — the only lossy step is the 4-bit rounding).

    The half-split packing (quantize.quantize_linear_int4: byte k = input row
    k low nibble | row k + din/2 high nibble) means unpack is two plane-wise
    shifts and the matmul two plane dots — no row interleave, no concat, so
    the VPU work Mosaic sees is elementwise over each (din/2, dout) block.
    x32: (m, din) f32; wq: (din/2, dout) packed int8;
    scale: (groups, dout) float (groups even, plane-aligned)."""
    half, dout = wq.shape
    groups = scale.shape[0]
    gh = groups // 2
    g = half // gh
    p32 = wq.astype(jnp.int32)
    lo = jnp.right_shift(jnp.left_shift(p32, 28), 28)     # sign-extended low
    hi = jnp.right_shift(p32, 4)                          # arithmetic

    def plane(qp, sp):
        w = qp.astype(jnp.float32).reshape(gh, g, dout) \
            * sp.astype(jnp.float32)[:, None, :]
        return w.reshape(half, dout).astype(x_dtype)

    return jnp.dot(x32[:, :half].astype(x_dtype), plane(lo, scale[:gh]),
                   preferred_element_type=jnp.float32) \
        + jnp.dot(x32[:, half:].astype(x_dtype), plane(hi, scale[gh:]),
                  preferred_element_type=jnp.float32)


def _fake_quant_row(x_row, n_heads: int):
    """quantize→dequantize roundtrip of an (m, d) head-major slab, per-(row,
    head) scales — EXACTLY the int8 cache's view of freshly written slots:
    quantize_kv_rowmajor rounds with the f32 scale and later steps dequantize
    with the bf16-STORED scale, so this must too (rounding with the bf16 scale
    would drift ±1 int8 step from what step t+1 reads back).  m = 1 for the
    single-token kernel's self slot; m = K for the verify kernel's in-flight
    draft block."""
    m, d = x_row.shape
    hd = d // n_heads
    head_of = jax.lax.broadcasted_iota(jnp.int32, (m, d), 1) // hd   # (m, d)
    outs = jnp.zeros_like(x_row)
    for hh in range(n_heads):
        sel = head_of == hh
        xs = jnp.where(sel, x_row, 0.0)
        amax = jnp.max(jnp.abs(xs), axis=1, keepdims=True)           # (m, 1)
        sc32 = jnp.maximum(amax, 1e-8) / 127.0
        sc_stored = sc32.astype(jnp.bfloat16).astype(jnp.float32)
        q = jnp.clip(jnp.round(x_row / sc32), -127, 127)
        outs = jnp.where(sel, q * sc_stored, outs)
    return outs


# --- pieces shared by the single-token kernel and the K-token verify kernel
# (the verify kernel is the q-block generalization of the token step; their
# per-layer projection, FFN epilogue, host-side spec/input plumbing, VMEM
# budget, and cache writes are identical by construction — keep them in ONE
# place so a fix can never land in only one of the two) ---

def _ring_allreduce(partial, my, base, mp: int, outbox, comm, send_sem,
                    recv_sem, par: int):
    """Rank-ordered all-reduce of a per-rank partial over the 'model' axis,
    entirely in-kernel: ring all-GATHER via async remote copies into
    per-source-rank VMEM slots, then a rank-ordered sum — every rank computes
    the IDENTICAL f32 result (deterministic order), which keeps the hidden
    state bit-equal across model ranks (the tp_shard_map contract).

    ``par`` (static 0/1) picks the comm-slot plane and semaphore pair for this
    reduce site.  Why two planes suffice for any mp — safety of reuse across
    same-parity reduces (rank A's layer l+1 par-0 writes landing at its RIGHT
    neighbor R vs R's layer l par-0 plane): every reduce all-gathers from ALL
    ranks, and the parcel A receives in its LAST round (mp-2) ORIGINATED at R
    (it hopped the whole ring).  So A completing layer l par-1 requires R to
    have sent its par-1 partial, i.e. R COMPLETED layer l par-0 — its par-0
    plane and semaphore counts are fully consumed before A can begin layer
    l+1 par-0.  The strict ALTERNATION of exactly two sites is what makes
    this hold; a third same-parity site between them would break it.
    ``my``: this rank along 'model'; ``base``: linear device id of model-rank
    0 in this data row (row-major mesh).
    """
    outbox[...] = partial
    src = my
    right = base + jax.lax.rem(my + 1, mp)
    for step in range(mp - 1):
        rdma = pltpu.make_async_remote_copy(
            src_ref=outbox,
            dst_ref=comm.at[par, src],
            send_sem=send_sem,
            recv_sem=recv_sem,
            device_id=right,
            device_id_type=pltpu.DeviceIdType.LOGICAL)
        rdma.start()
        rdma.wait()
        src = jax.lax.rem(src - 1 + mp, mp)   # the parcel received came from src
        if step < mp - 2:
            outbox[...] = comm[par, src]
    # Rank-ORDERED sum: slot r's term sits at position r for every rank (own
    # partial substituted in place), so the f32 association is identical
    # everywhere — not just the same set of addends.
    acc = jnp.zeros_like(partial)
    for r in range(mp):
        acc = acc + jnp.where(r == my, partial, comm[par, r])
    return acc

def _project_qkv(y_ref, x_dtype, n1s_ref, n1b_ref, qkv_ref, qkv_scale_ref,
                 w_bits: int = 8):
    """Per-layer LN1 + fused QKV over the VMEM-resident hidden state.
    Returns the (rows_like, 3d) f32 projection; qkv_scale_ref is the weight
    scale ref (None = dense bf16 weights); ``w_bits`` (static 8/4) picks the
    int8 W8A8 or int4 W4A16 dot when scales are present."""
    x = y_ref[...].astype(jnp.float32)
    h1 = _layernorm(x, n1s_ref[0, 0].astype(jnp.float32),
                    n1b_ref[0, 0].astype(jnp.float32))
    if qkv_scale_ref is not None:
        if w_bits == 4:
            return _q4_dot(h1, qkv_ref[0], qkv_scale_ref[0], x_dtype)
        return _q8_dot(h1, qkv_ref[0], qkv_scale_ref[0, 0].astype(jnp.float32))
    return jnp.dot(h1.astype(x_dtype), qkv_ref[0],
                   preferred_element_type=jnp.float32)


def _ffn_epilogue(y_ref, x_dtype, attn, outw_ref, outb_ref, n2s_ref, n2b_ref,
                  f1w_ref, f1b_ref, f2w_ref, f2b_ref, wscales, allreduce=None,
                  w_bits: int = 8):
    """Per-layer epilogue after attention: out-proj + residual + LN2 + FFN +
    residual, written back into the resident hidden state.  wscales: None
    (dense) or (out, f1, f2) weight scale refs — int8 per-channel or int4
    per-group per ``w_bits`` (static 8/4).

    ``allreduce``: manual-TP hook ``(partial, parity) -> full`` — out/lin2 are
    Megatron row-parallel per rank (attn holds LOCAL heads, hmid the LOCAL
    hidden slice), so their dots are partial sums completed across the 'model'
    ring BEFORE the (replicated) bias is added once (``_ring_allreduce``)."""
    x = y_ref[...].astype(jnp.float32)

    def qdot(v, w_ref, s_ref):
        if w_bits == 4:
            return _q4_dot(v, w_ref[0], s_ref[0], x_dtype)
        return _q8_dot(v, w_ref[0], s_ref[0, 0].astype(jnp.float32))

    if wscales is not None:
        outs_ref, f1s_ref, f2s_ref = wscales
        o = qdot(attn, outw_ref, outs_ref)
    else:
        o = jnp.dot(attn.astype(x_dtype), outw_ref[0],
                    preferred_element_type=jnp.float32)
    if allreduce is not None:
        o = allreduce(o, 0)
    x = x + (o + outb_ref[0, 0])
    h2 = _layernorm(x, n2s_ref[0, 0].astype(jnp.float32),
                    n2b_ref[0, 0].astype(jnp.float32))
    if wscales is not None:
        hmid = qdot(h2, f1w_ref, f1s_ref) + f1b_ref[0, 0]
    else:
        hmid = jnp.dot(h2.astype(x_dtype), f1w_ref[0],
                       preferred_element_type=jnp.float32) + f1b_ref[0, 0]
    hmid = _gelu_exact(hmid)
    if wscales is not None:
        f2 = qdot(hmid, f2w_ref, f2s_ref)
    else:
        f2 = jnp.dot(hmid.astype(x_dtype), f2w_ref[0],
                     preferred_element_type=jnp.float32)
    if allreduce is not None:
        f2 = allreduce(f2, 1)
    x = x + (f2 + f2b_ref[0, 0])
    y_ref[...] = x.astype(y_ref.dtype)


def _unpack_rest(rest, quant: bool, quant_w: bool):
    """Split the trailing kernel refs: optional weight scales (int8 channel or
    int4 group), optional int8-cache scales, then (y, k_new, v_new, q, acc, m,
    l).  ``quant_w`` is truthy when weight scales are present (bits 8 or 4)."""
    rest = list(rest)
    wscales = None
    if quant_w:
        wscales = tuple(rest[:4])          # qkv, out, f1, f2 weight scales
        del rest[:4]
    if quant:
        cks_ref, cvs_ref = rest[:2]
        del rest[:2]
    else:
        cks_ref = cvs_ref = None
    return wscales, cks_ref, cvs_ref, rest


def _layer_io(p, cache, const_spec, layer_spec, cache_spec, h: int,
              quant: bool, w_bits: int):
    """Host-side in_specs + inputs shared by both kernels: x (const), the
    per-layer weight/norm refs, the cache blocks, then optional weight scales
    (int8 per-channel / int4 per-group) and int8 cache scales.  Callers
    prepend the scalar-prefetch meta and the token-block x to ``inputs``.
    ``w_bits``: 0 dense, 8 int8 W8A8, 4 int4 W4A16 (packed (L, in/2, out))."""
    wkey = {0: 'w', 8: 'q', 4: 'q4'}[w_bits]
    qkv_w, out_w = p['attn']['qkv'][wkey], p['attn']['out'][wkey]
    f1_w, f2_w = p['ffn']['lin1'][wkey], p['ffn']['lin2'][wkey]
    # Widths from the actual weights: under manual TP the attention width
    # (this rank's head slice = cache width) and the FFN hidden width are the
    # LOCAL 1/mp slices while the hidden-state width d stays full.  Input dims
    # come from the arrays too — int4 packs two input rows per byte.
    d = out_w.shape[-1]
    d_qkv = qkv_w.shape[-1]                           # 3 * d_att
    d_att = d_qkv // 3
    dff = f1_w.shape[-1]
    in_specs = [
        const_spec,                                   # x
        layer_spec(1, d), layer_spec(1, d),           # norm1 scale/bias
        layer_spec(qkv_w.shape[1], d_qkv),            # qkv w
        layer_spec(out_w.shape[1], d), layer_spec(1, d),  # out w, b
        layer_spec(1, d), layer_spec(1, d),           # norm2 scale/bias
        layer_spec(f1_w.shape[1], dff), layer_spec(1, dff),  # ffn1 w, b
        layer_spec(f2_w.shape[1], d), layer_spec(1, d),      # ffn2 w, b
        cache_spec(d_att), cache_spec(d_att),         # cache k, v
    ]
    inputs = [p['norm1']['scale'][:, None], p['norm1']['bias'][:, None],
              qkv_w,
              out_w, p['attn']['out']['b'][:, None],
              p['norm2']['scale'][:, None], p['norm2']['bias'][:, None],
              f1_w, p['ffn']['lin1']['b'][:, None],
              f2_w, p['ffn']['lin2']['b'][:, None],
              cache.k, cache.v]
    if w_bits == 8:
        in_specs += [layer_spec(1, d_qkv), layer_spec(1, d),
                     layer_spec(1, dff), layer_spec(1, d)]
        inputs += [p['attn']['qkv']['scale'][:, None],
                   p['attn']['out']['scale'][:, None],
                   p['ffn']['lin1']['scale'][:, None],
                   p['ffn']['lin2']['scale'][:, None]]
    elif w_bits == 4:
        scales = [p['attn']['qkv']['scale4'], p['attn']['out']['scale4'],
                  p['ffn']['lin1']['scale4'], p['ffn']['lin2']['scale4']]
        in_specs += [layer_spec(s.shape[1], s.shape[2]) for s in scales]
        inputs += scales
    if quant:
        in_specs += [cache_spec(h), cache_spec(h)]
        inputs += [cache.k_scale, cache.v_scale]
    return in_specs, inputs, (qkv_w, out_w, f1_w, f2_w)


def _vmem_budget(weights, num_layers: int, rows: int, chunk: int, d: int,
                 h: int, cache_dtype, quant: bool, resident_rows: int) -> int:
    """Mosaic scoped-VMEM limit: its 16 MB default is far under the 128 MB a
    v5e core has; size from the actual double-buffered block set (2x streamed
    weights + cache chunk, + resident outs/scratch + slack)."""
    qkv_w, out_w, f1_w, f2_w = weights
    wbytes = (qkv_w.nbytes + out_w.nbytes + f1_w.nbytes + f2_w.nbytes) \
        // num_layers
    cbytes = (rows * chunk * 2 * d * jnp.dtype(cache_dtype).itemsize
              + (rows * chunk * 4 * h if quant else 0))   # bf16 k/v scales
    resident = (3 * resident_rows * d * 4) \
        + 2 * num_layers * resident_rows * d * 2
    # 12 MB slack / 36 MB floor: the estimate excludes int4 group scales and
    # Mosaic's own stack padding — int4 weights x int8 KV at rows=60, S=512
    # measured 752 KB over the old 32 MB floor (QUANT_QUALITY_V3 grid); the
    # core has 128 MB, so generosity here costs nothing.
    return int(min(110 * 2 ** 20,
                   max(36 * 2 ** 20,
                       2 * (wbytes + cbytes) + resident + 12 * 2 ** 20)))


def _write_rows_per_slot(buf, new, index):
    """Per-row cache write: one (L, 1.., w) slab per row at its own slot —
    vmapped single-row dynamic_update_slice (an XLA scatter over rows)."""
    zero = jnp.int32(0)

    def one_row(buf_r, new_r, i):             # (L, S, w), (L, m, w), scalar
        return jax.lax.dynamic_update_slice(buf_r, new_r, (zero, i, zero))
    return jax.vmap(one_row, in_axes=(1, 1, 0), out_axes=1)(buf, new, index)


def _kernel(meta_ref, x_ref, n1s_ref, n1b_ref, qkv_ref, outw_ref, outb_ref,
            n2s_ref, n2b_ref, f1w_ref, f1b_ref, f2w_ref, f2b_ref, ck_ref, cv_ref,
            *rest, n_heads: int, ttm: int, pm: int, rows: int, seq: int,
            chunk: int, quant: bool, w_bits: int, per_row: bool, mp: int = 1):
    wscales, cks_ref, cvs_ref, rest = _unpack_rest(rest, quant, w_bits)
    y_ref, knew_ref, vnew_ref, q_s, acc_s, m_s, l_s = rest[:7]
    l = pl.program_id(0)
    c = pl.program_id(1)
    n_chunks = seq // chunk
    # meta[0] is the DEEPEST row's index — it drives the chunk-skip clamp;
    # per-row indices (continuous batching) follow at meta[1 + 2*rows + r].
    idx = meta_ref[0]
    maxc = idx // chunk

    # Manual TP (mp > 1): the trailing scratch is the ring-all-reduce comm set
    # and meta carries [model rank, linear id of model-rank 0 in this data row]
    # after the per-row fields (fused_decode_step appends them).
    if mp > 1:
        outbox, comm, s0s, s0r, s1s, s1r = rest[7:]
        tp_off = 1 + (3 if per_row else 2) * rows
        my, base = meta_ref[tp_off], meta_ref[tp_off + 1]

        def allreduce(partial, par):
            send, recv = ((s0s, s0r), (s1s, s1r))[par]
            return _ring_allreduce(partial, my, base, mp, outbox, comm,
                                   send, recv, par)
    else:
        allreduce = None

    d = x_ref.shape[-1]                  # d_model: hidden state stays FULL width
    d_att = knew_ref.shape[-1]           # this rank's head slice (== d unless TP)
    hd = d_att // n_heads
    scale = 1.0 / math.sqrt(hd)
    # head_mask[i, j] = (feature j belongs to head i) — builds the block-diagonal
    # q and extracts the per-head diagonal blocks of the PV cross product.
    head_of = jax.lax.broadcasted_iota(jnp.int32, (n_heads, d_att), 1) // hd
    head_id = jax.lax.broadcasted_iota(jnp.int32, (n_heads, d_att), 0)
    head_mask = (head_of == head_id).astype(jnp.float32)             # (h, d_att)

    @pl.when((l == 0) & (c == 0))
    def _seed():
        y_ref[...] = x_ref[...]

    # --- once per layer: LN1 + fused QKV; q and the running softmax state live
    # in scratch, k_new/v_new in this layer's (VMEM-resident) output blocks ---
    @pl.when(c == 0)
    def _project():
        qkv = _project_qkv(y_ref, x_ref.dtype, n1s_ref, n1b_ref, qkv_ref,
                           wscales[0] if w_bits else None,
                           w_bits=w_bits)                    # (rows, 3*d_att)
        q_s[...] = qkv[:, :d_att] * scale
        knew_ref[0] = qkv[:, d_att:2 * d_att].astype(knew_ref.dtype)
        vnew_ref[0] = qkv[:, 2 * d_att:].astype(vnew_ref.dtype)
        acc_s[...] = jnp.zeros_like(acc_s)
        for r in range(rows):
            for hh in range(n_heads):
                m_s[r, hh] = NEG_INF
                l_s[r, hh] = 0.0

    contract_last = (((1,), (1,)), ((), ()))                 # A (m,d) @ B (n,d)ᵀ
    contract_inner = (((1,), (0,)), ((), ()))                # A @ B

    @pl.when(c <= maxc)
    def _attend():
        slot_row = c * chunk + jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)
        for r in range(rows):
            tl_r = meta_ref[1 + r]
            pl_r = meta_ref[1 + rows + r]
            idx_r = meta_ref[1 + 2 * rows + r] if per_row else idx
            is_idx = slot_row == idx_r                       # (1, chunk)
            attend = ((slot_row < tl_r)
                      | ((slot_row >= ttm) & (slot_row < ttm + pl_r))
                      | ((slot_row >= ttm + pm) & (slot_row <= idx_r)))  # (1, chunk)
            q_row = q_s[r:r + 1, :]                          # (1, d) f32, scaled
            q_bd = q_row * head_mask                         # (h, d) block-diag
            k2 = ck_ref[0, r].astype(jnp.float32)            # (chunk, d)
            v2 = cv_ref[0, r].astype(jnp.float32)
            if quant:
                # Per-(slot, head) scales (chunk, h), broadcast over each head's
                # hd lanes via a (chunk, h) x (h, d) dot with the 0/1 head mask
                # (Mosaic rejects the equivalent repeat as a shape cast).
                ks = cks_ref[0, r].astype(jnp.float32)       # (chunk, h)
                vs = cvs_ref[0, r].astype(jnp.float32)
                k2 = k2 * jax.lax.dot_general(
                    ks, head_mask, contract_inner,
                    preferred_element_type=jnp.float32)
                v2 = v2 * jax.lax.dot_general(
                    vs, head_mask, contract_inner,
                    preferred_element_type=jnp.float32)
            kn = knew_ref[0][r:r + 1].astype(jnp.float32)    # (1, d)
            vn = vnew_ref[0][r:r + 1].astype(jnp.float32)
            if quant:
                # Future steps will see the quantize→dequantize roundtrip of
                # the new slot, so the self contribution must too.
                kn = _fake_quant_row(kn, n_heads)
                vn = _fake_quant_row(vn, n_heads)
            # All heads at once: scores (h, chunk) in one dot.
            s = jax.lax.dot_general(q_bd.astype(k2.dtype), k2, contract_last,
                                    preferred_element_type=jnp.float32)
            s_new = jnp.sum(q_bd * kn, axis=1, keepdims=True)   # (h, 1)
            s = jnp.where(attend, jnp.where(is_idx, s_new, s), NEG_INF)
            m_prev = jnp.concatenate(
                [m_s[r, hh].reshape(1, 1) for hh in range(n_heads)], axis=0)
            l_prev = jnp.concatenate(
                [l_s[r, hh].reshape(1, 1) for hh in range(n_heads)], axis=0)
            m_cur = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
            alpha = jnp.exp(m_prev - m_cur)                  # (h, 1)
            p = jnp.exp(s - m_cur)                           # (h, chunk)
            p_idx = jnp.sum(jnp.where(is_idx, p, 0.0), axis=1, keepdims=True)
            p_old = jnp.where(is_idx, 0.0, p)
            # Full PV cross (h, d); the per-head diagonal blocks are selected by
            # head_mask below (the off-diagonal MACs are redundant but keep the
            # MXU fed with ONE (h, chunk)x(chunk, d) dot instead of h serialized
            # M=1 dots).
            o_full = jax.lax.dot_general(p_old, v2, contract_inner,
                                         preferred_element_type=jnp.float32)
            o_head = (o_full + p_idx * vn) * head_mask       # (h, d) diag blocks
            alpha_vec = jnp.sum(alpha * head_mask, axis=0, keepdims=True)  # (1, d)
            contrib = jnp.sum(o_head, axis=0, keepdims=True)               # (1, d)
            acc_s[r:r + 1, :] = acc_s[r:r + 1, :] * alpha_vec + contrib
            for hh in range(n_heads):
                m_s[r, hh] = m_cur[hh, 0]
                l_s[r, hh] = l_prev[hh, 0] * alpha[hh, 0] + jnp.sum(p[hh])

    # --- once per layer, after the last chunk: normalize, project, FFN ---
    @pl.when(c == n_chunks - 1)
    def _finish():
        rows_out = []
        for r in range(rows):
            inv = jnp.concatenate(
                [(1.0 / jnp.maximum(l_s[r, hh], 1e-30)).reshape(1, 1)
                 for hh in range(n_heads)], axis=0)          # (h, 1)
            inv_vec = jnp.sum(inv * head_mask, axis=0, keepdims=True)   # (1, d)
            rows_out.append(acc_s[r:r + 1, :] * inv_vec)
        attn = jnp.concatenate(rows_out, axis=0)             # (rows, d_att)
        _ffn_epilogue(y_ref, x_ref.dtype, attn, outw_ref, outb_ref, n2s_ref,
                      n2b_ref, f1w_ref, f1b_ref, f2w_ref, f2b_ref,
                      wscales[1:] if w_bits else None, allreduce=allreduce,
                      w_bits=w_bits)


def fused_decode_step(p, x, n_heads: int, cache, index, tokens_lens, codes_lens,
                      ttm: int, pm: int, chunk_override: int | None = None,
                      tp: tuple | None = None):
    """One token step through the whole stacked-layer transformer as one kernel.

    p: stacked layer pytree (L, ...) (see ops.transformer.transformer_init);
    x: (rows, 1, d) current token embedding; cache: KVCache in the FUSED
    head-major layout — k/v (L, rows, S, d) (``fused_cache_layout``), int8 with
    per-(slot, head) scales (L, rows, S, h); index: scalar absolute slot, or a
    (rows,) vector of PER-ROW slots (continuous batching — sessions at
    different decode depths; the chunk-skip clamp then follows the deepest
    row, shallower rows' extra slots are masked by the attend formula);
    tokens_lens/codes_lens: (rows,) per-row true lengths (already repeated per
    beam); ttm/pm: static layout widths.
    ``tp``: manual tensor parallelism inside a jax.shard_map —
    ``(my_rank, base_device_id, mp)`` with mp static: ``p``/``cache`` hold this
    rank's Megatron split (n_heads = LOCAL heads, cache width d_att = d/mp,
    ffn width dff/mp) while x stays full width; the two row-parallel partials
    per layer all-reduce over the 'model' ring IN-KERNEL (``_ring_allreduce``).
    Requires dense (bf16/f32) weights — the int8-weight path's dynamic
    activation scale would need a second collective per dot (models/ar.py
    falls back to the XLA TP path for int8 weights).
    Returns (y (rows, 1, d), new_cache) — matches transformer_decode_step under
    the same mask (modulo the layout transform).
    """
    from ..ops.transformer import KVCache

    num_layers, rows, seq, d_att = cache.k.shape
    d = x.shape[-1]
    h = n_heads
    quant = cache.k_scale is not None
    w_bits = 8 if 'q' in p['attn']['qkv'] \
        else (4 if 'q4' in p['attn']['qkv'] else 0)   # quantize.py layouts
    per_row = jnp.ndim(index) == 1
    mp = tp[2] if tp is not None else 1
    # int8 W8A8 needs a GLOBAL per-token activation scale (one extra
    # collective per dot) — excluded from TP; int4 W4A16 has fp activations,
    # so each rank dequants its ranked-packed slice locally and the existing
    # ring all-reduce completes the fp partials.
    assert not (mp > 1 and w_bits == 8), \
        'TP fused decode cannot run int8 weights (models/ar.py falls back)'
    chunk = chunk_for(seq, rows, d_att, n_heads, cache.k.dtype,
                      forced=chunk_override)
    if seq % chunk:
        # Falling back to whole-S here would re-create the Mosaic VMEM OOM
        # that chunking exists to prevent — fail informatively instead.
        raise ValueError(
            f'cache length {seq} is not a multiple of the required chunk '
            f'{chunk}; pad the cache to a multiple (ar._decode_prefill does)')
    n_chunks = seq // chunk
    x2 = x[:, 0, :]
    index = jnp.asarray(index, jnp.int32)
    meta_parts = [jnp.max(index).reshape(1),
                  jnp.asarray(tokens_lens, jnp.int32).reshape(rows),
                  jnp.asarray(codes_lens, jnp.int32).reshape(rows)]
    if per_row:
        meta_parts.append(index.reshape(rows))
    if mp > 1:
        meta_parts.append(jnp.stack([jnp.asarray(tp[0], jnp.int32),
                                     jnp.asarray(tp[1], jnp.int32)]))
    meta = jnp.concatenate(meta_parts)

    kernel = functools.partial(_kernel, n_heads=n_heads, ttm=ttm, pm=pm,
                               rows=rows, seq=seq, chunk=chunk, quant=quant,
                               w_bits=w_bits, per_row=per_row, mp=mp)
    interpret = jax.default_backend() != 'tpu'
    layer_spec = lambda *shape: pl.BlockSpec(
        (1, *shape), lambda l, c, meta: (l,) + (0,) * len(shape))
    const_spec = pl.BlockSpec((rows, d), lambda l, c, meta: (0, 0))
    # Clamp the chunk index at the last one containing ``index``: consecutive
    # grid steps that map to the same block skip the HBM→VMEM DMA entirely.
    cache_spec = lambda width: pl.BlockSpec(
        (1, rows, chunk, width),
        lambda l, c, meta: (l, 0, jnp.minimum(c, meta[0] // chunk), 0))

    in_specs, inputs, weights = _layer_io(p, cache, const_spec, layer_spec,
                                          cache_spec, h, quant, w_bits)
    inputs = [meta, x2] + inputs
    new_dtype = x.dtype if quant else cache.k.dtype
    scratch = [
        pltpu.VMEM((rows, d_att), jnp.float32),           # q (pre-scaled)
        pltpu.VMEM((rows, d_att), jnp.float32),           # attention accum
        pltpu.SMEM((rows, h), jnp.float32),               # running max
        pltpu.SMEM((rows, h), jnp.float32),               # running denom
    ]
    comm_bytes = 0
    if mp > 1:
        scratch += [
            pltpu.VMEM((rows, d), jnp.float32),           # all-reduce outbox
            pltpu.VMEM((2, mp, rows, d), jnp.float32),    # per-source-rank slots
            pltpu.SemaphoreType.DMA(()), pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()), pltpu.SemaphoreType.DMA(()),
        ]
        comm_bytes = (2 * mp + 1) * rows * d * 4
    vmem_limit = _vmem_budget(weights, num_layers, rows, chunk, d_att, h,
                              cache.k.dtype, quant, resident_rows=rows) \
        + comm_bytes
    if mp > 1:
        compiler_params = pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit, has_side_effects=True, collective_id=1)
    else:
        compiler_params = pltpu.CompilerParams(vmem_limit_bytes=vmem_limit)

    y, k_new, v_new = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(num_layers, n_chunks),
            in_specs=in_specs,
            out_specs=(
                const_spec,                                   # y (VMEM-resident)
                pl.BlockSpec((1, rows, d_att), lambda l, c, meta: (l, 0, 0)),
                pl.BlockSpec((1, rows, d_att), lambda l, c, meta: (l, 0, 0)),
            ),
            scratch_shapes=scratch,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((rows, d), x.dtype),
            jax.ShapeDtypeStruct((num_layers, rows, d_att), new_dtype),
            jax.ShapeDtypeStruct((num_layers, rows, d_att), new_dtype),
        ),
        compiler_params=compiler_params,
        interpret=interpret,
    )(*inputs)

    zero = jnp.int32(0)
    k_new = k_new[:, :, None, :]                      # (L, rows, 1, d)
    v_new = v_new[:, :, None, :]
    if per_row:
        def write(buf, new):
            return _write_rows_per_slot(buf, new, index)
    else:
        idx4 = (zero, zero, index, zero)

        def write(buf, new):
            return jax.lax.dynamic_update_slice(buf, new, idx4)
    if quant:
        kq, ks = quantize_kv_rowmajor(k_new, n_heads)
        vq, vs = quantize_kv_rowmajor(v_new, n_heads)
        return y[:, None, :], KVCache(
            write(cache.k, kq), write(cache.v, vq),
            write(cache.k_scale, ks), write(cache.v_scale, vs))
    return y[:, None, :], KVCache(write(cache.k, k_new), write(cache.v, v_new))


# ---------------------------------------------------------------------------
# Fused q-block verify step (speculative decoding)
# ---------------------------------------------------------------------------

def _verify_kernel(meta_ref, x_ref, n1s_ref, n1b_ref, qkv_ref, outw_ref,
                   outb_ref, n2s_ref, n2b_ref, f1w_ref, f1b_ref, f2w_ref,
                   f2b_ref, ck_ref, cv_ref, *rest, n_heads: int, ttm: int,
                   pm: int, rows: int, seq: int, chunk: int, q_blk: int,
                   quant: bool, w_bits: int, mp: int = 1):
    """The whole L-layer K-token verify block as one kernel.

    Differences from ``_kernel`` (the single-token step):
    - ``rows * q_blk`` query rows flow through the projections/FFN (better MXU
      fill than the single-token step, at the same weight traffic).
    - Attention scores per cache row are ONE (K·h, chunk) dot — the
      block-diagonal q trick extended to K queries (score row i·h + hh is
      query i, head hh).
    - **In-block causality in-register**: cache slots [idx_r, idx_r + K) hold
      stale data (this same call produces their k/v), so they are masked out
      of the cache reads and the block's scores come from the freshly
      projected k_new/v_new, with query i allowed keys j <= i — applied once,
      at the LAST visited chunk (the online softmax is order-invariant modulo
      f32 reordering).  int8 caches see the quantize→dequantize roundtrip of
      the new rows, exactly what the next turn reads back.
    """
    wscales, cks_ref, cvs_ref, rest = _unpack_rest(rest, quant, w_bits)
    y_ref, knew_ref, vnew_ref, q_s, acc_s, m_s, l_s = rest[:7]
    l = pl.program_id(0)
    c = pl.program_id(1)
    n_chunks = seq // chunk
    idx_max = meta_ref[0]
    maxc = idx_max // chunk          # cache reads stop at the deepest prefix

    # Manual TP: comm scratch + [rank, base] meta exactly as in ``_kernel``
    # (the verify meta always carries per-row indices, so tp sits at 1 + 3r).
    if mp > 1:
        outbox, comm, s0s, s0r, s1s, s1r = rest[7:]
        tp_off = 1 + 3 * rows
        my, base = meta_ref[tp_off], meta_ref[tp_off + 1]

        def allreduce(partial, par):
            send, recv = ((s0s, s0r), (s1s, s1r))[par]
            return _ring_allreduce(partial, my, base, mp, outbox, comm,
                                   send, recv, par)
    else:
        allreduce = None

    d = x_ref.shape[-1]                  # d_model: hidden state stays FULL width
    d_att = knew_ref.shape[-1]           # this rank's head slice (== d unless TP)
    hd = d_att // n_heads
    kh = q_blk * n_heads
    scale = 1.0 / math.sqrt(hd)
    # Per-score-row (query i, head hh) helper masks; qi = i for row i*h + hh.
    qi_col = jax.lax.broadcasted_iota(jnp.int32, (kh, 1), 0) // n_heads
    # sel[(i*h + hh), j] = (j == i): replicates q rows to score rows and (via
    # a contraction over axis 0) reduces per-head score rows back to queries.
    sel = (jax.lax.broadcasted_iota(jnp.int32, (kh, q_blk), 0) // n_heads
           == jax.lax.broadcasted_iota(jnp.int32, (kh, q_blk), 1)) \
        .astype(jnp.float32)
    # mask_K[(i*h + hh), f] = (feature f belongs to head hh).
    mask_k = (jax.lax.broadcasted_iota(jnp.int32, (kh, d_att), 0) % n_heads
              == jax.lax.broadcasted_iota(jnp.int32, (kh, d_att), 1) // hd) \
        .astype(jnp.float32)
    # head_mask[(hh), f] — int8 cache scale broadcast, as in ``_kernel``.
    head_mask = (jax.lax.broadcasted_iota(jnp.int32, (n_heads, d_att), 0)
                 == jax.lax.broadcasted_iota(jnp.int32, (n_heads, d_att), 1) // hd) \
        .astype(jnp.float32)

    @pl.when((l == 0) & (c == 0))
    def _seed():
        y_ref[...] = x_ref[...]

    @pl.when(c == 0)
    def _project():
        qkv = _project_qkv(y_ref, x_ref.dtype, n1s_ref, n1b_ref, qkv_ref,
                           wscales[0] if w_bits else None,
                           w_bits=w_bits)                  # (rows*K, 3*d_att)
        q_s[...] = qkv[:, :d_att] * scale
        knew_ref[0] = qkv[:, d_att:2 * d_att].astype(knew_ref.dtype)
        vnew_ref[0] = qkv[:, 2 * d_att:].astype(vnew_ref.dtype)
        acc_s[...] = jnp.zeros_like(acc_s)
        m_s[...] = jnp.full_like(m_s, NEG_INF)
        l_s[...] = jnp.zeros_like(l_s)

    contract_last = (((1,), (1,)), ((), ()))                 # A (m,d) @ B (n,d)T
    contract_inner = (((1,), (0,)), ((), ()))                # A @ B
    contract_rows = (((0,), (0,)), ((), ()))                 # A(kh,m)T @ B(kh,n)

    @pl.when(c <= maxc)
    def _attend():
        is_last = c == maxc
        slot = c * chunk + jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)
        for r in range(rows):
            tl_r = meta_ref[1 + r]
            pl_r = meta_ref[1 + rows + r]
            idx_r = meta_ref[1 + 2 * rows + r]
            rs, re = r * kh, (r + 1) * kh
            # (1, chunk) attend, broadcast over the kh score rows: the CACHE
            # supplies only prompt regions + COMMITTED generated slots
            # (< idx_r) — visible to every query in the block.  The in-flight
            # block [idx_r, idx_r + K) is stale in the cache (this call
            # produces its k/v) and is served from registers below with
            # per-query causality (s_blk / blk_ok) — do NOT widen this mask
            # to the XLA path's `slot <= idx_r + qi` (models/ar.py): that
            # would double-count the in-flight keys.
            attend = ((slot < tl_r)
                      | ((slot >= ttm) & (slot < ttm + pl_r))
                      | ((slot >= ttm + pm) & (slot < idx_r)))   # (1, chunk)
            q_rows = q_s[r * q_blk:(r + 1) * q_blk, :]       # (K, d) pre-scaled
            q_bd = jax.lax.dot_general(
                sel, q_rows, contract_inner,
                preferred_element_type=jnp.float32) * mask_k  # (kh, d)
            k2 = ck_ref[0, r].astype(jnp.float32)            # (chunk, d)
            v2 = cv_ref[0, r].astype(jnp.float32)
            if quant:
                ks = cks_ref[0, r].astype(jnp.float32)       # (chunk, h)
                vs = cvs_ref[0, r].astype(jnp.float32)
                k2 = k2 * jax.lax.dot_general(
                    ks, head_mask, contract_inner,
                    preferred_element_type=jnp.float32)
                v2 = v2 * jax.lax.dot_general(
                    vs, head_mask, contract_inner,
                    preferred_element_type=jnp.float32)
            kn = knew_ref[0][r * q_blk:(r + 1) * q_blk].astype(jnp.float32)
            vn = vnew_ref[0][r * q_blk:(r + 1) * q_blk].astype(jnp.float32)
            if quant:
                kn = _fake_quant_row(kn, n_heads)
                vn = _fake_quant_row(vn, n_heads)
            s = jax.lax.dot_general(q_bd, k2, contract_last,
                                    preferred_element_type=jnp.float32)
            s = jnp.where(attend, s, NEG_INF)                # (kh, chunk)
            # In-block scores (query i ~ key j <= i), applied ONCE (last chunk).
            s_blk = jax.lax.dot_general(q_bd, kn, contract_last,
                                        preferred_element_type=jnp.float32)
            blk_ok = (jax.lax.broadcasted_iota(jnp.int32, (kh, q_blk), 1)
                      <= qi_col) & is_last
            s_blk = jnp.where(blk_ok, s_blk, NEG_INF)        # (kh, K)
            m_prev = m_s[rs:re]                              # (kh, 1)
            l_prev = l_s[rs:re]
            m_cur = jnp.maximum(
                m_prev, jnp.maximum(jnp.max(s, axis=1, keepdims=True),
                                    jnp.max(s_blk, axis=1, keepdims=True)))
            alpha = jnp.exp(m_prev - m_cur)                  # (kh, 1)
            p = jnp.exp(s - m_cur)                           # (kh, chunk)
            p_blk = jnp.exp(s_blk - m_cur)                   # (kh, K)
            l_add = (jnp.sum(p, axis=1, keepdims=True)
                     + jnp.sum(p_blk, axis=1, keepdims=True))
            o = (jax.lax.dot_general(p, v2, contract_inner,
                                     preferred_element_type=jnp.float32)
                 + jax.lax.dot_general(p_blk, vn, contract_inner,
                                       preferred_element_type=jnp.float32))
            o_head = o * mask_k                              # (kh, d) diag blocks
            contrib = jax.lax.dot_general(sel, o_head, contract_rows,
                                          preferred_element_type=jnp.float32)
            alpha_mat = jax.lax.dot_general(sel, alpha * mask_k, contract_rows,
                                            preferred_element_type=jnp.float32)
            qs_, qe_ = r * q_blk, (r + 1) * q_blk
            acc_s[qs_:qe_, :] = acc_s[qs_:qe_, :] * alpha_mat + contrib
            m_s[rs:re] = m_cur
            l_s[rs:re] = l_prev * alpha + l_add

    @pl.when(c == n_chunks - 1)
    def _finish():
        rows_out = []
        for r in range(rows):
            rs, re = r * kh, (r + 1) * kh
            inv = 1.0 / jnp.maximum(l_s[rs:re], 1e-30)       # (kh, 1)
            inv_mat = jax.lax.dot_general(sel, inv * mask_k, contract_rows,
                                          preferred_element_type=jnp.float32)
            rows_out.append(acc_s[r * q_blk:(r + 1) * q_blk, :] * inv_mat)
        attn = jnp.concatenate(rows_out, axis=0)             # (rows*K, d_att)
        _ffn_epilogue(y_ref, x_ref.dtype, attn, outw_ref, outb_ref, n2s_ref,
                      n2b_ref, f1w_ref, f1b_ref, f2w_ref, f2b_ref,
                      wscales[1:] if w_bits else None, allreduce=allreduce,
                      w_bits=w_bits)


def fused_verify_step(p, x, n_heads: int, cache, index, tokens_lens,
                      codes_lens, ttm: int, pm: int,
                      chunk_override: int | None = None,
                      tp: tuple | None = None):
    """One K-token verify block through the whole stacked-layer transformer as
    one kernel — the speculative-decoding twin of ``fused_decode_step``.

    p/cache/layout exactly as ``fused_decode_step``; x: (rows, K, d) draft
    block embeddings at absolute positions ``index[r] .. index[r] + K - 1``;
    index: (rows,) per-row write-start slots (speculative rows advance by
    different amounts per turn).  Returns (y (rows, K, d), new_cache with all
    K slots written per row) — matches ``transformer_decode_step`` fed the
    q-block with the speculative attend mask (models/ar.py
    ``_decode_advance_spec``), modulo the fused layout.

    Why: the verify pass was the XLA block step, measured at ~1.6-1.7x the
    fused single-token step (BENCHMARKS.md r3 spec section) — exactly the
    cost ratio that set speculation's break-even acceptance.  Fusing the
    verify block removes the same ~135 us/step per-op overhead class the
    decode kernel removes, and its (K·h, chunk) score dots fill the MXU
    BETTER than the single-token kernel's (h, chunk).
    """
    from ..ops.transformer import KVCache

    num_layers, rows, seq, d_att = cache.k.shape
    d = x.shape[-1]
    h = n_heads
    _, q_blk, _ = x.shape
    rk = rows * q_blk
    quant = cache.k_scale is not None
    w_bits = 8 if 'q' in p['attn']['qkv'] \
        else (4 if 'q4' in p['attn']['qkv'] else 0)
    mp = tp[2] if tp is not None else 1
    assert not (mp > 1 and w_bits == 8), \
        'TP fused verify cannot run int8 weights (activation scales are global)'
    chunk = chunk_for(seq, rows, d_att, n_heads, cache.k.dtype,
                      forced=chunk_override)
    if seq % chunk:
        raise ValueError(
            f'cache length {seq} is not a multiple of the required chunk '
            f'{chunk}; pad the cache to a multiple (ar._decode_prefill does)')
    n_chunks = seq // chunk
    x2 = x.reshape(rk, d)
    index = jnp.broadcast_to(jnp.asarray(index, jnp.int32), (rows,))
    meta_parts = [jnp.max(index).reshape(1),
                  jnp.asarray(tokens_lens, jnp.int32).reshape(rows),
                  jnp.asarray(codes_lens, jnp.int32).reshape(rows),
                  index]
    if mp > 1:
        meta_parts.append(jnp.stack([jnp.asarray(tp[0], jnp.int32),
                                     jnp.asarray(tp[1], jnp.int32)]))
    meta = jnp.concatenate(meta_parts)

    kernel = functools.partial(_verify_kernel, n_heads=n_heads, ttm=ttm, pm=pm,
                               rows=rows, seq=seq, chunk=chunk, q_blk=q_blk,
                               quant=quant, w_bits=w_bits, mp=mp)
    interpret = jax.default_backend() != 'tpu'
    layer_spec = lambda *shape: pl.BlockSpec(
        (1, *shape), lambda l, c, meta: (l,) + (0,) * len(shape))
    const_spec = pl.BlockSpec((rk, d), lambda l, c, meta: (0, 0))
    cache_spec = lambda width: pl.BlockSpec(
        (1, rows, chunk, width),
        lambda l, c, meta: (l, 0, jnp.minimum(c, meta[0] // chunk), 0))

    in_specs, inputs, weights = _layer_io(p, cache, const_spec, layer_spec,
                                          cache_spec, h, quant, w_bits)
    inputs = [meta, x2] + inputs
    new_dtype = x.dtype if quant else cache.k.dtype
    scratch = [
        pltpu.VMEM((rk, d_att), jnp.float32),             # q (pre-scaled)
        pltpu.VMEM((rk, d_att), jnp.float32),             # attention accum
        pltpu.VMEM((rows * q_blk * h, 1), jnp.float32),   # running max
        pltpu.VMEM((rows * q_blk * h, 1), jnp.float32),   # running denom
    ]
    comm_bytes = 0
    if mp > 1:
        scratch += [
            pltpu.VMEM((rk, d), jnp.float32),             # all-reduce outbox
            pltpu.VMEM((2, mp, rk, d), jnp.float32),      # per-source-rank slots
            pltpu.SemaphoreType.DMA(()), pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()), pltpu.SemaphoreType.DMA(()),
        ]
        comm_bytes = (2 * mp + 1) * rk * d * 4
    vmem_limit = _vmem_budget(weights, num_layers, rows, chunk, d_att, h,
                              cache.k.dtype, quant, resident_rows=rk) \
        + comm_bytes
    if mp > 1:
        compiler_params = pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit, has_side_effects=True, collective_id=2)
    else:
        compiler_params = pltpu.CompilerParams(vmem_limit_bytes=vmem_limit)

    y, k_new, v_new = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(num_layers, n_chunks),
            in_specs=in_specs,
            out_specs=(
                const_spec,
                pl.BlockSpec((1, rk, d_att), lambda l, c, meta: (l, 0, 0)),
                pl.BlockSpec((1, rk, d_att), lambda l, c, meta: (l, 0, 0)),
            ),
            scratch_shapes=scratch,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((rk, d), x.dtype),
            jax.ShapeDtypeStruct((num_layers, rk, d_att), new_dtype),
            jax.ShapeDtypeStruct((num_layers, rk, d_att), new_dtype),
        ),
        compiler_params=compiler_params,
        interpret=interpret,
    )(*inputs)

    k_new = k_new.reshape(num_layers, rows, q_blk, d_att)
    v_new = v_new.reshape(num_layers, rows, q_blk, d_att)

    def write(buf, new):
        return _write_rows_per_slot(buf, new, index)

    y = y.reshape(rows, q_blk, d)
    if quant:
        kq, ks = quantize_kv_rowmajor(k_new, n_heads)
        vq, vs = quantize_kv_rowmajor(v_new, n_heads)
        return y, KVCache(write(cache.k, kq), write(cache.v, vq),
                          write(cache.k_scale, ks), write(cache.v_scale, vs))
    return y, KVCache(write(cache.k, k_new), write(cache.v, v_new))
