"""ValleNAR — non-autoregressive residual-codebook refiner, TPU-native.

Re-design of the reference ValleNAR (``/root/reference/valle/models/valle_nar.py``).
The reference's NAR training/generate code is partially broken (SURVEY Q3-Q5); this
implements the documented VALL-E semantics using the consistent convention from the
reference's ``_prepare_audio_codes`` (valle_nar.py:167-188):

- **Training** (valle_nar.py:53-105): sample a stage n ∈ [1, 7]; the input embedding is
  the sum of ALL 8 codebook embeddings over an acoustic prefix (min(T//3, 3 s)) plus the
  sum of codebooks < n over the suffix; full bidirectional attention; AdaLN conditioned
  on stage embedding n-1; cross-entropy on codebook n over all suffix positions (the
  reference's single-position slice at valle_nar.py:97 is bug Q3).  The stage is drawn
  on device from the step rng, and the codebook sum is computed as a masked sum over a
  stacked (8, V, d) embedding tensor — one gather + one weighted reduction, no Python
  loop over quantizers.

- **Decode** (valle_nar.py:107-165): seven refinement stages as ONE jitted
  ``lax.scan`` — stage n re-runs the shared-weight transformer with accumulated
  embeddings, per-stage output head and AdaLN stage embedding gathered by scan index,
  and samples all positions at once (north-star item: stages batched through one jitted
  pass, no host round-trips).  The reference's off-by-one embedding accumulation
  (valle_nar.py:144, bug Q5) is fixed: stage n adds embedding table n-1 of the codes
  sampled at stage n-1.
"""

from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp

from ..config import ConfigValle
from ..ops import (add_positional, embedding, embedding_init, linear_init, mask_to_bias,
                   sinusoidal_table, transformer, transformer_init)
from ..ops.masks import build_pad_mask
from .ar import MAX_POS

Params = dict[str, Any]


def init_params(key: jax.Array, config: ConfigValle) -> Params:
    dtype = jnp.dtype(config.param_dtype)
    nq, d, v = config.num_quantizers, config.d_model, config.num_audio_tokens
    k_tok, k_codes, k_stage, k_tr, k_proj = jax.random.split(key, 5)
    code_keys = jax.random.split(k_codes, nq)
    proj_keys = jax.random.split(k_proj, nq - 1)
    return {
        'tokens_emb': embedding_init(k_tok, config.vocab_size, d, dtype),
        # (nq, V, d): one table per residual codebook (valle_nar.py:26-31)
        'codes_embs': jnp.stack([embedding_init(k, v, d, dtype)['emb']
                                 for k in code_keys]),
        # (nq-1, d): AdaLN stage conditioning rows (valle_nar.py:34-36)
        'stage_embs': jnp.stack([embedding_init(k, 1, d, dtype)['emb'][0]
                                 for k in jax.random.split(k_stage, nq - 1)]),
        'transformer': transformer_init(
            k_tr, config.num_layers, d, config.n_heads, config.dim_feedforward,
            adaptive_norm=(config.norm == 'AdaptiveLayerNorm'), dtype=dtype),
        # (nq-1, d, V): per-stage bias-free output heads (valle_nar.py:42-47)
        'proj_layers': jnp.stack([linear_init(k, d, v, use_bias=False, dtype=dtype)['w']
                                  for k in proj_keys]),
    }


def _embed_codes_all(tables: jax.Array, codes: jax.Array) -> jax.Array:
    """(nq, V, d) tables + (..., T, nq) ids → (..., T, nq, d) per-quantizer embeddings."""
    return jax.vmap(lambda tbl, ids: tbl[ids], in_axes=(0, -1), out_axes=-2)(tables, codes)


def prefix_length(config: ConfigValle, codes_len):
    """min(T//3, 3 s of frames) — reference valle_nar.py:179 (and quirk Q1: the
    'seconds' use quantization_factor=50, not the codec's true 75 fps).

    ``codes_len`` is the batch's **max true length** (reference semantics: its
    padded width IS the batch max since its collate pads to max).  Accepts a traced
    scalar so the training loss is independent of the bucket width it was padded to.
    """
    if isinstance(codes_len, (int,)):
        return min(codes_len // 3, 3 * config.quantization_factor)
    return jnp.minimum(codes_len // 3, 3 * config.quantization_factor)


def prepare_audio_embedding(params: Params, codes: jax.Array, stage: jax.Array,
                            prefix_len: int,
                            positions: jax.Array | None = None) -> jax.Array:
    """Summed codebook embeddings: all quantizers over the prefix, quantizers < stage
    over the suffix (reference _prepare_audio_codes, valle_nar.py:167-188).

    codes: (b, T, nq); stage: traced scalar in [1, nq-1].  Returns (b, T, d).
    ``positions``: explicit (T,) code-stream positions for callers holding a
    SLICE of the stream (context parallelism) — default arange(T).

    Accumulated by a ``lax.scan`` over the nq tables rather than one vmapped
    gather + einsum: the einsum form materializes (b, T, nq, d) — at the
    204M bench scale (b=16, T=512, d=1024) that one tensor plus its backward
    saves were the dominant term behind the NAR's OOM at the AR's batch size
    (BENCHMARKS.md r4 memory note; VERDICT r4 Next #8).  The scan's live set
    is the (b, T, d) accumulator + one gather; same math, q-ascending sum
    order.
    """
    t = codes.shape[1]
    nq = codes.shape[2]
    pos = jnp.arange(t) if positions is None else positions         # (T,)

    def body(acc, q_in):
        tbl, q = q_in                                               # (V, d), scalar
        w = jnp.where(pos < prefix_len, 1.0,
                      (q < stage).astype(jnp.float32))              # (T,)
        emb = tbl[jax.lax.dynamic_index_in_dim(codes, q, 2, keepdims=False)]
        return acc + emb * w[None, :, None].astype(tbl.dtype), None

    acc0 = jnp.zeros((codes.shape[0], t, params['codes_embs'].shape[-1]),
                     params['codes_embs'].dtype)
    acc, _ = jax.lax.scan(body, acc0,
                          (params['codes_embs'], jnp.arange(nq)))
    return acc


def corrupt_conditioning(codes: jax.Array, prefix_len, p: float,
                         rng: jax.Array, v: int) -> jax.Array:
    """Replace a fraction ``p`` of SUFFIX codebook-0 conditioning codes
    (pos >= prefix_len, quantizer 0 only) with uniform random symbols — the
    training-time analogue of conditioning on imperfect AR output
    (``config.nar_corrupt_p``; the serving regime is exactly this: the AR's
    first-codebook stream is the only imperfect conditioning input, the
    NAR's own stage predictions and the acoustic prefix are self-consistent).
    The prefix stays clean (at inference it is the ground-truth prompt);
    callers corrupt only the copy fed to ``prepare_audio_embedding``, never
    the loss targets."""
    r_mask, r_sym = jax.random.split(rng)
    b, t, _nq = codes.shape
    mask = jax.random.bernoulli(r_mask, p, (b, t))
    mask = mask & (jnp.arange(t)[None, :] >= prefix_len)
    rand = jax.random.randint(r_sym, (b, t), 0, v, codes.dtype)
    c0 = jnp.where(mask, rand, codes[:, :, 0])
    return codes.at[:, :, 0].set(c0)


def forward_stage(params: Params, config: ConfigValle, x_tok: jax.Array,
                  codes_emb: jax.Array, stage: jax.Array,
                  bias: jax.Array | None, rng: jax.Array | None = None,
                  flash: dict | None = None, mesh=None,
                  pp: tuple | None = None) -> jax.Array:
    """Transformer pass for one NAR stage → logits (b, T_codes, V) for codebook
    ``stage`` (heads/conditioning gathered by traced stage index)."""
    pe = sinusoidal_table(MAX_POS, config.d_model)
    drop = config.dropout if rng is not None else 0.0
    rngs = jax.random.split(rng, 2) if rng is not None else (None, None)
    codes_emb = add_positional(pe, codes_emb, dropout_rate=drop, rng=rngs[0])
    x = jnp.concatenate([x_tok, codes_emb], axis=1).astype(jnp.dtype(config.dtype))
    cond = jax.lax.dynamic_index_in_dim(params['stage_embs'], stage - 1, 0,
                                        keepdims=True)              # (1, d)
    from ..parallel import sequence_parallel_spec
    y = transformer(params['transformer'], x, config.n_heads, bias, cond,
                    dropout_rate=drop, rng=rngs[1], remat=config.remat, flash=flash,
                    unroll=config.train_scan_unroll,
                    sp_spec=sequence_parallel_spec(config, mesh) if pp is None
                    else None,
                    pp=pp)
    y = y[:, x_tok.shape[1]:]
    head = jax.lax.dynamic_index_in_dim(params['proj_layers'], stage - 1, 0,
                                        keepdims=False)             # (d, V)
    return (y @ head).astype(jnp.float32)


def loss_fn(params: Params, config: ConfigValle, batch: dict[str, jax.Array],
            rng: jax.Array, train: bool = True, mesh=None,
            pp: tuple | None = None, data_axis: str | None = None
            ) -> tuple[jax.Array, dict[str, jax.Array]]:
    """Stage-sampled training step (reference valle_nar.py:53-105, Q3 fixed).

    ``train=False`` disables dropout while keeping the rng-driven stage draw —
    the evaluation mode (the rng cannot simply be None like the AR loss).
    ``mesh``: multi-device train/eval steps must shard_map the flash kernel
    (GSPMD cannot partition a Mosaic custom call; see ar.forward).
    ``data_axis``: set when called inside a shard_map whose batch is split over
    that mesh axis — the prefix length then maxes over the GLOBAL batch, so
    the manual-DP objective matches the declarative GSPMD one exactly."""
    codes, tokens = batch['codes'], batch['tokens']
    codes_lens, tokens_lens = batch.get('codes_lens'), batch.get('tokens_lens')
    b, t_codes, nq = codes.shape
    t_tok = tokens.shape[1]
    # Reference valle_nar.py:179 derives the acoustic-prefix length from the
    # batch's max length.  Under bucket padding the width exceeds the batch max,
    # so compute it from the true lengths (traced) — the objective must not shift
    # with the bucket the batch landed in.
    max_true = codes_lens.max() if codes_lens is not None else t_codes
    if data_axis is not None and codes_lens is not None:
        # Inside a manual-DP shard_map each shard sees only its rows; pmax
        # makes the prefix draw from the global batch max like the GSPMD path.
        max_true = jax.lax.pmax(max_true, data_axis)
    prefix_len = prefix_length(config, max_true)

    stage_rng, drop_rng = jax.random.split(rng)
    stage = jax.random.randint(stage_rng, (), 1, nq)                # uniform 1..nq-1
    if data_axis is not None:
        # Fold the data rank into the DROPOUT stream only — the stage draw
        # above must stay replicated (one global stage per step, like GSPMD);
        # without the fold every shard draws identical masks (replicated rng).
        drop_rng = jax.random.fold_in(drop_rng,
                                      jax.lax.axis_index(data_axis))

    # Mixed precision: cast f32 master params to the compute dtype (see ar.forward).
    from ..ops.nn import cast_to_compute
    params = cast_to_compute(params, config)

    pe = sinusoidal_table(MAX_POS, config.d_model)
    drop = config.dropout if train else 0.0
    rngs = jax.random.split(drop_rng, 2)
    x_tok = embedding(params['tokens_emb'], tokens)
    x_tok = add_positional(pe, x_tok, dropout_rate=drop, rng=rngs[0])

    cond_codes = codes
    if train and config.nar_corrupt_p > 0:
        # fold_in (not another split) so the existing stage/dropout streams
        # are untouched when the knob is off — bit-identical runs.
        c_rng = jax.random.fold_in(rng, 0x5eed)
        if data_axis is not None:
            # manual-DP: decorrelate the corruption masks across shards
            # (each shard holds different rows).
            c_rng = jax.random.fold_in(c_rng, jax.lax.axis_index(data_axis))
        cond_codes = corrupt_conditioning(
            codes, prefix_len, config.nar_corrupt_p, c_rng,
            config.num_audio_tokens)
    codes_emb = prepare_audio_embedding(params, cond_codes, stage, prefix_len)

    # Padding bias: audio pads + token pads (see ar.forward note on the deviation).
    bias, flash = None, None
    use_flash = config.flash_enabled and pp is None  # pp: bias path per stage
    wrap_mesh = None
    if use_flash:
        from ..ops.attention import flash_shard_mesh
        wrap_mesh, use_flash = flash_shard_mesh(mesh, b, config.n_heads)
    if use_flash:
        tv = tokens_lens if tokens_lens is not None else jnp.full((b,), t_tok)
        ce = (t_tok + codes_lens) if codes_lens is not None \
            else jnp.full((b,), t_tok + t_codes)
        flash = {'meta': jnp.stack([tv, ce], axis=1).astype(jnp.int32),
                 'tokens_total': t_tok, 'causal': False, 'mesh': wrap_mesh}
    elif codes_lens is not None or tokens_lens is not None:
        # Build from whichever lengths exist — the flash path masks both
        # streams from its meta, so this backend must too (same logits).
        pad = jnp.zeros((b, t_tok + t_codes), bool)
        if codes_lens is not None:
            pad = pad | jnp.pad(build_pad_mask(codes_lens, t_codes),
                                ((0, 0), (t_tok, 0)))
        if tokens_lens is not None:
            pad = pad | jnp.pad(build_pad_mask(tokens_lens, t_tok),
                                ((0, 0), (0, t_codes)))
        bias = mask_to_bias(pad)[:, None, None, :]

    logits = forward_stage(params, config, x_tok, codes_emb, stage, bias,
                           rngs[1] if train else None,   # rng None => no dropout
                           flash=flash, mesh=mesh, pp=pp)            # (b, T, V)
    # CE over the suffix positions of codebook ``stage`` — masked (not sliced):
    # prefix_len is traced, so the suffix is selected by weight, keeping shapes
    # static and the loss independent of the bucket width.
    target = jax.lax.dynamic_index_in_dim(codes, stage, 2, keepdims=False)

    logprobs = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logprobs, target[..., None], axis=-1)[..., 0]
    pos = jnp.arange(t_codes)[None, :]
    valid = pos >= prefix_len
    if codes_lens is not None:
        if config.mask_loss_pads:
            valid = valid & (pos < codes_lens[:, None])
        else:
            # Reference-parity mode (Q6: pads INSIDE the batch count) pads
            # only to the BATCH max; bucket columns beyond it must still be
            # excluded or the loss shifts with the bucket width.  Broadcast
            # to (b, T): a (1, T) mask would count ONE row in n_valid (r4).
            valid = jnp.broadcast_to(valid & (pos < max_true), target.shape)
    n_valid = jnp.sum(valid)
    loss = jnp.sum(nll * valid) / jnp.maximum(n_valid, 1)
    acc = jnp.sum((jnp.argmax(logits, -1) == target) * valid) / jnp.maximum(
        n_valid, 1)
    return loss, {'loss': loss, 'acc': acc, 'stage': stage, 'n_valid': n_valid}


def pp_microbatch_parts(config: ConfigValle, batch: dict, rng: jax.Array,
                        data_axis: str | None = None) -> dict:
    """1F1B decomposition of the NAR ``loss_fn`` (see ar.pp_microbatch_parts
    for the protocol).  The stage draw replicates loss_fn's exactly (same rng
    split), the AdaLN conditioning row rides through ``prep``'s third output
    so its gradient accumulates per stage, and the acoustic-prefix length
    maxes over the GLOBAL batch via ``data_axis`` like the GPipe path."""
    codes, tokens = batch['codes'], batch['tokens']
    codes_lens, tokens_lens = batch.get('codes_lens'), batch.get('tokens_lens')
    b, t_codes, nq = codes.shape
    t_tok = tokens.shape[1]
    pe = sinusoidal_table(MAX_POS, config.d_model)
    cdtype = jnp.dtype(config.dtype)
    pdtype = jnp.dtype(config.param_dtype)
    stage_rng, drop_rng = jax.random.split(rng)
    stage = jax.random.randint(stage_rng, (), 1, nq)
    max_true = codes_lens.max() if codes_lens is not None else t_codes
    if data_axis is not None and codes_lens is not None:
        max_true = jax.lax.pmax(max_true, data_axis)
    prefix_len = prefix_length(config, max_true)
    drop = config.dropout if rng is not None else 0.0

    from ..ops.nn import cast_to_compute as cast_cfg

    def cast(p):
        return cast_cfg(p, config)

    def mb_slice(arr, i, mb):
        return jax.lax.dynamic_slice_in_dim(arr, i * mb, mb, axis=0)

    def prep(params, i, mb):
        params = cast(params)
        r = jax.random.fold_in(drop_rng, i)
        if data_axis is not None:
            # Replicated rng: fold the data rank so shards draw independent
            # masks (the stage draw above stays replicated).
            r = jax.random.fold_in(r, jax.lax.axis_index(data_axis))
        rngs = jax.random.split(r, 2)
        tok_mb = mb_slice(tokens, i, mb)
        cod_mb = mb_slice(codes, i, mb)
        x_tok = add_positional(pe, embedding(params['tokens_emb'], tok_mb),
                               dropout_rate=drop, rng=rngs[0])
        cond_mb = cod_mb
        if config.nar_corrupt_p > 0:
            # Mirror loss_fn's corruption per microbatch (targets in
            # head_loss re-slice the CLEAN codes).
            cond_mb = corrupt_conditioning(
                cod_mb, prefix_len, config.nar_corrupt_p,
                jax.random.fold_in(r, 0x5eed), config.num_audio_tokens)
        codes_emb = prepare_audio_embedding(params, cond_mb, stage, prefix_len)
        codes_emb = add_positional(pe, codes_emb, dropout_rate=drop,
                                   rng=rngs[1])
        x = jnp.concatenate([x_tok, codes_emb], axis=1).astype(cdtype)
        pad = jnp.zeros((mb, t_tok + t_codes), bool)
        if codes_lens is not None:
            pad = pad | jnp.pad(build_pad_mask(mb_slice(codes_lens, i, mb),
                                               t_codes), ((0, 0), (t_tok, 0)))
        if tokens_lens is not None:
            pad = pad | jnp.pad(build_pad_mask(mb_slice(tokens_lens, i, mb),
                                               t_tok), ((0, 0), (0, t_codes)))
        bias = mask_to_bias(pad)[:, None, None, :]
        cond = jax.lax.dynamic_index_in_dim(params['stage_embs'], stage - 1, 0,
                                            keepdims=True)
        return x, bias, cond

    def head_loss(params, y_mb, i, mb):
        params = cast(params)
        y = y_mb[:, t_tok:]
        head = jax.lax.dynamic_index_in_dim(params['proj_layers'], stage - 1,
                                            0, keepdims=False)
        logits = (y @ head).astype(jnp.float32)
        tgt_mb = jax.lax.dynamic_index_in_dim(mb_slice(codes, i, mb), stage, 2,
                                              keepdims=False)
        logprobs = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(logprobs, tgt_mb[..., None], axis=-1)[..., 0]
        pos = jnp.arange(t_codes)[None, :]
        valid = pos >= prefix_len
        if codes_lens is not None:
            cl_mb = mb_slice(codes_lens, i, mb)
            if config.mask_loss_pads:
                valid = valid & (pos < cl_mb[:, None])
            else:
                valid = jnp.broadcast_to(valid & (pos < max_true),
                                         tgt_mb.shape)
        nll_sum = jnp.sum(nll * valid)
        acc_sum = jnp.sum((jnp.argmax(logits, -1) == tgt_mb) * valid)
        n_valid = jnp.sum(valid)
        return nll_sum, (acc_sum.astype(jnp.float32),
                         n_valid.astype(jnp.float32))

    return {'prep': prep, 'head_loss': head_loss,
            'extra_metrics': {'stage': stage}}


# ---------------------------------------------------------------------------
# Decode — 7 stages in one lax.scan
# ---------------------------------------------------------------------------

def _generate_fn(params: Params, tokens: jax.Array, tokens_len: jax.Array,
                 prompt_codes: jax.Array, p_len: jax.Array, first_layer: jax.Array,
                 gen_len: jax.Array, rng: jax.Array, config: ConfigValle,
                 tp: tuple | None = None):
    """All 7 refinement stages on device, batched, padded widths + true lengths.

    tokens: (B, Ttm) padded token streams (prompt + target), true lens tokens_len (B,).
    prompt_codes: (B, Pm, nq) padded acoustic prompts, true lens p_len (B,).
    first_layer: (B, Nm) padded stage-0 codes, true lens gen_len (B,).
    Returns (B, Nm, nq) codes (rows past each gen_len are garbage — slice on host).

    Padded key slots are masked out of attention and positions come from the true
    lengths, so valid outputs are identical to an unpadded run (greedy); this lets
    the fused TTS pipeline run NAR directly over the AR decoder's fixed-size buffer
    with no host round-trip, and batches utterances of different lengths together.
    Mask/position layout mirrors ar._decode_fn.

    ``tp`` = (mesh axis names, mp): manual tensor parallelism inside a
    jax.shard_map — ``params['transformer']`` holds this rank's Megatron split
    (local heads, psum-completed row-parallel projections); embeddings, AdaLN
    conditioning, the per-stage heads, and sampling are replicated, so every
    model rank draws identical codes in lockstep (shared rng).
    """
    nq = config.num_quantizers
    pe = sinusoidal_table(MAX_POS, config.d_model)
    mp = tp[1] if tp is not None else 1
    tp_axis = 'model' if tp is not None else None
    n_heads = config.n_heads // mp        # LOCAL heads under manual TP
    dtype = jnp.dtype(config.dtype)
    tparams = jax.tree.map(lambda a: a.astype(dtype), params['transformer'])
    b, ttm = tokens.shape
    pm = prompt_codes.shape[1]
    nm = first_layer.shape[1]
    s_total = ttm + pm + nm
    from .ar import check_max_pos
    check_max_pos(ttm, pm + nm, 'NAR refine')

    x_tok = add_positional(pe, embedding(params['tokens_emb'], tokens)
                           ).astype(dtype)

    # Per-row key-validity mask over [tokens | prompt | target] slots.
    slots = jnp.arange(s_total)[None, :]
    valid = ((slots < tokens_len[:, None])
             | ((slots >= ttm) & (slots < ttm + p_len[:, None]))
             | ((slots >= ttm + pm) & (slots < ttm + pm + gen_len[:, None])))
    bias = mask_to_bias(~jnp.broadcast_to(valid, (b, s_total)))[:, None, None, :]

    # Codes positions per row: prompt slot i -> i; target slot j -> p_len + j.
    code_pos = jnp.concatenate(
        [jnp.broadcast_to(jnp.arange(pm)[None], (b, pm)),
         p_len[:, None] + jnp.arange(nm)[None]], axis=1)           # (B, Pm+Nm)
    pos_rows = jnp.take(pe, code_pos, axis=0)                      # (B, Pm+Nm, d)

    # Acoustic prompt: sum of ALL codebook embeddings (valle_nar.py:127-133).
    emb_prompt = _embed_codes_all(params['codes_embs'], prompt_codes).sum(axis=2)
    emb_out = params['codes_embs'][0][first_layer]                 # Σ_{j<1} emb_j

    def stage_body(carry, n):
        emb_out, rng = carry
        rng, sample_rng = jax.random.split(rng)
        codes_emb = jnp.concatenate([emb_prompt, emb_out], axis=1) + pos_rows
        x = jnp.concatenate([x_tok, codes_emb.astype(dtype)], axis=1)
        cond = jax.lax.dynamic_index_in_dim(params['stage_embs'], n - 1, 0,
                                            keepdims=True).astype(dtype)
        y = transformer(tparams, x, n_heads, bias, cond, unroll=True,
                        tp_axis=tp_axis)
        y = y[:, ttm + pm:]                                          # target positions
        head = jax.lax.dynamic_index_in_dim(params['proj_layers'], n - 1, 0,
                                            keepdims=False)
        logits = (y @ head).astype(jnp.float32)                     # (B, Nm, V)
        if config.temperature > 0.0:
            sampled = jax.random.categorical(sample_rng, logits / config.temperature,
                                             axis=-1)
        else:
            sampled = jnp.argmax(logits, axis=-1)
        sampled = sampled.astype(jnp.int32)
        # Accumulate table n of the codes just sampled at stage n (Q5 fixed).
        new_table = jax.lax.dynamic_index_in_dim(params['codes_embs'], n, 0,
                                                 keepdims=False)
        emb_out = emb_out + new_table[sampled]
        return (emb_out, rng), sampled

    (_, _), stages = jax.lax.scan(stage_body, (emb_out, rng), jnp.arange(1, nq))
    # stages: (nq-1, B, Nm) -> (B, Nm, nq)
    return jnp.concatenate([first_layer[None], stages], axis=0).transpose(1, 2, 0)


class ValleNAR:
    """Stateful wrapper mirroring the reference module surface (minus Lightning)."""

    def __init__(self, config: ConfigValle, params: Params | None = None,
                 seed: int | None = None):
        self.config = config
        self.eos_token = config.num_audio_tokens
        self.bos_token = config.num_audio_tokens + 1
        key = jax.random.key(config.seed if seed is None else seed)
        self.params = params if params is not None else init_params(key, config)
        prec = config.matmul_precision

        def _loss_wrapped(p, b, r):
            with jax.default_matmul_precision(prec):
                return loss_fn(p, config, b, r)

        def _gen_wrapped(p, tokens, tl, codes, pl, first, nl, rng):
            with jax.default_matmul_precision(prec):
                return _generate_fn(p, tokens, tl, codes, pl, first, nl, rng, config)

        from ..aot import cached_jit, config_key
        ck = config_key(config)
        self._loss_jit = cached_jit(_loss_wrapped, tag='nar_loss', extra_key=ck)
        self._gen_jit = cached_jit(_gen_wrapped, tag='nar_generate', extra_key=ck)

    def training_step(self, batch: dict[str, jax.Array], rng: jax.Array):
        return self._loss_jit(self.params, batch, rng)

    def save(self, path) -> None:
        """Orbax save of the model params."""
        from .checkpoint import save_params
        save_params(path, self.params)

    def load(self, path) -> None:
        """Load params from a bare params checkpoint OR a Trainer step dir
        (LoRA fine-tune states merge via this model's lora_* config)."""
        from .checkpoint import load_params
        self.params = load_params(path, self.params, config=self.config)

    def generate(self, prompt_tokens, prompt_codes, target_tokens,
                 target_codes_first_layer, rng: jax.Array | None = None,
                 bucket: bool = True) -> jax.Array:
        """Refine first-layer codes into all ``num_quantizers`` codebooks.

        Mirrors reference valle_nar.py:107-165 (with its shape bugs fixed — Q5).
        ``bucket=True`` (default) pads widths to config.bucket_sizes to bound
        compilations to at most len(bucket_sizes)³ programs (each compile costs
        minutes on this runtime — NOTES.md); masking keeps greedy outputs
        identical (tested).  Returns (T, num_quantizers) codes.
        """
        tokens = jnp.concatenate([jnp.asarray(prompt_tokens, jnp.int32),
                                  jnp.asarray(target_tokens, jnp.int32)])
        prompt_codes = jnp.asarray(prompt_codes, jnp.int32)
        first = jnp.asarray(target_codes_first_layer, jnp.int32)
        tl, pl, nl = tokens.shape[0], prompt_codes.shape[0], first.shape[0]
        if bucket:
            from ..config import bucket_len

            def bkt(n):
                return bucket_len(self.config.bucket_sizes, n)
            tokens = jnp.pad(tokens, (0, bkt(tl) - tl))
            prompt_codes = jnp.pad(prompt_codes, ((0, bkt(pl) - pl), (0, 0)))
            first = jnp.pad(first, (0, bkt(nl) - nl))
        if rng is None:
            rng = jax.random.key(self.config.seed)
        out = self._gen_jit(self.params, tokens[None], jnp.asarray([tl], jnp.int32),
                            prompt_codes[None], jnp.asarray([pl], jnp.int32),
                            first[None], jnp.asarray([nl], jnp.int32), rng)
        return out[0, :nl]
