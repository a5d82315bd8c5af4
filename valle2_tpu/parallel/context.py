"""Context parallelism: the AR training step with the SEQUENCE sharded across chips.

The missing long-context axis (SURVEY §5 scoped cross-chip ring attention out
of v1): when one chip cannot hold a sequence's activations, shard the
concatenated [source tokens | target codes] sequence over a 'ctx' mesh axis.
Everything position-local (embeddings, norms, FFN, residuals, the LM head,
the CE loss terms) computes on the device's own block; only attention needs
cross-chip data, and that runs the exact ring schedule (parallel/ring.py —
K/V blocks rotate over ICI while Q stays resident).  Activation memory per
chip scales 1/ctx; the ring's transfer volume per layer is the K/V bytes,
point-to-point, overlappable.

Design notes:

- The two embedding tables select PER POSITION (``where(pos < Ttm,
  tokens_emb[id], audio_emb[id])``) because a block may straddle the
  source/target boundary; positional indices restart at the boundary exactly
  like the solo path (reference valle_ar.py:61-66 embeds the streams
  separately before concatenating).
- Targets/lengths stay replicated ((b, Tc) ints — tiny); each device
  gathers the target ids for its own positions and masks the loss to its
  valid slice, so the psum over 'ctx' of the (nll, acc, n) sums and of the
  parameter gradients reproduces the solo weighted mean EXACTLY
  (parity-tested at 1e-6, ragged lengths included).
- Collective discipline: ONE variadic psum over 'ctx' (grads + loss sums),
  then the weighted 'data' combine, chained by dataflow (NOTES.md).
- Composes with 'data' (DP x CP) and grad accumulation; dropout draws a
  different (equally valid) mask stream than solo — parity at dropout 0,
  the same caveat as the pipeline schedules.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

Params = dict[str, Any]


def make_cp_mesh(data: int, ctx: int, model: int = 1, devices=None) -> Mesh:
    """A ('data', 'ctx'[, 'model']) mesh: batch over 'data', sequence over
    'ctx', and (r5, VERDICT r4 Next #7) Megatron tensor parallelism over
    'model' — the standard long-context production layout (ring attention
    with TP-split heads per ctx shard)."""
    import numpy as np
    devices = devices if devices is not None else jax.devices()
    n = data * ctx * model
    assert n <= len(devices), \
        f'mesh {data}x{ctx}x{model} needs {n} devices, have {len(devices)}'
    if model > 1:
        return Mesh(np.asarray(devices[:n]).reshape(data, ctx, model),
                    ('data', 'ctx', 'model'))
    return Mesh(np.asarray(devices[:n]).reshape(data, ctx), ('data', 'ctx'))


def _cp_loss_device(params, ids, target, tokens_lens, codes_lens, rng,
                    config, ttm: int, tc: int, n_ctx: int, n_data: int = 1,
                    tp: tuple | None = None):
    """Device-local AR loss over this rank's sequence block (inside shard_map).

    ids: (b, s_loc) — this block of the padded [tokens | codes] concat;
    target/lens replicated.  Returns UNNORMALIZED (nll_sum, acc_sum, n_valid)
    — the caller psums over 'ctx' and normalizes (see module docstring).
    ``tp``: (model_axis, mp) — Megatron TP within each ctx shard: the
    transformer params slice differentiably to this model rank's shard
    (pipeline.tp_slice_stage — canonical layout preserved for checkpoints),
    attention rings over 'ctx' with n_heads/mp LOCAL heads, and the caller
    psums the TP-partial grad leaves over the model axis."""
    from ..models.ar import MAX_POS
    from ..ops import embedding, linear, sinusoidal_table
    from ..ops.transformer import transformer

    b, s_loc = ids.shape
    rank = jax.lax.axis_index('ctx')
    pos = rank * s_loc + jnp.arange(s_loc)                  # global seq index
    is_tok = pos < ttm
    cdtype = jnp.dtype(config.dtype)
    from ..ops.nn import cast_to_compute
    params = cast_to_compute(params, config)
    n_heads, tp_axis = config.n_heads, None
    if tp is not None:
        from .pipeline import tp_slice_stage
        tp_axis, mp = tp
        params = dict(params)
        params['transformer'] = tp_slice_stage(params['transformer'],
                                               tp_axis, mp)
        n_heads //= mp

    # Per-position table select (blocks can straddle the stream boundary).
    # Out-of-vocab gathers clamp harmlessly — the other branch is selected.
    emb = jnp.where(is_tok[None, :, None],
                    embedding(params['tokens_emb'], ids),
                    embedding(params['audio_emb'], ids))
    pe = sinusoidal_table(MAX_POS, config.d_model)
    stream_pos = jnp.where(is_tok, pos, pos - ttm)          # restart at boundary
    drop = config.dropout if rng is not None else 0.0
    if rng is not None:
        # Fold BOTH mesh ranks: the rng arrives replicated, so folding only
        # the ctx rank would hand every data shard the identical mask tensor
        # (cross-shard-correlated dropout).
        rng_dev = jax.random.fold_in(jax.random.fold_in(rng, rank),
                                     jax.lax.axis_index('data'))
        rngs = jax.random.split(rng_dev, 2)
    else:
        rngs = (None, None)
    x = emb + jnp.take(pe, stream_pos, axis=0)[None]
    from ..ops.nn import dropout as _dropout
    x = _dropout(x.astype(cdtype), drop, rngs[0])

    meta = jnp.stack([tokens_lens, ttm + codes_lens], axis=1).astype(jnp.int32)
    ring = {'meta': meta, 'tokens_total': ttm, 'causal': True, 'axis': 'ctx'}
    y = transformer(params['transformer'], x, n_heads, None,
                    dropout_rate=drop, rng=rngs[1], remat=config.remat,
                    unroll=config.train_scan_unroll, ring=ring,
                    tp_axis=tp_axis)

    logits = linear(params['proj'], y).astype(jnp.float32)  # all local positions
    tgt_idx = jnp.clip(pos - ttm, 0, tc - 1)
    tgt = jnp.take(target, tgt_idx, axis=1)                 # (b, s_loc)
    logprobs = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logprobs, tgt[..., None], axis=-1)[..., 0]
    in_codes = (pos >= ttm) & (pos < ttm + tc)
    if config.mask_loss_pads:
        valid = in_codes[None, :] & ((pos - ttm)[None, :] < codes_lens[:, None])
    else:
        # Reference-parity mode masks to the GLOBAL batch max (solo
        # loss_fn semantics) — pmax over 'data' like the PP/NAR paths.
        max_true = codes_lens.max()
        if n_data > 1:
            max_true = jax.lax.pmax(max_true, 'data')
        # Broadcast to (b, s_loc): a (1, s_loc) mask would count ONE row in
        # n_valid and inflate the mean loss/grads by b (r4 fix).
        valid = jnp.broadcast_to(
            in_codes[None, :] & ((pos - ttm)[None, :] < max_true), tgt.shape)
    nll_sum = jnp.sum(nll * valid)
    acc_sum = jnp.sum((jnp.argmax(logits, -1) == tgt) * valid).astype(jnp.float32)
    n_valid = jnp.sum(valid).astype(jnp.float32)
    return nll_sum, acc_sum, n_valid


def _cp_loss_device_nar(params, ids, batch, rng, config, ttm: int, tc: int,
                        n_data: int, tp: tuple | None = None):
    """Device-local NAR loss over this rank's sequence block.

    ``ids`` carries the concatenated [tokens | first-codebook] stream only
    for its SHAPE/padding layout; token ids and the full (b, T, nq) codes are
    read from the replicated batch (small int arrays) and sliced to this
    block's global positions — the d-wide activations are what shard.
    Returns (nll_sum, acc_sum, n_valid, stage)."""
    from ..models.nar import prefix_length, prepare_audio_embedding
    from ..models.ar import MAX_POS
    from ..ops import embedding, sinusoidal_table
    from ..ops.nn import dropout as _dropout
    from ..ops.transformer import transformer

    tokens, codes = batch['tokens'], batch['codes']
    tokens_lens = batch.get('tokens_lens',
                            jnp.full((ids.shape[0],), ttm, jnp.int32))
    codes_lens = batch.get('codes_lens',
                           jnp.full((ids.shape[0],), tc, jnp.int32))
    b, s_loc = ids.shape
    rank = jax.lax.axis_index('ctx')
    pos = rank * s_loc + jnp.arange(s_loc)
    is_tok = pos < ttm
    code_pos = jnp.clip(pos - ttm, 0, tc - 1)
    cdtype = jnp.dtype(config.dtype)
    stage_rng, drop_rng = jax.random.split(rng)
    nq = codes.shape[2]
    stage = jax.random.randint(stage_rng, (), 1, nq)     # loss_fn's exact draw
    max_true = codes_lens.max()
    if n_data > 1:
        max_true = jax.lax.pmax(max_true, 'data')
    prefix_len = prefix_length(config, max_true)
    from ..ops.nn import cast_to_compute
    params = cast_to_compute(params, config)
    n_heads, tp_axis = config.n_heads, None
    if tp is not None:
        from .pipeline import tp_slice_stage
        tp_axis, mp = tp
        params = dict(params)
        params['transformer'] = tp_slice_stage(params['transformer'],
                                               tp_axis, mp)
        n_heads //= mp

    tok_local = jnp.take(tokens, jnp.clip(pos, 0, ttm - 1), axis=1)
    codes_local = jnp.take(codes, code_pos, axis=1)               # (b, sl, nq)
    emb_tok = embedding(params['tokens_emb'], tok_local)
    emb_code = prepare_audio_embedding(params, codes_local, stage, prefix_len,
                                       positions=code_pos)
    emb = jnp.where(is_tok[None, :, None], emb_tok, emb_code)
    pe = sinusoidal_table(MAX_POS, config.d_model)
    stream_pos = jnp.where(is_tok, pos, code_pos)
    drop = config.dropout if rng is not None else 0.0
    rngs = jax.random.split(
        jax.random.fold_in(jax.random.fold_in(drop_rng, rank),
                           jax.lax.axis_index('data')), 2)
    x = _dropout((emb + jnp.take(pe, stream_pos, axis=0)[None]).astype(cdtype),
                 drop, rngs[0])

    meta = jnp.stack([tokens_lens, ttm + codes_lens], axis=1).astype(jnp.int32)
    ring = {'meta': meta, 'tokens_total': ttm, 'causal': False, 'axis': 'ctx'}
    cond = jax.lax.dynamic_index_in_dim(params['stage_embs'], stage - 1, 0,
                                        keepdims=True)
    y = transformer(params['transformer'], x, n_heads, None, cond,
                    dropout_rate=drop, rng=rngs[1], remat=config.remat,
                    unroll=config.train_scan_unroll, ring=ring,
                    tp_axis=tp_axis)
    head = jax.lax.dynamic_index_in_dim(params['proj_layers'], stage - 1, 0,
                                        keepdims=False)
    logits = (y @ head).astype(jnp.float32)
    tgt = jax.lax.dynamic_index_in_dim(codes_local, stage, 2, keepdims=False)
    logprobs = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logprobs, tgt[..., None], axis=-1)[..., 0]
    in_codes = (pos >= ttm) & (pos < ttm + tc)
    valid = in_codes[None, :] & (code_pos[None, :] >= prefix_len)
    if config.mask_loss_pads:
        valid = valid & (code_pos[None, :] < codes_lens[:, None])
    else:
        valid = jnp.broadcast_to(valid & (code_pos[None, :] < max_true),
                                 tgt.shape)
    nll_sum = jnp.sum(nll * valid)
    acc_sum = jnp.sum((jnp.argmax(logits, -1) == tgt) * valid).astype(jnp.float32)
    n_valid = jnp.sum(valid).astype(jnp.float32)
    return nll_sum, acc_sum, n_valid, stage


def _concat_ids(batch: dict, is_nar: bool, n_ctx: int) -> jax.Array:
    """The ctx-sharded block-layout array: [tokens | first-codebook codes],
    padded to a multiple of the ctx axis.  Pad positions sit past every row's
    kv_end, so no key leaks and pad queries are masked out of the loss.  (For
    the NAR the concat only fixes the layout — the device fn re-reads the
    replicated (b, T, nq) codes per position.)"""
    from ..models.ar import check_max_pos
    codes_flat = batch['codes'][..., 0] if is_nar else batch['codes']
    # CP exists for LONG sequences — exactly where the positional table's
    # silent gather-clamp (check_max_pos's reason to exist) would bite.
    check_max_pos(batch['tokens'].shape[1], codes_flat.shape[1], 'CP train')
    ids = jnp.concatenate([batch['tokens'], codes_flat], axis=1)
    pad = (-ids.shape[1]) % n_ctx
    return jnp.pad(ids, ((0, 0), (0, pad)))


def _cp_tp(config, mesh: Mesh) -> tuple | None:
    """('model', mp) when the cp mesh carries a model axis (CP x TP), else
    None.  Validates the Megatron split is well-formed."""
    mp = mesh.shape.get('model', 1)
    if mp <= 1:
        return None
    from .mesh import tp_divisible
    if not tp_divisible(config.n_heads, config.dim_feedforward, mp):
        raise ValueError(
            f'mesh_model={mp} must divide n_heads={config.n_heads} and '
            f'dim_feedforward={config.dim_feedforward} (Megatron TP within '
            f'each ctx shard)')
    return ('model', mp)


def make_cp_eval_step(config, model_name: str, mesh: Mesh):
    """Validation under the cp mesh: the same device-local losses, no grads;
    returns the token-weighted metrics make_eval_step would."""
    is_nar = model_name == 'ValleNAR'
    n_ctx = mesh.shape['ctx']
    n_data = mesh.shape.get('data', 1)
    tp = _cp_tp(config, mesh)

    def device_eval(params, ids, batch, rng):
        ttm = int(batch['tokens'].shape[1])
        tc = int(batch['codes'].shape[1]) if is_nar \
            else int(batch['target'].shape[1])
        if is_nar:
            # train=False semantics: the stage draw stays rng-driven but
            # dropout must be off — the solo eval passes train=False; here
            # dropout gates on config.dropout * (rng is not None), so zero it
            # by evaluating with the dropout-free config contract: the CP
            # loss reads config.dropout only when rng is not None, and eval
            # passes rng for the stage draw — mirror make_eval_step by
            # running under a dropout-0 view.
            import dataclasses
            cfg0 = dataclasses.replace(config, dropout=0.0)
            nll, acc, n, stage = _cp_loss_device_nar(
                params, ids, batch, rng, cfg0, ttm, tc, n_data, tp=tp)
        else:
            nll, acc, n = _cp_loss_device(
                params, ids, batch['target'],
                batch.get('tokens_lens',
                          jnp.full((ids.shape[0],), ttm, jnp.int32)),
                batch.get('codes_lens',
                          jnp.full((ids.shape[0],), tc, jnp.int32)),
                None, config, ttm, tc, n_ctx, n_data, tp=tp)
        red = jax.lax.psum({'nll': nll, 'acc': acc, 'n': n}, 'ctx')
        n_tot = jnp.maximum(red['n'], 1.0)
        metrics = {'loss': red['nll'] / n_tot, 'acc': red['acc'] / n_tot,
                   'n_valid': red['n']}
        scalars = {k: v * red['n'] for k, v in metrics.items()
                   if k != 'n_valid'}
        red_d = jax.lax.psum({'scalars': scalars, 'n': red['n']}, 'data')
        total = jnp.maximum(red_d['n'], 1.0)
        out = {k: v / total for k, v in red_d['scalars'].items()}
        out['n_valid'] = red_d['n']
        if is_nar:
            out['stage'] = stage
        return out

    @jax.jit
    def eval_fn(params, batch, rng):
        ids = _concat_ids(batch, is_nar, n_ctx)
        p_specs = jax.tree.map(lambda a: P(*([None] * jnp.ndim(a))), params)
        batch_specs = jax.tree.map(
            lambda x: P('data', *([None] * (jnp.ndim(x) - 1))), batch)
        keys = ('loss', 'acc', 'n_valid', 'stage') if is_nar \
            else ('loss', 'acc', 'n_valid')
        mapped = jax.shard_map(device_eval, mesh=mesh,
                               in_specs=(p_specs, P('data', 'ctx'),
                                         batch_specs, P()),
                               out_specs={k: P() for k in keys},
                               check_vma=False)
        with jax.default_matmul_precision(config.matmul_precision):
            return mapped(params, ids, batch, rng)
    return eval_fn


def make_cp_train_step(config, model_name: str, mesh: Mesh):
    """DP x CP train step over a ('data', 'ctx') mesh — same TrainState/batch/
    metrics contract as make_train_step.  Supports the AR family AND the NAR
    (whose 8-way embedding reduction and stage head are position-local too)."""
    import optax

    from ..train import TrainState, make_optimizer

    if model_name not in ('ValleAR', 'ValleASR', 'ValleNAR'):
        raise NotImplementedError(
            f'context parallelism: unknown model {model_name}')
    is_nar = model_name == 'ValleNAR'
    tx = make_optimizer(config)
    n_ctx = mesh.shape['ctx']
    n_data = mesh.shape.get('data', 1)
    tp = _cp_tp(config, mesh)

    def device_grads(params, ids, batch, rng):
        ttm = int(batch['tokens'].shape[1])
        tc = int(batch['codes'].shape[1]) if is_nar \
            else int(batch['target'].shape[1])

        if is_nar:
            def fwd(p):
                nll, acc, n, stage = _cp_loss_device_nar(
                    p, ids, batch, rng, config, ttm, tc, n_data, tp=tp)
                return nll, (acc, n, stage)
            (nll, (acc, n, stage)), grads = jax.value_and_grad(
                fwd, has_aux=True)(params)
        else:
            def fwd(p):
                nll, acc, n = _cp_loss_device(
                    p, ids, batch['target'],
                    batch.get('tokens_lens',
                              jnp.full((ids.shape[0],), ttm, jnp.int32)),
                    batch.get('codes_lens',
                              jnp.full((ids.shape[0],), tc, jnp.int32)),
                    rng, config, ttm, tc, n_ctx, n_data, tp=tp)
                return nll, (acc, n)
            (nll, (acc, n)), grads = jax.value_and_grad(
                fwd, has_aux=True)(params)
        if tp is not None:
            # CP x TP: tp_slice_stage's transpose scattered each model rank's
            # grad block into full-shaped zeros — one psum over 'model'
            # reassembles the dense transformer grads.  Every OTHER leaf
            # (embeddings, head, norms) computed identically across model
            # ranks (activations are replicated after the row-parallel
            # psums), so only the TP-partial suffixes reduce.  Ordered
            # BEFORE the ctx psum by dataflow (the ctx psum consumes these
            # grads), satisfying the one-collective-chain discipline.
            from .pipeline import _model_grad_reduce
            grads, _anchor = _model_grad_reduce(grads, tp[0])
        # ONE fused psum over 'ctx': every param grad is partial (only this
        # block's positions contributed) and the loss sums live per block.
        red = jax.lax.psum({'g': grads, 'nll': nll, 'acc': acc, 'n': n}, 'ctx')
        n_tot = jnp.maximum(red['n'], 1.0)
        grads = jax.tree.map(lambda v: v / n_tot, red['g'])
        metrics = {'loss': red['nll'] / n_tot, 'acc': red['acc'] / n_tot,
                   'n_valid': red['n']}
        # Weighted 'data' combine (chained after the ctx psum by dataflow).
        scalars = {k: v * red['n'] for k, v in metrics.items()
                   if k != 'n_valid'}
        red_d = jax.lax.psum(
            {'grads': jax.tree.map(lambda v: v * red['n'], grads),
             'scalars': scalars, 'n': red['n']}, 'data')
        total = jnp.maximum(red_d['n'], 1.0)
        grads = jax.tree.map(lambda v: v / total, red_d['grads'])
        out = {k: v / total for k, v in red_d['scalars'].items()}
        out['n_valid'] = red_d['n']
        if is_nar:
            out['stage'] = stage                    # replicated draw
        return out['loss'], grads, out

    def step_fn(state: TrainState, batch: dict, rng: jax.Array):
        step_rng = jax.random.fold_in(rng, state.step)
        ids = _concat_ids(batch, is_nar, n_ctx)
        p_specs = jax.tree.map(lambda a: P(*([None] * jnp.ndim(a))),
                               state.params)
        batch_specs = jax.tree.map(
            lambda x: P('data', *([None] * (jnp.ndim(x) - 1))), batch)
        keys = ('loss', 'acc', 'n_valid', 'stage') if is_nar \
            else ('loss', 'acc', 'n_valid')
        mapped = jax.shard_map(
            device_grads, mesh=mesh,
            in_specs=(p_specs, P('data', 'ctx'), batch_specs, P()),
            out_specs=(P(), p_specs, {k: P() for k in keys}),
            check_vma=False)
        with jax.default_matmul_precision(config.matmul_precision):
            loss, grads, metrics = mapped(state.params, ids, batch, step_rng)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        if bool(getattr(config, 'zero1', False)) and n_data > 1:
            # Pin ZeRO-1 moments back to their 'data'-sharded placement —
            # without the constraint the donated jitted step is free to
            # silently replicate them (same guard as make_train_step).
            from .mesh import param_sharding
            opt_state = jax.tree.map(
                jax.lax.with_sharding_constraint, opt_state,
                param_sharding(mesh, opt_state, zero1=True))
        params = optax.apply_updates(state.params, updates)
        metrics = dict(metrics)
        metrics['grad_norm'] = optax.global_norm(grads)
        return TrainState(params, opt_state, state.step + 1), metrics

    return jax.jit(step_fn, donate_argnums=(0,))
