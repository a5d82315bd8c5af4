"""Pipeline parallelism: GPipe microbatch schedule over a 'pipe' mesh axis.

The missing axis of the mesh story (DP / TP / SP / ZeRO-1 exist elsewhere in
``parallel/``): split the LAYER STACK over devices and stream microbatches
through the stages.  On TPU pods this is the parallelism that rides ICI with
O(b*s*d) point-to-point transfers per stage boundary instead of TP's
per-layer all-reduces — the right trade when layers are many and d_model is
small relative to the interconnect (exactly this model family: 12 layers,
d_model 1024, reference ``/root/reference/valle/models/modules.py:324-352``).

TPU-native formulation (no reference counterpart — the reference is
single-GPU): the stacked-layer params (L, ...) that ``ops.transformer``
already keeps for its ``lax.scan`` shard their leading axis over the 'pipe'
mesh axis, so each device holds L/P contiguous layers and NOTHING changes
about the parameter pytree.  Inside a ``jax.shard_map`` every device runs the
same tick loop: inject a microbatch at stage 0, run the LOCAL layer scan,
``ppermute`` activations to the next stage, collect finished microbatches at
the last stage.  ``jax.grad`` differentiates straight through — the transpose
of ``ppermute`` is the reverse permute, so the backward pass pipelines in the
opposite direction without any hand-written schedule.

Bubble fraction is the textbook (P-1)/(M+P-1); pick ``pp_microbatches`` >= 4x
the stage count to amortize.  Within a tick every stage computes (stages
whose microbatch is out of range compute garbage that is never collected and
never reaches the loss, so its gradients are exactly zero).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

Params = dict[str, Any]

# Top-level param keys applied AFTER the pipelined stack (output heads): their
# gradients are computed from the psum-broadcast pipeline output, identically
# on every pipe rank — already complete, no reduction.  Everything else that
# is not the stack itself feeds the pipeline from outside (embeddings, AdaLN
# stage conditioning): each rank sees only its stages' contribution, so the
# total gradient is the psum over 'pipe'.
_HEAD_KEYS = ('proj', 'proj_layers')


def _gcd(b_local: int, m: int) -> int:
    """Largest usable microbatch count <= the configured one for a per-shard
    batch of ``b_local`` rows: the LARGEST DIVISOR of b_local that is <= m
    (pipeline_transformer requires b % m == 0; shapes are static per trace so
    this is Python-int arithmetic).  gcd alone under-pipelines — e.g. b=6,
    m=4: gcd is 2 but 3 divides 6 and fits the budget (smaller bubble)."""
    b_local, m = int(b_local), int(m)
    m = max(1, min(m, b_local))
    while b_local % m:
        m -= 1
    return m


#: Leaf-path suffixes whose gradients are PARTIAL under manual TP slicing
#: (tp_slice_stage): the slice's transpose scatters each rank's block (or
#: partial sum, for LoRA factors) into a full-shaped zero tree, so one psum
#: over 'model' reassembles the exact dense gradient.  Row-parallel biases
#: (out/b, lin2/b — added once after the activation psum) and norm leaves
#: compute identically on every model rank and must NOT be reduced.
_TP_PARTIAL_SUFFIXES = tuple(
    f'{t}/{leaf}' for t in ('qkv', 'lin1') for leaf in ('w', 'b')
) + ('out/w', 'lin2/w') + tuple(
    f'{t}/{leaf}' for t in ('qkv', 'out', 'lin1', 'lin2')
    for leaf in ('lora_a', 'lora_b'))


def tp_slice_stage(p: Params, axis: str, mp: int) -> Params:
    """Differentiably slice a stage's stacked layer params to this model
    rank's Megatron shard — manual tensor parallelism INSIDE the pipeline
    shard_map.

    Layout contract matches the decode-path splits (mesh.tp_permute_qkv /
    tp_decode_specs), but computed in-trace from the canonical layout: the
    fused qkv's [q | k | v] columns regroup so this rank holds the contiguous
    [q_r | k_r | v_r] block of its heads; lin1 splits output columns (+bias);
    out/lin2 split input rows (head-aligned for ``out`` because merge_heads
    concatenates heads in order).  Norms, AdaLN conditioning, and row-parallel
    biases stay full (replicated work).  Because the slice is traced, params
    (and optimizer state, checkpoints) keep the canonical dense layout —
    cross-mesh restore needs no inverse permutation.

    The transpose of these slices scatters grads into full-shaped zeros;
    ``_model_grad_reduce`` psums them back together.
    """
    r = jax.lax.axis_index(axis)

    def qkv_cols(w):                     # (..., d_in | none, 3d) fused columns
        *lead, td = w.shape
        d = td // 3
        w5 = w.reshape(*lead, 3, mp, d // mp)
        loc = jnp.take(w5, r, axis=len(lead) + 1)
        return loc.reshape(*lead, 3 * (d // mp))

    def cols(w):                         # (..., out) → local output columns
        n = w.shape[-1] // mp
        return jax.lax.dynamic_slice_in_dim(w, r * n, n, axis=w.ndim - 1)

    def rows(w):                         # (..., in, out) → local input rows
        n = w.shape[-2] // mp
        return jax.lax.dynamic_slice_in_dim(w, r * n, n, axis=w.ndim - 2)

    def slice_for(path, leaf):
        keys = [getattr(e, 'key', getattr(e, 'name', None)) for e in path]
        joined = '/'.join(str(k) for k in keys if k is not None)
        if joined.endswith(('qkv/w', 'qkv/b')):
            return qkv_cols(leaf)
        if joined.endswith(('lin1/w', 'lin1/b')):
            return cols(leaf)
        if joined.endswith(('out/w', 'lin2/w')):
            return rows(leaf)
        return leaf
    return jax.tree_util.tree_map_with_path(slice_for, p)


def _model_grad_reduce(grads: Params, axis: str):
    """One variadic psum over ``axis`` for the TP-partial leaves (see
    _TP_PARTIAL_SUFFIXES).  Returns (reduced grads, anchor leaf) — the anchor
    lets the caller dataflow-order the NEXT collective after this one
    (independent collectives deadlock XLA:CPU's thunk executor; NOTES.md)."""
    def needs(path) -> bool:
        keys = [getattr(e, 'key', getattr(e, 'name', None)) for e in path]
        joined = '/'.join(str(k) for k in keys if k is not None)
        return joined.endswith(_TP_PARTIAL_SUFFIXES)

    flat, treedef = jax.tree_util.tree_flatten_with_path(grads)
    vals = tuple(v for p_, v in flat if needs(p_))
    anchor = None
    if vals:
        reduced = jax.lax.psum(vals, axis)
        anchor = reduced[0]
        it = iter(reduced)
        flat = [(p_, next(it) if needs(p_) else v) for p_, v in flat]
    return jax.tree_util.tree_unflatten(treedef, [v for _, v in flat]), anchor


def pipeline_transformer(p: Params, x: jax.Array, n_heads: int,
                         bias: jax.Array | None = None,
                         cond: jax.Array | None = None, *,
                         axis: str, num_stages: int, microbatches: int,
                         dropout_rate: float = 0.0,
                         rng: jax.Array | None = None,
                         remat: bool = False,
                         tp: tuple | None = None) -> jax.Array:
    """Device-local GPipe forward — call INSIDE a shard_map over ``axis``.

    ``p``: THIS STAGE's (L/P, ...) slice of the stacked layer params.
    ``x``: (b, s, d) local batch (already data-sharded by the ambient
    shard_map, replicated over 'pipe').  ``bias``: attention bias, broadcast
    to per-row and split per microbatch.  ``cond``: AdaLN conditioning
    ((1, d); not batch-indexed, passed through unchanged).

    Dropout: solo ``transformer`` folds the rng per layer; here it folds per
    (GLOBAL layer, microbatch) so masks stay independent across microbatches
    — a different (equally valid) draw than solo, bit-equal only at
    dropout_rate 0.

    ``tp``: (model_axis, mp) — manual tensor parallelism WITHIN each stage:
    this rank's layer slice is further sliced to its Megatron shard
    (tp_slice_stage), attention runs n_heads/mp local heads, and the
    row-parallel projections psum over the model axis per layer.  The mesh
    must carry both axes; every model rank holds the same stage replica.

    Returns (b, s, d), psum-broadcast over 'pipe' so every rank leaves with
    the real output (loss/eval code downstream needs no stage awareness).
    """
    from ..ops.transformer import encoder_layer

    l_per_stage = jax.tree.leaves(p)[0].shape[0]
    stage = jax.lax.axis_index(axis)
    m, n_st = microbatches, num_stages
    b, s, d = x.shape
    assert b % m == 0, \
        f'pp_microbatches={m} must divide the per-data-shard batch {b}'
    tp_axis = None
    if tp is not None:
        tp_axis, mp = tp
        p = tp_slice_stage(p, tp_axis, mp)
        n_heads //= mp
    mb = b // m
    x_mb = x.reshape(m, mb, s, d)
    bias_mb = None
    if bias is not None:
        full = jnp.broadcast_to(bias, (b, *bias.shape[1:]))
        bias_mb = full.reshape(m, mb, *bias.shape[1:])

    def local_stack(x_i: jax.Array, bias_i, m_idx: jax.Array) -> jax.Array:
        def body(carry, scan_in):
            layer_p, i = scan_in
            if rng is not None:
                g = stage * l_per_stage + i            # global layer index
                layer_rng = jax.random.fold_in(jax.random.fold_in(rng, g), m_idx)
            else:
                layer_rng = None
            y = encoder_layer(layer_p, carry, n_heads, bias_i, cond,
                              dropout_rate=dropout_rate, rng=layer_rng,
                              tp_axis=tp_axis)
            return y, None
        if remat:
            body = jax.checkpoint(body)
        y, _ = jax.lax.scan(body, x_i, (p, jnp.arange(l_per_stage)))
        return y

    perm = [(i, (i + 1) % n_st) for i in range(n_st)]
    ticks = m + n_st - 1

    def tick(carry, t):
        state, out = carry
        # Stage 0 injects microbatch t (clamped; post-M injections recompute
        # the last microbatch and are never collected).
        inj = jax.lax.dynamic_index_in_dim(x_mb, jnp.clip(t, 0, m - 1), 0,
                                           keepdims=False)
        state = jnp.where(stage == 0, inj, state)
        m_idx = jnp.clip(t - stage, 0, m - 1)          # microbatch at this stage
        bias_i = (jax.lax.dynamic_index_in_dim(bias_mb, m_idx, 0, keepdims=False)
                  if bias_mb is not None else None)
        y = local_stack(state, bias_i, m_idx)
        # Last stage finishes microbatch t-(P-1) at tick t.
        o_idx = jnp.clip(t - (n_st - 1), 0, m - 1)
        valid = (stage == n_st - 1) & (t >= n_st - 1)
        cur = jax.lax.dynamic_index_in_dim(out, o_idx, 0, keepdims=False)
        out = jax.lax.dynamic_update_index_in_dim(
            out, jnp.where(valid, y, cur), o_idx, 0)
        state = jax.lax.ppermute(y, axis, perm)
        return (state, out), None

    state0 = jnp.zeros((mb, s, d), x.dtype)
    out0 = jnp.zeros((m, mb, s, d), x.dtype)
    (_, out), _ = jax.lax.scan(tick, (state0, out0), jnp.arange(ticks))
    # Broadcast the finished activations to every pipe rank so downstream code
    # (head, loss, eval) runs replicated with no stage awareness.  STRAIGHT-
    # THROUGH broadcast: every rank then computes the SAME loss, so a plain
    # psum would receive P identical cotangents in its transpose and scale
    # every pipeline/embedding gradient by the stage count.  Routing the
    # backward through the local masked term instead injects the cotangent
    # exactly once (on the last stage), and the reverse-ppermute chain of the
    # tick scan pipelines it back through the stages.
    masked = jnp.where(stage == n_st - 1, out, jnp.zeros_like(out))
    out = masked + jax.lax.stop_gradient(jax.lax.psum(masked, axis) - masked)
    return out.reshape(b, s, d)


# ---------------------------------------------------------------------------
# Placement + mesh
# ---------------------------------------------------------------------------

def make_pp_mesh(data: int, pipe: int, model: int = 1, devices=None) -> Mesh:
    """A ('data', 'pipe'[, 'model']) mesh: batch over 'data', layer stack over
    'pipe', and (model > 1) Megatron tensor parallelism within each stage."""
    import numpy as np
    devices = devices if devices is not None else jax.devices()
    n = data * pipe * model
    assert n <= len(devices), \
        f'mesh {data}x{pipe}x{model} needs {n} devices, have {len(devices)}'
    if model > 1:
        dev = np.asarray(devices[:n]).reshape(data, pipe, model)
        return Mesh(dev, ('data', 'pipe', 'model'))
    dev = np.asarray(devices[:n]).reshape(data, pipe)
    return Mesh(dev, ('data', 'pipe'))


def pp_param_specs(params: Params) -> Params:
    """PartitionSpec tree: the 'transformer' layer stack splits its leading
    (layer) axis over 'pipe'; every other leaf replicates."""
    def spec_for(path, leaf):
        keys = [getattr(e, 'key', getattr(e, 'name', None)) for e in path]
        if 'transformer' in keys:
            return P('pipe', *([None] * (jnp.ndim(leaf) - 1)))
        return P(*([None] * jnp.ndim(leaf)))
    return jax.tree_util.tree_map_with_path(spec_for, params)


def pp_shard_params(mesh: Mesh, params: Params, zero1: bool = False) -> Params:
    """Place params (or structurally-matching opt state) on a pp mesh."""
    from .mesh import device_put_global
    specs = pp_opt_specs(mesh, params, zero1=zero1)
    return jax.tree.map(
        lambda leaf, s: device_put_global(leaf, s), params, specs)


def pp_opt_specs(mesh: Mesh, tree: Any, zero1: bool = False) -> Any:
    """NamedSharding tree for any pytree that embeds param-shaped subtrees
    (optimizer states included): leaves under a 'transformer' path key shard
    over 'pipe'; scalar/step leaves replicate.  ``zero1`` additionally shards
    the first free divisible axis over 'data' (ZeRO stage 1 — apply to the
    OPTIMIZER state only; AdamW is elementwise so any axis works)."""
    from .mesh import _zero1_extend
    data_size = mesh.shape.get('data', 1) if zero1 else 1

    def spec_for(path, leaf):
        keys = [getattr(e, 'key', getattr(e, 'name', None)) for e in path]
        if 'transformer' in keys and jnp.ndim(leaf) >= 1:
            spec = P('pipe', *([None] * (jnp.ndim(leaf) - 1)))
        else:
            spec = P(*([None] * jnp.ndim(leaf)))
        if data_size > 1 and jnp.ndim(leaf) >= 1:
            spec = _zero1_extend(spec, jnp.shape(leaf), data_size)
        return NamedSharding(mesh, spec)
    return jax.tree_util.tree_map_with_path(spec_for, tree)


def _pipe_grad_reduce(grads: Params, anchor: jax.Array | None = None) -> Params:
    """Complete per-rank gradients over the 'pipe' axis (see _HEAD_KEYS).

    ONE variadic psum for every leaf that needs it: collectives that are
    dataflow-independent of each other deadlock XLA:CPU's concurrent thunk
    executor (devices enter them in different orders — observed as a
    rendezvous hang at train step ~5 via the CLI), and a single fused
    all-reduce is cheaper on real ICI anyway.  The psum's operands include
    the embedding grads, which depend on the LAST backward ppermute, so the
    op is totally ordered after the whole pipeline on every rank.

    ``anchor``: an output leaf of a PRECEDING collective on another axis
    (the TP 'model' psum) — threading it through an optimization_barrier with
    this psum's operands pins the cross-axis ordering by dataflow (the two
    reductions touch disjoint leaves, so nothing else orders them)."""
    def needs_psum(path) -> bool:
        keys = [getattr(e, 'key', getattr(e, 'name', None)) for e in path]
        if 'transformer' in keys:
            return False                  # stage-local by construction
        return not any(k in _HEAD_KEYS for k in keys)  # heads: complete already

    flat, treedef = jax.tree_util.tree_flatten_with_path(grads)
    reduce_vals = tuple(v for p, v in flat if needs_psum(p))
    if reduce_vals:
        if anchor is not None:
            reduce_vals, _ = jax.lax.optimization_barrier(
                (reduce_vals, anchor))
        reduced = iter(jax.lax.psum(reduce_vals, 'pipe'))
        flat = [(p, next(reduced) if needs_psum(p) else v) for p, v in flat]
    return jax.tree_util.tree_unflatten(treedef, [v for _, v in flat])


# ---------------------------------------------------------------------------
# Train / eval steps
# ---------------------------------------------------------------------------

def make_pp_train_step(config, model_name: str, mesh: Mesh,
                       microbatches: int | None = None):
    """Manual DP x PP train step over a ('data', 'pipe') mesh.

    The whole loss runs inside ONE shard_map: batch split over 'data', the
    layer stack over 'pipe' (each rank scans its own L/P layers inside the
    GPipe tick loop), gradients completed with explicit collectives — psum
    over 'pipe' for pre-pipeline params, data-weighted mean over 'data' —
    then the optax update runs outside under GSPMD with the same placement.

    Composes with grad_accum (optax.MultiSteps), remat, zero1 (the optax
    update runs OUTSIDE the shard_map under GSPMD, so the optimizer moments
    shard over 'data' exactly as in the declarative step), lora (adapters
    shard over 'pipe' with their targets; the base is a frozen closure
    constant), and a 'model' mesh axis (manual Megatron TP within each stage
    — tp_slice_stage).  Flash attention declines to the bias path inside the
    pipeline (a nested Mosaic shard_map per stage isn't worth it at these
    sequence lengths).
    """
    from ..train import LOSS_FNS, TrainState, make_optimizer
    loss_fn = LOSS_FNS[model_name]
    tx = make_optimizer(config)
    n_pipe = mesh.shape['pipe']
    n_data = mesh.shape.get('data', 1)
    n_model = mesh.shape.get('model', 1)
    zero1 = bool(getattr(config, 'zero1', False)) and n_data > 1
    m_cfg = microbatches if microbatches is not None else max(
        1, int(getattr(config, 'pp_microbatches', 1)))
    dp_kw = {'data_axis': 'data'} if n_data > 1 else {}
    lora_mode = config.lora_rank > 0
    if lora_mode:
        from ..lora import lora_scale, merge_lora
        scale = lora_scale(config)

    def device_grads(params, batch, rng):
        """Per-device: local loss + completed grads (runs inside shard_map)."""
        # Batch shapes are static per trace: clamp the microbatch count so a
        # batch that doesn't divide by pp_microbatches (validation loaders use
        # drop_last=False; eval batch sizes are independent of train's) still
        # pipelines instead of tripping the b % m assert.  GPipe microbatching
        # never changes the math, only the schedule, so gcd-clamping is exact.
        b_local = jax.tree.leaves(batch)[0].shape[0]
        pp = ('pipe', n_pipe, _gcd(b_local, m_cfg)) if n_model == 1 else \
            ('pipe', n_pipe, _gcd(b_local, m_cfg), 'model', n_model)

        if lora_mode:
            base, trainable = params['base'], params['lora']

            def fwd(l):
                return loss_fn(merge_lora(base, l, scale), config, batch, rng,
                               pp=pp, **dp_kw)
        else:
            trainable = params

            def fwd(p):
                return loss_fn(p, config, batch, rng, pp=pp, **dp_kw)
        (loss, metrics), grads = jax.value_and_grad(fwd, has_aux=True)(trainable)
        anchor = None
        if n_model > 1:
            grads, anchor = _model_grad_reduce(grads, 'model')
        grads = _pipe_grad_reduce(grads, anchor=anchor)
        n = metrics['n_valid'].astype(jnp.float32)
        # ONE variadic all-reduce over 'data' for grads + loss + metrics:
        # d(global weighted loss)/dp = sum_l n_l*g_l / sum_l n_l — the exact
        # gradient of the GSPMD path's single global weighted mean.  Fused
        # into one psum so there is exactly one 'data' collective, ordered
        # after the pipe psum by dataflow (see _pipe_grad_reduce on why
        # independent collectives must not coexist).
        scalars = {k: v.astype(jnp.float32) * n for k, v in metrics.items()
                   if k not in ('n_valid', 'stage')}
        red = jax.lax.psum(
            {'grads': jax.tree.map(lambda v: v * n, grads),
             'scalars': scalars, 'n': n}, 'data')
        total = jnp.maximum(red['n'], 1.0)
        grads = jax.tree.map(lambda v: v / total, red['grads'])
        out_metrics = {k: v / total for k, v in red['scalars'].items()}
        out_metrics['n_valid'] = red['n'].astype(metrics['n_valid'].dtype)
        if 'stage' in metrics:
            out_metrics['stage'] = metrics['stage']  # replicated draw
        return out_metrics['loss'], grads, out_metrics

    def step_fn(state: TrainState, batch: dict, rng: jax.Array):
        import optax
        step_rng = jax.random.fold_in(rng, state.step)
        p_specs = pp_param_specs(state.params)
        trainable = state.params['lora'] if lora_mode else state.params
        g_specs = pp_param_specs(trainable)
        batch_specs = jax.tree.map(
            lambda x: P('data', *([None] * (jnp.ndim(x) - 1))), batch)
        mapped = jax.shard_map(
            device_grads, mesh=mesh,
            in_specs=(p_specs, batch_specs, P()),
            out_specs=(P(), g_specs, {k: P() for k in _metric_keys(model_name)}),
            check_vma=False)
        with jax.default_matmul_precision(config.matmul_precision):
            loss, grads, metrics = mapped(state.params, batch, step_rng)
        updates, opt_state = tx.update(grads, state.opt_state, trainable)
        if zero1:
            # Pin the updated moments back to their ZeRO-1 placement so the
            # compiled step cannot silently replicate them (same guard as the
            # GSPMD step in train.py).
            opt_state = jax.tree.map(
                jax.lax.with_sharding_constraint, opt_state,
                pp_opt_specs(mesh, opt_state, zero1=True))
        new_trainable = optax.apply_updates(trainable, updates)
        params = {'base': state.params['base'], 'lora': new_trainable} \
            if lora_mode else new_trainable
        metrics = dict(metrics)
        metrics['grad_norm'] = optax.global_norm(grads)
        return TrainState(params, opt_state, state.step + 1), metrics

    return jax.jit(step_fn, donate_argnums=(0,))


def _metric_keys(model_name: str) -> tuple[str, ...]:
    if model_name == 'ValleNAR':
        return ('loss', 'acc', 'stage', 'n_valid')
    return ('loss', 'acc', 'n_valid')


def make_pp_eval_step(config, model_name: str, mesh: Mesh,
                      microbatches: int | None = None):
    """Validation under the pp mesh: same shard_mapped loss, no grads."""
    from ..train import LOSS_FNS
    loss_fn = LOSS_FNS[model_name]
    is_nar = model_name == 'ValleNAR'
    n_pipe = mesh.shape['pipe']
    n_data = mesh.shape.get('data', 1)
    n_model = mesh.shape.get('model', 1)
    m_cfg = microbatches if microbatches is not None else max(
        1, int(getattr(config, 'pp_microbatches', 1)))
    dp_kw = {'data_axis': 'data'} if n_data > 1 else {}
    lora_mode = config.lora_rank > 0
    if lora_mode:
        from ..lora import lora_scale, merge_lora
        scale = lora_scale(config)

    def device_eval(params, batch, rng):
        # Same per-trace microbatch clamp as the train step: validation
        # batches (valid_batch_size, drop_last=False trailing partials) need
        # not divide pp_microbatches.
        b_local = jax.tree.leaves(batch)[0].shape[0]
        pp = ('pipe', n_pipe, _gcd(b_local, m_cfg)) if n_model == 1 else \
            ('pipe', n_pipe, _gcd(b_local, m_cfg), 'model', n_model)
        if lora_mode:
            params = merge_lora(params['base'], params['lora'], scale)
        if is_nar:
            _, metrics = loss_fn(params, config, batch, rng, train=False,
                                 pp=pp, **dp_kw)
        else:
            _, metrics = loss_fn(params, config, batch, None, pp=pp, **dp_kw)
        n = metrics['n_valid'].astype(jnp.float32)
        # One fused 'data' all-reduce (see _pipe_grad_reduce on collective
        # ordering) computing the token-weighted means.
        scalars = {k: v.astype(jnp.float32) * n for k, v in metrics.items()
                   if k not in ('n_valid', 'stage')}
        red = jax.lax.psum({'scalars': scalars, 'n': n}, 'data')
        total = jnp.maximum(red['n'], 1.0)
        out = {k: v / total for k, v in red['scalars'].items()}
        out['n_valid'] = red['n'].astype(metrics['n_valid'].dtype)
        if 'stage' in metrics:
            out['stage'] = metrics['stage']
        return out

    @jax.jit
    def eval_fn(params, batch, rng):
        p_specs = pp_param_specs(params)
        batch_specs = jax.tree.map(
            lambda x: P('data', *([None] * (jnp.ndim(x) - 1))), batch)
        out_spec = {k: P() for k in _metric_keys(model_name)}
        mapped = jax.shard_map(device_eval, mesh=mesh,
                               in_specs=(p_specs, batch_specs, P()),
                               out_specs=out_spec, check_vma=False)
        with jax.default_matmul_precision(config.matmul_precision):
            return mapped(params, batch, rng)
    return eval_fn
