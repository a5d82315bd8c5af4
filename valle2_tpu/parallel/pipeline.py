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
    """Largest usable GPipe microbatch count <= the configured one for a
    per-shard batch of ``b_local`` rows (pipeline_transformer requires
    b % m == 0; shapes are static per trace so this is a Python int)."""
    import math
    return max(1, math.gcd(int(b_local), int(m)))


def pipeline_transformer(p: Params, x: jax.Array, n_heads: int,
                         bias: jax.Array | None = None,
                         cond: jax.Array | None = None, *,
                         axis: str, num_stages: int, microbatches: int,
                         dropout_rate: float = 0.0,
                         rng: jax.Array | None = None,
                         remat: bool = False) -> jax.Array:
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
                              dropout_rate=dropout_rate, rng=layer_rng)
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

def make_pp_mesh(data: int, pipe: int, devices=None) -> Mesh:
    """A ('data', 'pipe') mesh: batch over 'data', layer stack over 'pipe'."""
    import numpy as np
    devices = devices if devices is not None else jax.devices()
    assert data * pipe <= len(devices), \
        f'mesh {data}x{pipe} needs {data * pipe} devices, have {len(devices)}'
    dev = np.asarray(devices[:data * pipe]).reshape(data, pipe)
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


def _pipe_grad_reduce(grads: Params) -> Params:
    """Complete per-rank gradients over the 'pipe' axis (see _HEAD_KEYS).

    ONE variadic psum for every leaf that needs it: collectives that are
    dataflow-independent of each other deadlock XLA:CPU's concurrent thunk
    executor (devices enter them in different orders — observed as a
    rendezvous hang at train step ~5 via the CLI), and a single fused
    all-reduce is cheaper on real ICI anyway.  The psum's operands include
    the embedding grads, which depend on the LAST backward ppermute, so the
    op is totally ordered after the whole pipeline on every rank."""
    def needs_psum(path) -> bool:
        keys = [getattr(e, 'key', getattr(e, 'name', None)) for e in path]
        if 'transformer' in keys:
            return False                  # stage-local by construction
        return not any(k in _HEAD_KEYS for k in keys)  # heads: complete already

    flat, treedef = jax.tree_util.tree_flatten_with_path(grads)
    reduce_vals = tuple(v for p, v in flat if needs_psum(p))
    if reduce_vals:
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

    Composes with grad_accum (optax.MultiSteps), remat, and zero1 (the optax
    update runs OUTSIDE the shard_map under GSPMD, so the optimizer moments
    shard over 'data' exactly as in the declarative step); not with
    lora / mesh_model (Trainer raises).  Flash attention declines to the bias
    path inside the pipeline (a nested Mosaic shard_map per stage isn't worth
    it at these sequence lengths).
    """
    from ..train import LOSS_FNS, TrainState, make_optimizer
    loss_fn = LOSS_FNS[model_name]
    tx = make_optimizer(config)
    n_pipe = mesh.shape['pipe']
    n_data = mesh.shape.get('data', 1)
    zero1 = bool(getattr(config, 'zero1', False)) and n_data > 1
    m_cfg = microbatches if microbatches is not None else max(
        1, int(getattr(config, 'pp_microbatches', 1)))
    nar_kw = {'data_axis': 'data'} \
        if model_name == 'ValleNAR' and n_data > 1 else {}

    def device_grads(params, batch, rng):
        """Per-device: local loss + completed grads (runs inside shard_map)."""
        # Batch shapes are static per trace: clamp the microbatch count so a
        # batch that doesn't divide by pp_microbatches (validation loaders use
        # drop_last=False; eval batch sizes are independent of train's) still
        # pipelines instead of tripping the b % m assert.  GPipe microbatching
        # never changes the math, only the schedule, so gcd-clamping is exact.
        b_local = jax.tree.leaves(batch)[0].shape[0]
        pp = ('pipe', n_pipe, _gcd(b_local, m_cfg))

        def fwd(p):
            return loss_fn(p, config, batch, rng, pp=pp, **nar_kw)
        (loss, metrics), grads = jax.value_and_grad(fwd, has_aux=True)(params)
        grads = _pipe_grad_reduce(grads)
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
        batch_specs = jax.tree.map(
            lambda x: P('data', *([None] * (jnp.ndim(x) - 1))), batch)
        mapped = jax.shard_map(
            device_grads, mesh=mesh,
            in_specs=(p_specs, batch_specs, P()),
            out_specs=(P(), p_specs, {k: P() for k in _metric_keys(model_name)}),
            check_vma=False)
        with jax.default_matmul_precision(config.matmul_precision):
            loss, grads, metrics = mapped(state.params, batch, step_rng)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        if zero1:
            # Pin the updated moments back to their ZeRO-1 placement so the
            # compiled step cannot silently replicate them (same guard as the
            # GSPMD step in train.py).
            opt_state = jax.tree.map(
                jax.lax.with_sharding_constraint, opt_state,
                pp_opt_specs(mesh, opt_state, zero1=True))
        params = optax.apply_updates(state.params, updates)
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
    m_cfg = microbatches if microbatches is not None else max(
        1, int(getattr(config, 'pp_microbatches', 1)))
    nar_kw = {'data_axis': 'data'} if is_nar and n_data > 1 else {}

    def device_eval(params, batch, rng):
        # Same per-trace microbatch clamp as the train step: validation
        # batches (valid_batch_size, drop_last=False trailing partials) need
        # not divide pp_microbatches.
        b_local = jax.tree.leaves(batch)[0].shape[0]
        pp = ('pipe', n_pipe, _gcd(b_local, m_cfg))
        if is_nar:
            _, metrics = loss_fn(params, config, batch, rng, train=False,
                                 pp=pp, **nar_kw)
        else:
            _, metrics = loss_fn(params, config, batch, None, pp=pp)
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
