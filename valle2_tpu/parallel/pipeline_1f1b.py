"""1F1B pipeline schedule: one-forward-one-backward with O(P) activation liveness.

Why a second schedule exists: the GPipe step (``pipeline.make_pp_train_step``)
gets its backward pass from ``jax.grad`` of the forward tick scan — correct and
simple, but autodiff saves residuals for EVERY tick, so activation liveness
grows with the microbatch count M (all M microbatches' stage activations are
alive when the backward starts).  The classic fix (Narayanan et al. 2019,
PipeDream-1F1B; Megatron-LM's default) interleaves each microbatch's backward
as soon as the last stage finishes its forward, bounding the in-flight
microbatch count at O(P) regardless of M — the knob that lets pods scale M for
bubble amortization ((P-1)/(M+P-1)) without scaling activation memory.

TPU-native formulation (hand-rolled VJP, no outer jax.grad):

- Every device runs ONE combined tick loop of T = M + 2P - 2 ticks.  Per tick
  a device does one forward unit (microbatch ``t - s`` through its local layer
  scan) AND one backward unit (microbatch ``t - (2(P-1) - s)``, recompute
  forward + VJP from the saved stage INPUT), with out-of-range units masked.
  The last stage runs the head + loss + their backward IN the tick, seeding
  the cotangent the same tick its forward finishes — that is the 1F1B
  property.
- Activations: a ring buffer of at most min(M, 2P) stage inputs (the live
  span of a microbatch between its forward and backward at one stage is
  < 2P ticks).  Nothing else persists across ticks — the tick loop is plain
  forward computation, so XLA saves no autodiff residuals.
- Backward-per-stage = recompute + VJP (activation-recompute 1F1B): per-tick
  cost ~= fwd + (fwd + bwd) ~= the remat'd GPipe step's, with memory O(P)
  instead of O(M).
- Gradients: stage-param grads accumulate locally; embeddings (stage 0),
  head (stage P-1), and AdaLN conditioning grads accumulate where computed
  and complete with the same single-psum-per-axis discipline as the GPipe
  step (pipe psum INCLUDING heads here — the head runs only on the last
  stage, unlike GPipe's replicated head).
- Exactness: the accumulated gradient is d(sum_mb nll_mb)/d(params) scaled by
  the psum'd token count — algebraically identical to loss_fn's weighted
  mean; parity vs the solo step is pinned at 1e-6 (tests/test_pipeline.py).

Composes with DP ('data' axis, weighted grad combine), manual TP ('model'
axis — tp_slice_stage inside the VJP closures), zero1, and grad_accum.
Select with ``config.pp_schedule = '1f1b'``.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from .pipeline import (_gcd, _metric_keys, _model_grad_reduce, pp_opt_specs,
                       pp_param_specs, tp_slice_stage)

Params = dict[str, Any]


def _pipe_sum_all(tree: Params, anchor=None) -> Params:
    """One variadic psum over 'pipe' of every NON-stack leaf.

    1F1B grads are disjoint over ranks: embeddings live on stage 0, the head
    on stage P-1, AdaLN conditioning partials on every stage, the loss sums
    on stage P-1 — psum reassembles all of them (zeros elsewhere).  The
    'transformer' layer-stack grads are each stage's OWN (L/P) slice,
    assembled by the P('pipe', ...) out_spec — summing them would mix
    stages, so they pass through untouched.
    ``anchor``: output of a preceding 'model' psum, threaded through an
    optimization_barrier to pin cross-axis collective order (NOTES.md)."""
    def needs(path) -> bool:
        keys = [getattr(e, 'key', getattr(e, 'name', None)) for e in path]
        return 'transformer' not in keys

    flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
    vals = tuple(v for p_, v in flat if needs(p_))
    if anchor is not None:
        vals, _ = jax.lax.optimization_barrier((vals, anchor))
    reduced = iter(jax.lax.psum(vals, 'pipe'))
    out = [next(reduced) if needs(p_) else v for p_, v in flat]
    return jax.tree_util.tree_unflatten(treedef, out)


def make_pp_train_step_1f1b(config, model_name: str, mesh: Mesh,
                            microbatches: int | None = None):
    """1F1B train step over a ('data', 'pipe'[, 'model']) mesh — drop-in for
    pipeline.make_pp_train_step (same TrainState/batch/metrics contract)."""
    import optax

    from ..models import ar as ar_mod
    from ..models import nar as nar_mod
    from ..ops.transformer import encoder_layer
    from ..train import TrainState, make_optimizer

    parts_fns = {'ValleAR': ar_mod.pp_microbatch_parts,
                 'ValleASR': ar_mod.pp_microbatch_parts,
                 'ValleNAR': nar_mod.pp_microbatch_parts}
    parts_fn = parts_fns[model_name]
    tx = make_optimizer(config)
    n_pipe = mesh.shape['pipe']
    n_data = mesh.shape.get('data', 1)
    n_model = mesh.shape.get('model', 1)
    zero1 = bool(getattr(config, 'zero1', False)) and n_data > 1
    m_cfg = microbatches if microbatches is not None else max(
        1, int(getattr(config, 'pp_microbatches', 1)))
    data_axis = 'data' if n_data > 1 else None
    lora_mode = config.lora_rank > 0
    if lora_mode:
        from ..lora import lora_scale, merge_lora
        scale = lora_scale(config)
    cdtype = jnp.dtype(config.dtype)
    from ..ops.nn import cast_to_compute

    def cast(p):
        return cast_to_compute(p, config)

    def device_grads(params, batch, rng):
        parts = parts_fn(config, batch, rng, data_axis=data_axis)
        prep_m, head_loss_m = parts['prep'], parts['head_loss']
        stage_idx = jax.lax.axis_index('pipe')
        b_local = jax.tree.leaves(batch)[0].shape[0]
        m = _gcd(b_local, m_cfg)
        mb = b_local // m
        if lora_mode:
            # Differentiate the ADAPTERS through the in-trace merge; the base
            # is a frozen closure constant (bit-identical forever).  Every
            # VJP closure below takes the TRAINABLE tree and re-merges —
            # a rank-r matmul per target per call, negligible.
            base, trainable = params['base'], params['lora']

            def as_model(tr):
                return merge_lora(base, tr, scale)
        else:
            trainable = params

            def as_model(tr):
                return tr

        def prep(tr, i, mb_):
            return prep_m(as_model(tr), i, mb_)

        def head_loss(tr, y_mb, i, mb_):
            return head_loss_m(as_model(tr), y_mb, i, mb_)

        l_per_stage = jax.tree.leaves(
            as_model(trainable)['transformer'])[0].shape[0]
        d = config.d_model
        # Probe prep once (mb 0) for the residual-stream shape/dtype.
        x0, bias0, cond0 = prep(trainable, jnp.int32(0), mb)
        s = x0.shape[1]
        ring_n = min(m, 2 * n_pipe)
        ticks = m + 2 * n_pipe - 2
        perm_fwd = [(i, (i + 1) % n_pipe) for i in range(n_pipe)]
        perm_bwd = [(i, (i - 1) % n_pipe) for i in range(n_pipe)]
        is_last = stage_idx == n_pipe - 1
        is_first = stage_idx == 0

        def stack_fn(p_raw, x_i, bias_i, cond_i, m_idx):
            """This stage's layer scan on one microbatch — the unit both the
            forward tick and the recompute-VJP differentiate through.  Casting,
            the LoRA merge, and (under TP) Megatron slicing live INSIDE so
            grads come back in the trainable tree's dtype/layout."""
            p_t = cast(as_model(p_raw)['transformer'])
            tp_axis = None
            local_heads = config.n_heads
            if n_model > 1:
                p_t = tp_slice_stage(p_t, 'model', n_model)
                tp_axis = 'model'
                local_heads //= n_model

            def body(carry, scan_in):
                layer_p, i = scan_in
                if rng is not None and config.dropout > 0.0:
                    g = stage_idx * l_per_stage + i
                    layer_rng = jax.random.fold_in(
                        jax.random.fold_in(rng, g), m_idx)
                    if n_data > 1:
                        # Replicated rng: fold the data rank so shards draw
                        # independent dropout masks.
                        layer_rng = jax.random.fold_in(
                            layer_rng, jax.lax.axis_index('data'))
                else:
                    layer_rng = None
                y = encoder_layer(layer_p, carry, local_heads, bias_i,
                                  cond_i, dropout_rate=config.dropout
                                  if layer_rng is not None else 0.0,
                                  rng=layer_rng, tp_axis=tp_axis)
                return y, None
            y, _ = jax.lax.scan(body, x_i, (p_t, jnp.arange(l_per_stage)))
            return y

        zeros_g = jax.tree.map(jnp.zeros_like, trainable)
        carry0 = dict(
            fwd=jnp.zeros((mb, s, d), x0.dtype),
            bwd=jnp.zeros((mb, s, d), x0.dtype),
            ring=jnp.zeros((ring_n, mb, s, d), x0.dtype),
            grads=zeros_g,
            nll=jnp.float32(0.0), acc=jnp.float32(0.0), nv=jnp.float32(0.0))

        def add_masked(acc, new, gate):
            g = gate.astype(jnp.float32)
            return jax.tree.map(lambda a, n_: a + n_.astype(a.dtype) * g,
                                acc, new)

        def tick(carry, t):
            # ---- forward unit: microbatch i_f = t - stage ----
            i_f = t - stage_idx
            f_valid = (i_f >= 0) & (i_f < m)
            i_f_c = jnp.clip(i_f, 0, m - 1)
            x_prep, bias_f, cond_f = prep(trainable, i_f_c, mb)
            x_in = jnp.where(is_first, x_prep, carry['fwd'])
            slot_f = jnp.mod(i_f_c, ring_n)
            old = jax.lax.dynamic_index_in_dim(carry['ring'], slot_f, 0,
                                               keepdims=False)
            ring = jax.lax.dynamic_update_index_in_dim(
                carry['ring'], jnp.where(f_valid, x_in, old), slot_f, 0)
            y = stack_fn(trainable, x_in, bias_f, cond_f, i_f_c)

            # Last stage: head + loss + their VJP in the SAME tick (1F1B).
            def head_closure(p_raw, y_):
                nll_sum, aux = head_loss(p_raw, y_.astype(cdtype), i_f_c, mb)
                return nll_sum, aux
            nll_sum, head_vjp, (acc_sum, nv_sum) = jax.vjp(
                head_closure, trainable, y, has_aux=True)
            d_head_params, dy = head_vjp(jnp.float32(1.0))
            seed_gate = f_valid & is_last
            grads = add_masked(carry['grads'], d_head_params, seed_gate)
            nll = carry['nll'] + nll_sum * seed_gate
            acc = carry['acc'] + acc_sum * seed_gate
            nv = carry['nv'] + nv_sum * seed_gate

            # ---- backward unit: microbatch i_b = t - (2(P-1) - stage) ----
            i_b = t - (2 * (n_pipe - 1) - stage_idx)
            b_valid = (i_b >= 0) & (i_b < m)
            i_b_c = jnp.clip(i_b, 0, m - 1)
            ct = jnp.where(is_last, dy.astype(x0.dtype), carry['bwd'])
            x_saved = jax.lax.dynamic_index_in_dim(
                ring, jnp.mod(i_b_c, ring_n), 0, keepdims=False)
            x_prep_b, bias_b, cond_b = prep(trainable, i_b_c, mb)

            def stage_closure(p_raw, x_):
                # cond re-derived from params INSIDE so stage-conditioning
                # grads (NAR AdaLN rows) accumulate with the stack's.
                _, _, cond_ = prep(p_raw, i_b_c, mb)
                return stack_fn(p_raw, x_, bias_b, cond_,
                                i_b_c).astype(jnp.float32)
            _, stage_vjp = jax.vjp(stage_closure, trainable, x_saved)
            d_stage_params, dx = stage_vjp(ct.astype(jnp.float32))
            grads = add_masked(grads, d_stage_params, b_valid)
            # Stage 0: the input cotangent belongs to prep (embeddings).
            def prep_closure(p_raw):
                x_, _, _ = prep(p_raw, i_b_c, mb)
                return x_.astype(jnp.float32)
            _, prep_vjp = jax.vjp(prep_closure, trainable)
            (d_prep_params,) = prep_vjp(dx)
            grads = add_masked(grads, d_prep_params, b_valid & is_first)

            # ---- transfers: fwd and bwd ppermutes ORDERED by a barrier ----
            fwd_next = jax.lax.ppermute(
                jnp.where(f_valid, y, x_in), 'pipe', perm_fwd)
            dx_send = jnp.where(b_valid, dx.astype(x0.dtype),
                                jnp.zeros_like(ct))
            dx_send, _ = jax.lax.optimization_barrier((dx_send, fwd_next))
            bwd_next = jax.lax.ppermute(dx_send, 'pipe', perm_bwd)
            return dict(fwd=fwd_next, bwd=bwd_next, ring=ring, grads=grads,
                        nll=nll, acc=acc, nv=nv), None

        carry, _ = jax.lax.scan(tick, carry0, jnp.arange(ticks))

        grads, nll, acc, nv = (carry['grads'], carry['nll'], carry['acc'],
                               carry['nv'])
        anchor = None
        if n_model > 1:
            # The stack grads under TP are partial over 'model' exactly as in
            # the GPipe step; the cond/emb/head grads computed from replicated
            # cotangents are identical per model rank.  _model_grad_reduce's
            # suffix rules pick out the right leaves.
            grads, anchor = _model_grad_reduce(grads, 'model')
        # ONE pipe psum reassembles everything (grads disjoint per stage,
        # loss sums only on the last stage).
        red = _pipe_sum_all({'g': grads, 'nll': nll, 'acc': acc, 'nv': nv},
                            anchor=anchor)
        n = jnp.maximum(red['nv'], 1.0)
        grads = jax.tree.map(lambda v: v / n, red['g'])
        metrics = {'loss': red['nll'] / n, 'acc': red['acc'] / n,
                   'n_valid': red['nv']}
        for k, v in parts['extra_metrics'].items():
            metrics[k] = v
        # Weighted 'data' combine — identical to the GPipe step's.
        scalars = {k: v.astype(jnp.float32) * red['nv']
                   for k, v in metrics.items() if k not in ('n_valid', 'stage')}
        red_d = jax.lax.psum(
            {'grads': jax.tree.map(lambda v: v * red['nv'], grads),
             'scalars': scalars, 'n': red['nv']}, 'data')
        total = jnp.maximum(red_d['n'], 1.0)
        grads = jax.tree.map(lambda v: v / total, red_d['grads'])
        out_metrics = {k: v / total for k, v in red_d['scalars'].items()}
        out_metrics['n_valid'] = red_d['n']
        if 'stage' in metrics:
            out_metrics['stage'] = metrics['stage']
        return out_metrics['loss'], grads, out_metrics

    def step_fn(state: TrainState, batch: dict, rng: jax.Array):
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
