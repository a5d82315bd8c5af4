"""Training loop: jitted update step, optax optimizer, orbax checkpointing, metrics.

TPU-native replacement for the reference's Lightning trainer
(``/root/reference/valle/train_model.py:13-44`` + the optimizer config at
``valle_ar.py:182-194``).  One pjit-compiled function does forward + backward + global
-norm clip + AdamW update, sharded over the ('data', 'model') mesh; gradient psums ride
ICI, inserted by XLA from the sharding annotations.  Grad accumulation uses
``optax.MultiSteps`` (SURVEY §2.3).  Checkpoint/resume is orbax (params + opt state +
step); metrics go to TensorBoard via tensorboardX under the same ``train/loss`` tag as
the reference (valle_ar.py:88) for comparability.

Public API parity: ``train(hparams_fp, model_name)`` and a ``-c/--config -m/--model``
CLI (train_model.py:38-44 — whose shipped entry point crashes on a bad attribute,
SURVEY Q2; this one works).
"""

from __future__ import annotations

import argparse
import signal
import time
from pathlib import Path
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .config import ConfigValle
from .data import get_dataloaders
from .models import ar as ar_mod
from .models import nar as nar_mod
from .parallel import shard_batch, shard_params
from .utils import log_info

Params = dict[str, Any]

LOSS_FNS = {
    'ValleAR': ar_mod.loss_fn,
    'ValleASR': ar_mod.loss_fn,
    'ValleNAR': nar_mod.loss_fn,
}
INIT_FNS = {
    'ValleAR': ar_mod.init_params,
    'ValleASR': ar_mod.init_params,
    'ValleNAR': nar_mod.init_params,
}


class TrainState(NamedTuple):
    params: Params
    opt_state: Any
    step: jax.Array


def lr_schedule(config: ConfigValle) -> optax.Schedule:
    """Reference scheduler: CosineAnnealingWarmRestarts(T_0=lr_warmup) — restart-period
    cosine from lr to 0 (valle_ar.py:190-193).  'warmup_cosine' is the TPU-recommended
    alternative; 'constant' for debugging."""
    if config.schedule == 'cosine_restarts':
        period = max(config.lr_warmup, 1)

        def sched(step):
            t = jnp.mod(step, period) / period
            return config.lr * 0.5 * (1.0 + jnp.cos(jnp.pi * t))
        return sched
    if config.schedule == 'warmup_cosine':
        return optax.warmup_cosine_decay_schedule(
            0.0, config.lr, config.lr_warmup,
            max(config.max_steps, config.lr_warmup + 1))
    return optax.constant_schedule(config.lr)


def make_optimizer(config: ConfigValle) -> optax.GradientTransformation:
    """AdamW(betas, wd) + global-norm clip (reference valle_ar.py:182-189 +
    Trainer(gradient_clip_val), train_model.py:31).  'Fused' is inherent under XLA."""
    tx = optax.chain(
        optax.clip_by_global_norm(config.gradient_clip_val),
        optax.adamw(lr_schedule(config), b1=config.betas[0], b2=config.betas[1],
                    weight_decay=config.weight_decay),
    )
    if config.grad_accum > 1:
        tx = optax.MultiSteps(tx, config.grad_accum)
    return tx


def init_state(config: ConfigValle, model_name: str, rng: jax.Array,
               base_params: Params | None = None) -> TrainState:
    """Fresh training state.  ``base_params``: start from these weights instead
    of a random init (an in-memory alternative to ``config.lora_base`` /
    checkpoint restore — e.g. fine-tuning a model object already loaded)."""
    params = base_params if base_params is not None \
        else INIT_FNS[model_name](rng, config)
    tx = make_optimizer(config)
    if config.lora_rank > 0:
        # LoRA fine-tuning: params become {'base', 'lora'} and the optimizer
        # sees ONLY the adapters (base frozen; lora.py).  lora_base loads the
        # weights being adapted (a model params dir or a Trainer step dir).
        from . import lora as lora_mod
        if config.lora_base and base_params is None:
            from .models.checkpoint import load_params
            params = load_params(config.lora_base, params)
        params = lora_mod.attach(params, config, jax.random.fold_in(rng, 1))
        return TrainState(params, tx.init(params['lora']), jnp.int32(0))
    return TrainState(params, tx.init(params), jnp.int32(0))


def make_train_step(config: ConfigValle, model_name: str, mesh=None):
    """Build the jitted (state, batch, rng) → (state, metrics) update.

    Placement is fully declarative — params/batches arrive pre-placed by
    shard_params / shard_batch and GSPMD propagates the shardings through the
    step.  ``mesh`` is only consulted for ``config.zero1``: the updated
    optimizer state is then explicitly constrained back to its ZeRO-1
    placement, so the compiled step cannot silently replicate it."""
    loss_fn = LOSS_FNS[model_name]
    tx = make_optimizer(config)
    zero1 = bool(config.zero1) and mesh is not None \
        and mesh.shape.get('data', 1) > 1

    # Multi-device meshes must reach the loss: flash attention then runs
    # inside a shard_map (GSPMD cannot partition a Mosaic kernel — the step
    # would raise at lowering on real multi-chip TPU otherwise; see
    # ops.attention.flash_shard_mesh).
    loss_mesh = mesh if mesh is not None and mesh.size > 1 else None

    lora_mode = config.lora_rank > 0
    if lora_mode:
        from .lora import lora_scale, merge_lora
        scale = lora_scale(config)

    def step_fn(state: TrainState, batch: dict, rng: jax.Array):
        step_rng = jax.random.fold_in(rng, state.step)
        if lora_mode:
            # Fine-tune: differentiate w.r.t. the ADAPTERS only; the base is a
            # frozen closure constant (stays bit-identical), merged into dense
            # weights in-trace (a rank-r matmul per target — lora.py).
            base, trainable = state.params['base'], state.params['lora']
            fwd = lambda l: loss_fn(merge_lora(base, l, scale), config, batch,
                                    step_rng, mesh=loss_mesh)
        else:
            trainable = state.params
            fwd = lambda p: loss_fn(p, config, batch, step_rng, mesh=loss_mesh)
        with jax.default_matmul_precision(config.matmul_precision):
            grads, metrics = jax.grad(fwd, has_aux=True)(trainable)
        updates, opt_state = tx.update(grads, state.opt_state, trainable)
        if zero1:
            from .parallel import param_sharding
            opt_state = jax.tree.map(
                jax.lax.with_sharding_constraint, opt_state,
                param_sharding(mesh, opt_state, zero1=True))
        params = optax.apply_updates(trainable, updates)
        if lora_mode:
            params = {'base': base, 'lora': params}
        metrics = dict(metrics)
        # NOTE: per-MICRO-batch gradient norm; under grad_accum > 1 the
        # accumulated gradient that clip_by_global_norm sees is smoother.
        metrics['grad_norm'] = optax.global_norm(grads)
        return TrainState(params, opt_state, state.step + 1), metrics

    # With a mesh, params are placed by parallel.shard_params and the batch by
    # parallel.shard_batch before the call; GSPMD propagates the shardings through
    # the whole step and inserts the grad psum / TP collectives itself.
    # cached_jit: with an AOT cache dir enabled, a restarted/resumed run loads
    # the serialized step executable instead of re-compiling it.
    from .aot import cached_jit, config_key
    return cached_jit(step_fn, tag=f'train_step_{model_name}',
                      extra_key=config_key(config), donate_argnums=(0,))


def make_eval_step(config: ConfigValle, model_name: str, mesh=None):
    loss_fn = LOSS_FNS[model_name]
    is_nar = model_name == 'ValleNAR'
    loss_mesh = mesh if mesh is not None and mesh.size > 1 else None

    @jax.jit
    def eval_fn(params: Params, batch: dict, rng: jax.Array):
        if config.lora_rank > 0:
            # Fine-tune states ({'base','lora'}) evaluate the merged weights.
            from .lora import merged
            params = merged(params, config)
        # Deterministic evaluation: the AR loss disables dropout via rng=None;
        # the NAR loss still needs the rng for its stage draw, so it takes an
        # explicit train=False (passing the rng alone would turn dropout ON
        # and inflate every validation loss).  Same matmul precision as the
        # train step — otherwise a 'highest'-precision config would silently
        # validate at the backend default (bf16-class on this TPU).  Same
        # mesh as the train step — flash must shard_map under a mesh.
        with jax.default_matmul_precision(config.matmul_precision):
            if is_nar:
                _, metrics = loss_fn(params, config, batch, rng, train=False,
                                     mesh=loss_mesh)
            else:
                _, metrics = loss_fn(params, config, batch, None,
                                     mesh=loss_mesh)
        return metrics
    return eval_fn


class _PreemptGuard:
    """SIGTERM → request a clean stop.

    TPU pods get a termination notice (maintenance/eviction) delivered as
    SIGTERM with a short grace window; the reference's Lightning stack dies and
    loses everything since the last periodic save.  Here ``fit()`` installs
    this guard (``config.preempt_checkpoint``), finishes the in-flight
    micro-step, writes a checkpoint, and returns — ``--resume`` then continues
    from the preemption point.  The previous handler is restored on exit;
    off the main thread (where ``signal.signal`` raises) the guard degrades to
    a no-op and default delivery applies.
    """

    def __init__(self, enabled: bool = True):
        self.enabled = enabled
        self.requested = False
        self._prev = None
        self._installed = False

    def install(self) -> None:
        if not self.enabled:
            return
        try:
            self._prev = signal.signal(signal.SIGTERM, self._on_signal)
            self._installed = True
        except ValueError:      # not the main thread
            pass

    def uninstall(self) -> None:
        if self._installed:
            signal.signal(signal.SIGTERM, self._prev)
            self._installed = False

    def _on_signal(self, signum, frame):
        self.requested = True


class Trainer:
    """Step-driven train loop (max_steps, log_every_n_steps, ckpt_every_n_steps)."""

    def __init__(self, config: ConfigValle, model_name: str, mesh=None,
                 use_tensorboard: bool = True):
        self.config = config
        self.model_name = model_name
        self.mesh = mesh
        # Pipeline-parallel meshes take the manual shard_map step (GSPMD has no
        # pipelining concept); everything else rides the declarative GSPMD step.
        self._pp = mesh is not None and 'pipe' in mesh.axis_names
        self._cp = mesh is not None and 'ctx' in mesh.axis_names
        if self._cp:
            if config.lora_rank > 0 or config.mesh_pipe > 1:
                raise ValueError(
                    'mesh_ctx composes with mesh_data and mesh_model '
                    '(DP x CP x TP): disable lora_rank / mesh_pipe')
            from .parallel import make_cp_train_step
            from .parallel.context import make_cp_eval_step
            self.train_step = make_cp_train_step(config, model_name, mesh)
            self.eval_step = make_cp_eval_step(config, model_name, mesh)
        elif self._pp:
            n_pipe = mesh.shape['pipe']
            if config.num_layers % n_pipe != 0:
                raise ValueError(
                    f'num_layers={config.num_layers} must divide into '
                    f'mesh_pipe={n_pipe} equal stages')
            n_model = mesh.shape.get('model', 1)
            if n_model > 1:
                from .parallel import tp_divisible
                if not tp_divisible(config.n_heads, config.dim_feedforward,
                                    n_model):
                    raise ValueError(
                        f'mesh_model={n_model} must divide n_heads='
                        f'{config.n_heads} and dim_feedforward='
                        f'{config.dim_feedforward} (Megatron TP within each '
                        f'pipeline stage)')
            from .parallel import make_pp_eval_step, make_pp_train_step
            if config.pp_schedule == '1f1b':
                from .parallel.pipeline_1f1b import make_pp_train_step_1f1b
                self.train_step = make_pp_train_step_1f1b(config, model_name,
                                                          mesh)
            else:
                self.train_step = make_pp_train_step(config, model_name, mesh)
            # Eval has no backward — the schedule is a training concern; the
            # GPipe eval step serves both.
            self.eval_step = make_pp_eval_step(config, model_name, mesh)
        else:
            self.train_step = make_train_step(config, model_name, mesh)
            self.eval_step = make_eval_step(config, model_name, mesh)
        self._async_ckptr = None
        self.writer = None
        if use_tensorboard:
            try:
                from tensorboardX import SummaryWriter
                config.ensure_dirs()
                self.writer = SummaryWriter(str(Path(config.log_path) / model_name))
            except ImportError:
                pass

    # ---- checkpointing (orbax) ----
    def save_checkpoint(self, state: TrainState, wait: bool = True) -> None:
        """Save {params, opt_state, step}.

        With ``config.async_checkpoint`` the serialization/IO runs on orbax's
        background thread; ``wait=False`` (the step loop's periodic saves)
        returns as soon as the device→host copy lands, so training never
        blocks on disk.  The default ``wait=True`` keeps blocking semantics
        for direct API callers (save → restore is immediately safe) and for
        the trailing/preemption saves.
        """
        import orbax.checkpoint as ocp
        self.config.ensure_dirs()
        # Directory names use OPTIMIZER steps (what max_steps/ckpt_every count);
        # the saved 'step' field keeps the raw micro count the rng fold uses.
        opt_step = int(state.step) // max(1, self.config.grad_accum)
        path = (Path(self.config.ckpt_path).resolve() / self.model_name
                / f'step_{opt_step}')
        item = {'params': state.params, 'opt_state': state.opt_state,
                'step': state.step}
        if self.config.async_checkpoint:
            if self._async_ckptr is None:
                self._async_ckptr = ocp.AsyncCheckpointer(
                    ocp.PyTreeCheckpointHandler())
            # One save in flight: the previous write must land before a new
            # directory starts (also surfaces any background write error here
            # rather than silently at interpreter exit).
            self._async_ckptr.wait_until_finished()
            self._async_ckptr.save(path, item, force=True)
            if wait:
                self._async_ckptr.wait_until_finished()
        else:
            with ocp.PyTreeCheckpointer() as ckptr:
                ckptr.save(path, item, force=True)
        log_info('Saved checkpoint at step %d → %s%s', opt_step, path,
                 '' if wait or not self.config.async_checkpoint
                 else ' (async, write in flight)')
        self._prune_checkpoints(keep_step=opt_step)

    def _prune_checkpoints(self, keep_step: int) -> None:
        """Retention (``config.keep_checkpoints = N > 0``): delete all but the
        newest N completed checkpoint dirs.  Only fully-numeric ``step_*``
        dirs are candidates (orbax tmp dirs from an in-flight or crashed save
        are never touched), the just-saved step never is, and on multi-host
        runs only the primary process deletes (saves are collective; the
        filesystem side effect must be singleton)."""
        keep = int(self.config.keep_checkpoints)
        if keep <= 0:
            return
        from .parallel import is_primary
        if not is_primary():
            return
        root = Path(self.config.ckpt_path).resolve() / self.model_name
        steps = sorted((int(p.name.split('_')[1]), p)
                       for p in root.glob('step_*')
                       if p.name.split('_')[1].isdigit())
        import shutil
        for _, p in steps[:-keep]:
            if p.name == f'step_{keep_step}':
                continue
            shutil.rmtree(p, ignore_errors=True)
            log_info('Pruned checkpoint %s (keep_checkpoints=%d)', p, keep)

    def finish_checkpoints(self) -> None:
        """Block until any in-flight async save lands and release the writer."""
        if self._async_ckptr is not None:
            self._async_ckptr.wait_until_finished()
            self._async_ckptr.close()
            self._async_ckptr = None

    def restore_checkpoint(self, state: TrainState, path: str | Path) -> TrainState:
        """Mesh-agnostic restore: the checkpoint is read back as host arrays (so a
        checkpoint written on one mesh topology restores on any other — or on no
        mesh at all), then placed under this trainer's mesh sharding rules."""
        import orbax.checkpoint as ocp
        host_item = jax.tree.map(np.asarray,
                                 {'params': state.params, 'opt_state': state.opt_state,
                                  'step': state.step})
        with ocp.PyTreeCheckpointer() as ckptr:
            restored = ckptr.restore(Path(path).resolve(), item=host_item)
        params, opt_state = restored['params'], restored['opt_state']
        if self._pp:
            from .parallel import pp_shard_params
            params = pp_shard_params(self.mesh, params)
            opt_state = pp_shard_params(self.mesh, opt_state,
                                        zero1=self.config.zero1)
        elif self.mesh is not None:
            params = shard_params(self.mesh, params)
            opt_state = shard_params(self.mesh, opt_state,
                                     zero1=self.config.zero1)
        return TrainState(params, opt_state, jnp.asarray(restored['step']))

    def latest_checkpoint(self) -> Path | None:
        root = Path(self.config.ckpt_path) / self.model_name
        if not root.exists():
            return None
        # Skip non-numeric step dirs (e.g. orbax's step_N.orbax-checkpoint-tmp-*
        # left by an interrupted save) — resume must survive a crashed run.
        steps = sorted((int(p.name.split('_')[1]), p) for p in root.glob('step_*')
                       if p.name.split('_')[1].isdigit())
        return steps[-1][1] if steps else None

    # ---- loops ----
    def fit(self, state: TrainState, train_loader, valid_loader=None,
            resume: bool = False) -> TrainState:
        cfg = self.config
        # rbg = TPU hardware PRNG for dropout masks / NAR stage draws (threefry
        # mask generation measured ~12% of the 204M step — BENCHMARKS.md r2).
        rng = jax.random.key(cfg.seed, impl=cfg.train_rng_impl)
        if resume:
            latest = self.latest_checkpoint()
            if latest is not None:
                state = self.restore_checkpoint(state, latest)
                log_info('Resumed from %s (step %d)', latest, int(state.step))
        if self._pp:
            from .parallel import pp_shard_params
            state = TrainState(pp_shard_params(self.mesh, state.params),
                               pp_shard_params(self.mesh, state.opt_state,
                                               zero1=self.config.zero1),
                               state.step)
        elif self.mesh is not None:
            # Optimizer-state leaves mirror the param tree (adam mu/nu), so the same
            # path-suffix sharding rules apply; unmatched leaves replicate —
            # or, with config.zero1, shard over 'data' (ZeRO stage 1).
            state = TrainState(shard_params(self.mesh, state.params),
                               shard_params(self.mesh, state.opt_state,
                                            zero1=self.config.zero1),
                               state.step)

        t_start = time.time()
        frames = 0
        # max_steps / log_every / ckpt_every are denominated in OPTIMIZER
        # steps (the reference's Lightning semantics): with grad_accum > 1,
        # MultiSteps applies an update every `accum` micro-batches, so the
        # loop runs max_steps * accum micro-batches.  state.step counts micro
        # steps (it feeds the per-micro-batch rng fold).
        accum = max(1, cfg.grad_accum)
        micro = int(state.step)
        step = micro // accum
        # Data-stream resume: shuffle order is a pure function of (seed,
        # epoch), and the step rng folds on state.step — so fast-forwarding
        # the loader to the interruption point makes a resumed run replay the
        # EXACT batch/rng stream of an uninterrupted one (bit-identical
        # params, tested).  Skipped batches only pay host-side collate once.
        skip = 0
        if (micro > 0 and hasattr(train_loader, 'set_epoch')
                and (per_epoch := len(train_loader)) > 0):
            train_loader.set_epoch(micro // per_epoch)
            skip = micro % per_epoch
            if skip:
                log_info('Resuming data stream: epoch %d, skipping %d batches',
                         micro // per_epoch, skip)
        guard = _PreemptGuard(enabled=cfg.preempt_checkpoint)
        guard.install()
        try:
            while step < cfg.max_steps and not guard.requested:
                served_any = False
                for batch in self._batches(train_loader):
                    if skip:
                        skip -= 1
                        served_any = True
                        continue
                    if step >= cfg.max_steps:
                        break
                    served_any = True
                    state, metrics = self.train_step(state, batch, rng)
                    frames += int(np.prod(batch['codes'].shape[:2]))
                    micro += 1
                    if guard.requested:
                        # Preemption notice: save THIS micro-state and leave —
                        # resume restores the exact micro count (rng fold and
                        # accumulation position included).
                        log_info('SIGTERM: checkpointing at step %d and exiting',
                                 micro // accum)
                        self.save_checkpoint(state, wait=True)
                        return state
                    if micro % accum:
                        continue           # mid-accumulation: no update applied
                    step += 1
                    if cfg.log_every_n_steps and (step % cfg.log_every_n_steps == 0
                                                  or step == 1):
                        m = {k: float(v) for k, v in metrics.items()}
                        elapsed = time.time() - t_start
                        log_info('step %d | loss %.4f | acc %.3f | %.0f frames/s',
                                 step, m['loss'], m.get('acc', 0.0),
                                 frames / max(elapsed, 1e-6))
                        if self.writer:
                            self.writer.add_scalar('train/loss', m['loss'], step)
                            for k, v in m.items():
                                if k != 'loss':
                                    self.writer.add_scalar(f'train/{k}', v, step)
                    if cfg.ckpt_every_n_steps and step % cfg.ckpt_every_n_steps == 0:
                        self.save_checkpoint(state, wait=False)
                if not served_any and step < cfg.max_steps:
                    # Empty epoch (empty dataset, or every batch dropped by the
                    # mesh divisibility filter): spinning here forever with
                    # validation passes per spin is an outage, not training.
                    raise RuntimeError(
                        'train loader produced no usable batches in a full epoch '
                        '(empty dataset, or all batches dropped by the data-axis '
                        'divisibility filter)')
                if valid_loader is not None:
                    self.validate(state, valid_loader, step, rng)
            self.save_checkpoint(state, wait=True)
            return state
        finally:
            guard.uninstall()
            self.finish_checkpoints()

    def _place(self, batch):
        """Host batch → device arrays (mesh-sharded when configured); None drops
        a trailing batch that cannot shard over the data axis (the
        DistributedSampler drop_last analog)."""
        if self.mesh is not None:
            rows = int(jax.tree.leaves(batch)[0].shape[0])
            if rows % self.mesh.shape['data'] != 0:
                log_info('Dropping %d-row batch (not divisible by data axis %d)',
                         rows, self.mesh.shape['data'])
                return None
            return shard_batch(self.mesh, batch)
        return jax.tree.map(jnp.asarray, batch)

    def _batches(self, loader):
        """Iterate device-placed batches; with config.prefetch_batches > 0 the
        host-side work (dataset iteration, collate, transfer dispatch) runs on a
        background thread that stays ahead of the step loop (data/prefetch.py)."""
        n = self.config.prefetch_batches
        if n > 0:
            from .data.prefetch import DevicePrefetcher
            return iter(DevicePrefetcher(loader, size=n, place=self._place))
        return (b for batch in loader if (b := self._place(batch)) is not None)

    def validate(self, state: TrainState, valid_loader, step: int, rng: jax.Array):
        losses, weights = [], []
        # Eval batches shard like train ones — on a mesh an unsharded batch
        # would replicate the whole eval pass on every device.
        for i, batch in enumerate(self._batches(valid_loader)):
            metrics = self.eval_step(state.params, batch, jax.random.fold_in(rng, i))
            losses.append(float(metrics['loss']))
            weights.append(float(metrics.get('n_valid', 1.0)))
        if losses:
            # Token-count-weighted mean: with drop_last=False the trailing
            # partial batch must not be over-weighted vs the full ones.
            mean = float(np.average(losses, weights=weights)
                         if sum(weights) > 0 else np.mean(losses))
            log_info('valid | step %d | loss %.4f', step, mean)
            if self.writer:
                self.writer.add_scalar('valid/loss', mean, step)
            return mean
        return None


def train(hparams_fp: Path | str, model_name: str, synthetic: bool = False,
          mesh=None, resume: bool = False) -> TrainState:
    """End-to-end training entry (reference train_model.py:13-35)."""
    config = ConfigValle.from_json(hparams_fp)
    # Multi-host: connect into the pod BEFORE any other jax call so
    # jax.devices() is global.  No-op unless $VALLE2_COORDINATOR (or pod
    # metadata) configures a cluster (parallel/distributed.py).
    from .parallel import init_distributed, is_primary
    init_distributed()
    from .compile_cache import enable_compilation_cache
    enable_compilation_cache(fallback=config.compile_cache_dir)
    from .aot import enable_aot_cache
    enable_aot_cache(fallback=config.aot_cache_dir)
    if config.mesh_pipe > 1 and config.mesh_ctx > 1:
        # A silent elif would build the pp mesh and DROP the configured
        # context sharding — fail loudly instead (mesh_ctx is documented
        # exclusive with mesh_pipe/mesh_model/lora).
        raise ValueError('mesh_ctx and mesh_pipe are exclusive — pick the '
                         'axis that addresses your bottleneck (memory per '
                         'sequence: ctx; layers across chips: pipe)')
    if mesh is None and config.mesh_pipe > 1:
        from .parallel import make_pp_mesh
        mesh = make_pp_mesh(config.mesh_data, config.mesh_pipe,
                            config.mesh_model)
        log_info('Mesh from config: %dx%dx%d (data x pipe x model)',
                 config.mesh_data, config.mesh_pipe, config.mesh_model)
    elif mesh is None and config.mesh_ctx > 1:
        from .parallel import make_cp_mesh
        mesh = make_cp_mesh(config.mesh_data, config.mesh_ctx,
                            config.mesh_model)
        log_info('Mesh from config: %dx%dx%d (data x ctx x model)',
                 config.mesh_data, config.mesh_ctx, config.mesh_model)
    elif mesh is None and config.mesh_data * config.mesh_model > 1:
        # The config's mesh request (mesh_data x mesh_model) builds the device
        # mesh here so `-c cfg.json` alone scales a run across chips.
        from .parallel import make_mesh
        mesh = make_mesh(data=config.mesh_data, model=config.mesh_model)
        log_info('Mesh from config: %dx%d (data x model)',
                 config.mesh_data, config.mesh_model)
    log_info('Training %s with %s', model_name, config)
    state = init_state(config, model_name, jax.random.key(config.seed))
    train_loader, valid_loader = get_dataloaders(model_name, config, synthetic=synthetic)
    # Singleton side effects (TensorBoard) live on the primary process only;
    # the step loop and orbax saves are collective and run on every process.
    trainer = Trainer(config, model_name, mesh=mesh,
                      use_tensorboard=is_primary())
    return trainer.fit(state, train_loader, valid_loader, resume=resume)


def main(argv=None):
    parser = argparse.ArgumentParser(description='Train a VALL-E TPU model')
    parser.add_argument('-c', '--config', type=Path, required=True)
    parser.add_argument('-m', '--model', type=str,
                        choices=['ValleAR', 'ValleNAR', 'ValleASR'], required=True)
    parser.add_argument('--synthetic', action='store_true',
                        help='Use synthetic data (no dataset download)')
    parser.add_argument('--resume', action='store_true')
    parser.add_argument('--profile', type=Path, default=None,
                        help='Capture a jax.profiler device trace into this dir')
    parser.add_argument('--debug-nans', action='store_true',
                        help='Enable jax_debug_nans (numerics sanitizer)')
    parser.add_argument('--platform', type=str, default=None,
                        choices=['cpu', 'tpu'],
                        help='Force the JAX backend (the axon PJRT plugin '
                             'ignores $JAX_PLATFORMS, so CPU smoke runs need '
                             'the config API — NOTES.md)')
    args = parser.parse_args(argv)
    if args.platform:
        jax.config.update('jax_platforms', args.platform)
    if args.debug_nans:
        from .profiling import enable_nan_checks
        enable_nan_checks()
    if args.profile is not None:
        from .profiling import trace
        with trace(args.profile):
            train(args.config, args.model, synthetic=args.synthetic,
                  resume=args.resume)
    else:
        train(args.config, args.model, synthetic=args.synthetic, resume=args.resume)


if __name__ == '__main__':
    main()
