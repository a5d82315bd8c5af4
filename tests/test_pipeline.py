"""Pipeline parallelism (parallel/pipeline.py): GPipe over a 'pipe' mesh axis.

Parity bar: the pp shard_map path must reproduce the solo (single-device)
loss, gradients, and optimizer updates — pipelining is a placement, not a
model change.  No reference counterpart (the reference is single-GPU);
anchors: GPipe (Huang et al. 2019) schedule, stacked-scan layout from
ops/transformer.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from valle2_tpu.config import ConfigValle
from valle2_tpu.models import ar, nar
from valle2_tpu.ops.transformer import transformer, transformer_init
from valle2_tpu.parallel.pipeline import (make_pp_eval_step, make_pp_mesh,
                                          make_pp_train_step,
                                          pipeline_transformer,
                                          pp_shard_params, _pipe_grad_reduce,
                                          pp_param_specs)
from valle2_tpu.train import TrainState, Trainer, init_state, make_train_step

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason='needs 8 virtual devices')


def _cfg(**kw):
    base = {'num_layers': 4, 'd_model': 32, 'n_heads': 4,
            'dim_feedforward': 64, 'num_audio_tokens': 50, 'vocab_size': 40,
            'batch_size': 8, 'flash_attention': False, 'dropout': 0.0,
            'mesh_pipe': 4, 'pp_microbatches': 2}
    base.update(kw)
    return ConfigValle.from_dict(base)


def _ar_batch(b=8, tt=10, tc=16, uniform=False):
    kt, kc, kl = jax.random.split(jax.random.key(3), 3)
    tlens = jnp.full((b,), tt) if uniform else \
        jnp.array([10, 8, 9, 10, 7, 10, 6, 10])[:b]
    clens = jnp.full((b,), tc) if uniform else \
        jnp.array([16, 12, 14, 16, 10, 16, 9, 13])[:b]
    return {'tokens': jax.random.randint(kt, (b, tt), 0, 40),
            'codes': jax.random.randint(kc, (b, tc), 0, 50),
            'target': jax.random.randint(kl, (b, tc), 0, 50),
            'tokens_lens': tlens, 'codes_lens': clens}


def _nar_batch(b=8, tt=10, tc=16, nq=8):
    kt, kc, kl = jax.random.split(jax.random.key(5), 3)
    return {'tokens': jax.random.randint(kt, (b, tt), 0, 40),
            'codes': jax.random.randint(kc, (b, tc, nq), 0, 50),
            'tokens_lens': jnp.full((b,), tt),
            'codes_lens': jnp.full((b,), tc)}


class TestPipelineTransformer:
    @pytest.mark.parametrize('microbatches', [1, 2, 4])
    def test_forward_matches_solo(self, microbatches):
        L, d, h, dff, b, s = 4, 32, 4, 64, 8, 12
        p = transformer_init(jax.random.key(0), L, d, h, dff,
                             adaptive_norm=False)
        x = jax.random.normal(jax.random.key(1), (b, s, d))
        bias = jax.random.normal(jax.random.key(2), (b, 1, s, s)) * 0.1
        ref = transformer(p, x, h, bias)

        mesh = make_pp_mesh(2, 4)
        spec = jax.tree.map(lambda a: P('pipe', *([None] * (a.ndim - 1))), p)

        def fn(p_loc, x_loc, b_loc):
            return pipeline_transformer(p_loc, x_loc, h, b_loc, None,
                                        axis='pipe', num_stages=4,
                                        microbatches=microbatches)
        out = jax.jit(jax.shard_map(
            fn, mesh=mesh, in_specs=(spec, P('data'), P('data')),
            out_specs=P('data'), check_vma=False))(p, x, bias)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)

    def test_remat_matches(self):
        L, d, h, dff, b, s = 4, 32, 4, 64, 4, 8
        p = transformer_init(jax.random.key(0), L, d, h, dff,
                             adaptive_norm=False)
        x = jax.random.normal(jax.random.key(1), (b, s, d))
        mesh = make_pp_mesh(1, 4)
        spec = jax.tree.map(lambda a: P('pipe', *([None] * (a.ndim - 1))), p)

        def loss(p_loc, x_loc, remat):
            y = pipeline_transformer(p_loc, x_loc, h, None, None,
                                     axis='pipe', num_stages=4,
                                     microbatches=2, remat=remat)
            return jnp.sum(y ** 2)

        outs = []
        for remat in (False, True):
            g = jax.jit(jax.shard_map(
                lambda pl, xl, r=remat: jax.grad(lambda q: loss(q, xl, r))(pl),
                mesh=mesh, in_specs=(spec, P('data')), out_specs=spec,
                check_vma=False))(p, x)
            outs.append(g)
        diff = max(jax.tree.leaves(jax.tree.map(
            lambda a, b_: float(jnp.max(jnp.abs(a - b_))), *outs)))
        assert diff < 1e-4  # sum-of-squares loss amplifies f32 reassociation


class TestGradParity:
    """Gradients through the pp path == solo autodiff, leaf by leaf."""

    def test_ar_grads_exact(self):
        cfg = _cfg()
        params = ar.init_params(jax.random.key(0), cfg)
        batch = _ar_batch()
        (_, m0), g0 = jax.value_and_grad(
            lambda p: ar.loss_fn(p, cfg, batch, None), has_aux=True)(params)

        mesh = make_pp_mesh(2, 4)
        pp = ('pipe', 4, 2)

        def dev(p, bt):
            (_, m), g = jax.value_and_grad(
                lambda q: ar.loss_fn(q, cfg, bt, None, pp=pp),
                has_aux=True)(p)
            g = _pipe_grad_reduce(g)
            n = m['n_valid'].astype(jnp.float32)
            return jax.tree.map(
                lambda v: jax.lax.psum(v * n, 'data')
                / jnp.maximum(jax.lax.psum(n, 'data'), 1.0), g)

        specs = pp_param_specs(params)
        bspec = jax.tree.map(
            lambda x: P('data', *([None] * (jnp.ndim(x) - 1))), batch)
        g1 = jax.jit(jax.shard_map(dev, mesh=mesh, in_specs=(specs, bspec),
                                   out_specs=specs, check_vma=False))(
            params, batch)
        diff = max(jax.tree.leaves(jax.tree.map(
            lambda a, b_: float(jnp.max(jnp.abs(a - b_))), g0, g1)))
        assert diff < 1e-6, diff

    def test_nar_grads_exact_pipe_only(self):
        # data=1: the NAR objective's prefix_len derives from the (local)
        # batch max, so exactness vs solo needs a single data shard (or
        # uniform lengths — the DP test below).
        cfg = _cfg(num_quantizers=8)
        params = nar.init_params(jax.random.key(0), cfg)
        batch = _nar_batch(b=4)
        rng = jax.random.key(11)
        (_, m0), g0 = jax.value_and_grad(
            lambda p: nar.loss_fn(p, cfg, batch, rng), has_aux=True)(params)

        mesh = make_pp_mesh(1, 4)
        pp = ('pipe', 4, 2)

        def dev(p, bt):
            (_, m), g = jax.value_and_grad(
                lambda q: nar.loss_fn(q, cfg, bt, rng, pp=pp),
                has_aux=True)(p)
            return _pipe_grad_reduce(g)

        specs = pp_param_specs(params)
        bspec = jax.tree.map(
            lambda x: P('data', *([None] * (jnp.ndim(x) - 1))), batch)
        g1 = jax.jit(jax.shard_map(dev, mesh=mesh, in_specs=(specs, bspec),
                                   out_specs=specs, check_vma=False))(
            params, batch)
        diff = max(jax.tree.leaves(jax.tree.map(
            lambda a, b_: float(jnp.max(jnp.abs(a - b_))), g0, g1)))
        assert diff < 1e-6, diff


class TestPPTrainStep:
    def test_ar_step_matches_solo(self):
        cfg = _cfg()
        batch = _ar_batch()
        state = init_state(cfg, 'ValleAR', jax.random.key(0))
        solo_state, sm = make_train_step(cfg, 'ValleAR', mesh=None)(
            state, batch, jax.random.key(7))

        mesh = make_pp_mesh(2, 4)
        state2 = init_state(cfg, 'ValleAR', jax.random.key(0))
        state2 = TrainState(pp_shard_params(mesh, state2.params),
                            pp_shard_params(mesh, state2.opt_state),
                            state2.step)
        pp_state, pm = make_pp_train_step(cfg, 'ValleAR', mesh)(
            state2, batch, jax.random.key(7))
        np.testing.assert_allclose(float(sm['loss']), float(pm['loss']),
                                   rtol=1e-6)
        np.testing.assert_allclose(float(sm['grad_norm']),
                                   float(pm['grad_norm']), rtol=1e-4)
        diff = max(jax.tree.leaves(jax.tree.map(
            lambda a, b_: float(jnp.max(jnp.abs(a - b_))),
            solo_state.params, jax.device_get(pp_state.params))))
        assert diff < 1e-5, diff

    def test_nar_step_matches_solo_uniform_lens(self):
        # Uniform lengths: per-data-shard batch max == global max, so the
        # NAR prefix draw matches solo and the comparison is exact.
        cfg = _cfg(num_quantizers=8)
        batch = _nar_batch(b=8)
        state = init_state(cfg, 'ValleNAR', jax.random.key(0))
        solo_state, sm = make_train_step(cfg, 'ValleNAR', mesh=None)(
            state, batch, jax.random.key(9))

        mesh = make_pp_mesh(2, 4)
        state2 = init_state(cfg, 'ValleNAR', jax.random.key(0))
        state2 = TrainState(pp_shard_params(mesh, state2.params),
                            pp_shard_params(mesh, state2.opt_state),
                            state2.step)
        pp_state, pm = make_pp_train_step(cfg, 'ValleNAR', mesh)(
            state2, batch, jax.random.key(9))
        np.testing.assert_allclose(float(sm['loss']), float(pm['loss']),
                                   rtol=1e-6)
        assert int(sm['stage']) == int(pm['stage'])
        diff = max(jax.tree.leaves(jax.tree.map(
            lambda a, b_: float(jnp.max(jnp.abs(a - b_))),
            solo_state.params, jax.device_get(pp_state.params))))
        assert diff < 1e-5, diff

    def test_ar_reference_parity_mode_matches_solo(self):
        # r4 review fix: mask_loss_pads=False (the reference-parity loss)
        # must mask to the GLOBAL batch max under manual DP — AR loss_fn now
        # takes data_axis like the NAR's.
        cfg = _cfg(mask_loss_pads=False)
        batch = _ar_batch()                    # ragged codes_lens across shards
        state = init_state(cfg, 'ValleAR', jax.random.key(0))
        _, sm = make_train_step(cfg, 'ValleAR', mesh=None)(
            state, batch, jax.random.key(9))
        mesh = make_pp_mesh(2, 4)
        state2 = init_state(cfg, 'ValleAR', jax.random.key(0))
        state2 = TrainState(pp_shard_params(mesh, state2.params),
                            pp_shard_params(mesh, state2.opt_state),
                            state2.step)
        _, pm = make_pp_train_step(cfg, 'ValleAR', mesh)(
            state2, batch, jax.random.key(9))
        np.testing.assert_allclose(float(sm['loss']), float(pm['loss']),
                                   rtol=1e-6)
        np.testing.assert_allclose(float(sm['n_valid']), float(pm['n_valid']))

    def test_parity_mode_counts_every_row(self):
        # r4 bugfix: the (1, T) valid mask in mask_loss_pads=False counted ONE
        # row in n_valid, inflating the mean loss/grads by the batch size.
        cfg = _cfg(mask_loss_pads=False)
        batch = _ar_batch()
        params = ar.init_params(jax.random.key(0), cfg)
        _, m = ar.loss_fn(params, cfg, batch, None)
        assert float(m['n_valid']) == 8 * 16          # all rows x batch max
        nb = _nar_batch(b=8)
        nparams = nar.init_params(jax.random.key(0), _cfg(num_quantizers=8))
        _, nm = nar.loss_fn(nparams, _cfg(num_quantizers=8,
                                          mask_loss_pads=False),
                            nb, jax.random.key(1))
        assert float(nm['n_valid']) > 8               # (b, T), not (1, T)

    def test_microbatch_clamp_is_largest_divisor(self):
        from valle2_tpu.parallel.pipeline import _gcd
        assert _gcd(6, 4) == 3        # gcd alone would give 2 (bigger bubble)
        assert _gcd(8, 4) == 4
        assert _gcd(7, 4) == 1
        assert _gcd(2, 4) == 2        # clamped to the batch

    def test_nar_step_matches_solo_nonuniform_lens(self):
        # r4 (ADVICE): the prefix length pmaxes over 'data' inside the
        # shard_map, so shards whose local batch max differs from the global
        # max now train the exact solo objective.
        cfg = _cfg(num_quantizers=8)
        batch = _nar_batch(b=8)
        batch['codes_lens'] = jnp.array([16, 12, 14, 16, 10, 9, 11, 13])
        state = init_state(cfg, 'ValleNAR', jax.random.key(0))
        _, sm = make_train_step(cfg, 'ValleNAR', mesh=None)(
            state, batch, jax.random.key(9))

        mesh = make_pp_mesh(2, 4)
        state2 = init_state(cfg, 'ValleNAR', jax.random.key(0))
        state2 = TrainState(pp_shard_params(mesh, state2.params),
                            pp_shard_params(mesh, state2.opt_state),
                            state2.step)
        _, pm = make_pp_train_step(cfg, 'ValleNAR', mesh)(
            state2, batch, jax.random.key(9))
        np.testing.assert_allclose(float(sm['loss']), float(pm['loss']),
                                   rtol=1e-6)

    def test_multi_step_training_descends(self):
        cfg = _cfg()
        mesh = make_pp_mesh(2, 4)
        state = init_state(cfg, 'ValleAR', jax.random.key(0))
        state = TrainState(pp_shard_params(mesh, state.params),
                           pp_shard_params(mesh, state.opt_state), state.step)
        step = make_pp_train_step(cfg, 'ValleAR', mesh)
        batch = _ar_batch()
        losses = []
        for _ in range(8):
            state, m = step(state, batch, jax.random.key(7))
            losses.append(float(m['loss']))
        assert losses[-1] < losses[0]

    def test_eval_step_matches_train_loss(self):
        cfg = _cfg()
        batch = _ar_batch()
        params = ar.init_params(jax.random.key(0), cfg)
        loss0, _ = ar.loss_fn(params, cfg, batch, None)
        mesh = make_pp_mesh(2, 4)
        ev = make_pp_eval_step(cfg, 'ValleAR', mesh)
        metrics = ev(pp_shard_params(mesh, params), batch, jax.random.key(0))
        np.testing.assert_allclose(float(loss0), float(metrics['loss']),
                                   rtol=1e-6)

    @pytest.mark.parametrize('b', [2, 6])
    def test_eval_step_indivisible_batch(self, b):
        # ADVICE r3 (medium): eval batches (valid_batch_size, drop_last=False
        # partials) need not divide pp_microbatches — the microbatch count
        # gcd-clamps per trace instead of tripping the b % m assert.
        cfg = _cfg(pp_microbatches=4)
        batch = _ar_batch(b=b)
        params = ar.init_params(jax.random.key(0), cfg)
        loss0, _ = ar.loss_fn(params, cfg, batch, None)
        mesh = make_pp_mesh(2, 4)
        ev = make_pp_eval_step(cfg, 'ValleAR', mesh)
        metrics = ev(pp_shard_params(mesh, params), batch, jax.random.key(0))
        np.testing.assert_allclose(float(loss0), float(metrics['loss']),
                                   rtol=1e-6)


class TestPPxTP:
    """DP x PP x TP: Megatron TP within each pipeline stage (r4, lifting the
    r3 'mesh_pipe composes with mesh_data only' restriction)."""

    def test_ar_step_matches_solo(self):
        cfg = _cfg()
        batch = _ar_batch()
        state = init_state(cfg, 'ValleAR', jax.random.key(0))
        solo_state, sm = make_train_step(cfg, 'ValleAR', mesh=None)(
            state, batch, jax.random.key(9))

        mesh = make_pp_mesh(2, 2, 2)            # data x pipe x model
        state2 = init_state(cfg, 'ValleAR', jax.random.key(0))
        state2 = TrainState(pp_shard_params(mesh, state2.params),
                            pp_shard_params(mesh, state2.opt_state),
                            state2.step)
        pp_state, pm = make_pp_train_step(cfg, 'ValleAR', mesh)(
            state2, batch, jax.random.key(9))
        np.testing.assert_allclose(float(sm['loss']), float(pm['loss']),
                                   rtol=1e-6)
        np.testing.assert_allclose(float(sm['grad_norm']),
                                   float(pm['grad_norm']), rtol=1e-4)
        diff = max(jax.tree.leaves(jax.tree.map(
            lambda a, b_: float(jnp.max(jnp.abs(a - b_))),
            solo_state.params, jax.device_get(pp_state.params))))
        assert diff < 1e-5, diff

    def test_nar_step_matches_solo(self):
        cfg = _cfg(num_quantizers=8)
        batch = _nar_batch(b=8)
        state = init_state(cfg, 'ValleNAR', jax.random.key(0))
        _, sm = make_train_step(cfg, 'ValleNAR', mesh=None)(
            state, batch, jax.random.key(9))
        mesh = make_pp_mesh(2, 2, 2)
        state2 = init_state(cfg, 'ValleNAR', jax.random.key(0))
        state2 = TrainState(pp_shard_params(mesh, state2.params),
                            pp_shard_params(mesh, state2.opt_state),
                            state2.step)
        _, pm = make_pp_train_step(cfg, 'ValleNAR', mesh)(
            state2, batch, jax.random.key(9))
        np.testing.assert_allclose(float(sm['loss']), float(pm['loss']),
                                   rtol=1e-6)
        assert int(sm['stage']) == int(pm['stage'])

    def test_eval_matches_solo_loss(self):
        cfg = _cfg()
        batch = _ar_batch()
        params = ar.init_params(jax.random.key(0), cfg)
        loss0, _ = ar.loss_fn(params, cfg, batch, None)
        mesh = make_pp_mesh(2, 2, 2)
        ev = make_pp_eval_step(cfg, 'ValleAR', mesh)
        metrics = ev(pp_shard_params(mesh, params), batch, jax.random.key(0))
        np.testing.assert_allclose(float(loss0), float(metrics['loss']),
                                   rtol=1e-6)

    def test_multi_step_descends_dp_pp_tp(self):
        # Many steps: the collective-ordering (deadlock) regression drive —
        # a single passing step proves nothing for a race (NOTES.md).
        cfg = _cfg()
        mesh = make_pp_mesh(2, 2, 2)
        state = init_state(cfg, 'ValleAR', jax.random.key(0))
        state = TrainState(pp_shard_params(mesh, state.params),
                           pp_shard_params(mesh, state.opt_state), state.step)
        step = make_pp_train_step(cfg, 'ValleAR', mesh)
        batch = _ar_batch()
        losses = []
        for _ in range(10):
            state, m = step(state, batch, jax.random.key(7))
            losses.append(float(m['loss']))
        assert losses[-1] < losses[0]


class TestPPxLoRA:
    def test_lora_step_matches_solo(self):
        cfg = _cfg(lora_rank=4, lora_alpha=8.0)
        batch = _ar_batch()
        state = init_state(cfg, 'ValleAR', jax.random.key(0))
        solo_state, sm = make_train_step(cfg, 'ValleAR', mesh=None)(
            state, batch, jax.random.key(9))

        mesh = make_pp_mesh(2, 4)
        state2 = init_state(cfg, 'ValleAR', jax.random.key(0))
        state2 = TrainState(pp_shard_params(mesh, state2.params),
                            pp_shard_params(mesh, state2.opt_state),
                            state2.step)
        pp_state, pm = make_pp_train_step(cfg, 'ValleAR', mesh)(
            state2, batch, jax.random.key(9))
        np.testing.assert_allclose(float(sm['loss']), float(pm['loss']),
                                   rtol=1e-6)
        # Base must stay bit-identical; adapters must match solo's update.
        base_diff = max(jax.tree.leaves(jax.tree.map(
            lambda a, b_: float(jnp.max(jnp.abs(a - b_))),
            solo_state.params['base'],
            jax.device_get(pp_state.params['base']))))
        assert base_diff == 0.0
        lora_diff = max(jax.tree.leaves(jax.tree.map(
            lambda a, b_: float(jnp.max(jnp.abs(a - b_))),
            solo_state.params['lora'],
            jax.device_get(pp_state.params['lora']))))
        assert lora_diff < 1e-6, lora_diff

    def test_lora_with_tp_descends(self):
        cfg = _cfg(lora_rank=4)
        mesh = make_pp_mesh(2, 2, 2)
        state = init_state(cfg, 'ValleAR', jax.random.key(0))
        state = TrainState(pp_shard_params(mesh, state.params),
                           pp_shard_params(mesh, state.opt_state), state.step)
        step = make_pp_train_step(cfg, 'ValleAR', mesh)
        batch = _ar_batch()
        losses = []
        for _ in range(6):
            state, m = step(state, batch, jax.random.key(7))
            losses.append(float(m['loss']))
        assert losses[-1] < losses[0]
        ev = make_pp_eval_step(cfg, 'ValleAR', mesh)
        metrics = ev(state.params, batch, jax.random.key(0))
        assert np.isfinite(float(metrics['loss']))


class Test1F1B:
    """pp_schedule='1f1b': hand-scheduled one-forward-one-backward pipeline
    (parallel/pipeline_1f1b.py) — same gradients as GPipe/solo, O(P)
    activation liveness."""

    @pytest.mark.parametrize('microbatches', [1, 2, 4])
    def test_ar_step_matches_solo(self, microbatches):
        from valle2_tpu.parallel.pipeline_1f1b import make_pp_train_step_1f1b
        cfg = _cfg(pp_microbatches=microbatches)
        batch = _ar_batch()
        state = init_state(cfg, 'ValleAR', jax.random.key(0))
        solo_state, sm = make_train_step(cfg, 'ValleAR', mesh=None)(
            state, batch, jax.random.key(9))

        mesh = make_pp_mesh(2, 4)
        state2 = init_state(cfg, 'ValleAR', jax.random.key(0))
        state2 = TrainState(pp_shard_params(mesh, state2.params),
                            pp_shard_params(mesh, state2.opt_state),
                            state2.step)
        pp_state, pm = make_pp_train_step_1f1b(cfg, 'ValleAR', mesh)(
            state2, batch, jax.random.key(9))
        np.testing.assert_allclose(float(sm['loss']), float(pm['loss']),
                                   rtol=1e-6)
        np.testing.assert_allclose(float(sm['acc']), float(pm['acc']),
                                   rtol=1e-6)
        np.testing.assert_allclose(float(sm['grad_norm']),
                                   float(pm['grad_norm']), rtol=1e-4)
        diff = max(jax.tree.leaves(jax.tree.map(
            lambda a, b_: float(jnp.max(jnp.abs(a - b_))),
            solo_state.params, jax.device_get(pp_state.params))))
        assert diff < 1e-5, diff

    def test_nar_step_matches_solo(self):
        from valle2_tpu.parallel.pipeline_1f1b import make_pp_train_step_1f1b
        cfg = _cfg(num_quantizers=8, pp_microbatches=2)
        batch = _nar_batch(b=8)
        batch['codes_lens'] = jnp.array([16, 12, 14, 16, 10, 9, 11, 13])
        state = init_state(cfg, 'ValleNAR', jax.random.key(0))
        _, sm = make_train_step(cfg, 'ValleNAR', mesh=None)(
            state, batch, jax.random.key(9))
        mesh = make_pp_mesh(2, 4)
        state2 = init_state(cfg, 'ValleNAR', jax.random.key(0))
        state2 = TrainState(pp_shard_params(mesh, state2.params),
                            pp_shard_params(mesh, state2.opt_state),
                            state2.step)
        _, pm = make_pp_train_step_1f1b(cfg, 'ValleNAR', mesh)(
            state2, batch, jax.random.key(9))
        np.testing.assert_allclose(float(sm['loss']), float(pm['loss']),
                                   rtol=1e-6)
        assert int(sm['stage']) == int(pm['stage'])

    def test_1f1b_with_tp_matches_solo(self):
        from valle2_tpu.parallel.pipeline_1f1b import make_pp_train_step_1f1b
        cfg = _cfg(pp_microbatches=2)
        batch = _ar_batch()
        state = init_state(cfg, 'ValleAR', jax.random.key(0))
        solo_state, sm = make_train_step(cfg, 'ValleAR', mesh=None)(
            state, batch, jax.random.key(9))
        mesh = make_pp_mesh(2, 2, 2)
        state2 = init_state(cfg, 'ValleAR', jax.random.key(0))
        state2 = TrainState(pp_shard_params(mesh, state2.params),
                            pp_shard_params(mesh, state2.opt_state),
                            state2.step)
        pp_state, pm = make_pp_train_step_1f1b(cfg, 'ValleAR', mesh)(
            state2, batch, jax.random.key(9))
        np.testing.assert_allclose(float(sm['loss']), float(pm['loss']),
                                   rtol=1e-6)
        diff = max(jax.tree.leaves(jax.tree.map(
            lambda a, b_: float(jnp.max(jnp.abs(a - b_))),
            solo_state.params, jax.device_get(pp_state.params))))
        assert diff < 1e-5, diff

    def test_multi_step_descends(self):
        # Collective-ordering drive: interleaved fwd/bwd ppermutes + psums
        # over many steps (a single pass proves nothing for a race).
        from valle2_tpu.parallel.pipeline_1f1b import make_pp_train_step_1f1b
        cfg = _cfg(pp_microbatches=4)
        mesh = make_pp_mesh(2, 4)
        state = init_state(cfg, 'ValleAR', jax.random.key(0))
        state = TrainState(pp_shard_params(mesh, state.params),
                           pp_shard_params(mesh, state.opt_state), state.step)
        step = make_pp_train_step_1f1b(cfg, 'ValleAR', mesh)
        batch = _ar_batch()
        losses = []
        for _ in range(10):
            state, m = step(state, batch, jax.random.key(7))
            losses.append(float(m['loss']))
        assert losses[-1] < losses[0]

    def test_1f1b_lora_matches_solo(self):
        from valle2_tpu.parallel.pipeline_1f1b import make_pp_train_step_1f1b
        cfg = _cfg(lora_rank=4, lora_alpha=8.0, pp_microbatches=2)
        batch = _ar_batch()
        state = init_state(cfg, 'ValleAR', jax.random.key(0))
        solo_state, sm = make_train_step(cfg, 'ValleAR', mesh=None)(
            state, batch, jax.random.key(9))
        mesh = make_pp_mesh(2, 4)
        state2 = init_state(cfg, 'ValleAR', jax.random.key(0))
        state2 = TrainState(pp_shard_params(mesh, state2.params),
                            pp_shard_params(mesh, state2.opt_state),
                            state2.step)
        pp_state, pm = make_pp_train_step_1f1b(cfg, 'ValleAR', mesh)(
            state2, batch, jax.random.key(9))
        np.testing.assert_allclose(float(sm['loss']), float(pm['loss']),
                                   rtol=1e-6)
        base_diff = max(jax.tree.leaves(jax.tree.map(
            lambda a, b_: float(jnp.max(jnp.abs(a - b_))),
            solo_state.params['base'],
            jax.device_get(pp_state.params['base']))))
        assert base_diff == 0.0
        lora_diff = max(jax.tree.leaves(jax.tree.map(
            lambda a, b_: float(jnp.max(jnp.abs(a - b_))),
            solo_state.params['lora'],
            jax.device_get(pp_state.params['lora']))))
        assert lora_diff < 1e-6, lora_diff

    def test_trainer_selects_1f1b(self):
        mesh = make_pp_mesh(2, 4)
        tr = Trainer(_cfg(pp_schedule='1f1b'), 'ValleAR', mesh=mesh,
                     use_tensorboard=False)
        state = init_state(tr.config, 'ValleAR', jax.random.key(0))
        state = TrainState(pp_shard_params(mesh, state.params),
                           pp_shard_params(mesh, state.opt_state), state.step)
        _, m = tr.train_step(state, _ar_batch(), jax.random.key(1))
        assert np.isfinite(float(m['loss']))


class TestPPCompositions:
    def test_grad_accum_matches_solo(self):
        # grad_accum=2: MultiSteps accumulates inside the pp step exactly as
        # in the solo step — 4 micro-batches (2 optimizer updates) match.
        cfg = _cfg(grad_accum=2)
        batches = [_ar_batch(), _ar_batch(tt=10, tc=16)]
        solo = init_state(cfg, 'ValleAR', jax.random.key(0))
        solo_step = make_train_step(cfg, 'ValleAR', mesh=None)
        mesh = make_pp_mesh(2, 4)
        pp_state = init_state(cfg, 'ValleAR', jax.random.key(0))
        pp_state = TrainState(pp_shard_params(mesh, pp_state.params),
                              pp_shard_params(mesh, pp_state.opt_state),
                              pp_state.step)
        pp_step = make_pp_train_step(cfg, 'ValleAR', mesh)
        rng = jax.random.key(7)
        for i in range(4):
            solo, _ = solo_step(solo, batches[i % 2], rng)
            pp_state, _ = pp_step(pp_state, batches[i % 2], rng)
        diff = max(jax.tree.leaves(jax.tree.map(
            lambda a, b_: float(jnp.max(jnp.abs(a - b_))),
            solo.params, jax.device_get(pp_state.params))))
        assert diff < 1e-5, diff

    def test_zero1_is_placement_only(self):
        # ZeRO-1 under the pipe mesh: the optimizer moments shard over 'data'
        # but the training math is unchanged — params match the non-zero1 pp
        # arm bit-for-bit-ish after 3 steps, and the moment leaves really are
        # 'data'-sharded.
        mesh = make_pp_mesh(2, 4)
        batch = _ar_batch()
        states = {}
        for z in (False, True):
            cfg = _cfg(zero1=z)
            st = init_state(cfg, 'ValleAR', jax.random.key(0))
            st = TrainState(pp_shard_params(mesh, st.params),
                            pp_shard_params(mesh, st.opt_state, zero1=z),
                            st.step)
            step = make_pp_train_step(cfg, 'ValleAR', mesh)
            for _ in range(3):
                st, _ = step(st, batch, jax.random.key(7))
            states[z] = st
        diff = max(jax.tree.leaves(jax.tree.map(
            lambda a, b_: float(jnp.max(jnp.abs(np.asarray(a)
                                                - np.asarray(b_)))),
            jax.device_get(states[False].params),
            jax.device_get(states[True].params))))
        assert diff < 2e-5, diff
        mu_leaves = [l for l in jax.tree.leaves(states[True].opt_state)
                     if hasattr(l, 'sharding') and l.ndim >= 2]
        assert any('data' in str(l.sharding.spec) for l in mu_leaves)

    def test_checkpoint_roundtrip_pp_to_solo_and_back(self, tmp_path):
        # A checkpoint written under the pp mesh restores on no mesh (and
        # back onto the pp mesh) — mesh-agnostic restore extends to 'pipe'.
        cfg = _cfg(ckpt_path=str(tmp_path / 'ckpt'),
                   log_path=str(tmp_path / 'logs'), async_checkpoint=False)
        mesh = make_pp_mesh(2, 4)
        tr_pp = Trainer(cfg, 'ValleAR', mesh=mesh, use_tensorboard=False)
        state = init_state(cfg, 'ValleAR', jax.random.key(0))
        state = TrainState(pp_shard_params(mesh, state.params),
                           pp_shard_params(mesh, state.opt_state), state.step)
        state, _ = tr_pp.train_step(state, _ar_batch(), jax.random.key(1))
        tr_pp.save_checkpoint(state)
        path = tr_pp.latest_checkpoint()
        assert path is not None

        tr_solo = Trainer(cfg, 'ValleAR', mesh=None, use_tensorboard=False)
        solo_restored = tr_solo.restore_checkpoint(
            init_state(cfg, 'ValleAR', jax.random.key(9)), path)
        diff = max(jax.tree.leaves(jax.tree.map(
            lambda a, b_: float(jnp.max(jnp.abs(np.asarray(a)
                                                - np.asarray(b_)))),
            jax.device_get(state.params), solo_restored.params)))
        assert diff == 0.0
        # and back onto the pipe mesh: placement matches pp specs
        pp_restored = tr_pp.restore_checkpoint(
            init_state(cfg, 'ValleAR', jax.random.key(9)), path)
        leaf = jax.tree.leaves(pp_restored.params['transformer'])[0]
        assert 'pipe' in str(leaf.sharding.spec)
        state2, m2 = tr_pp.train_step(pp_restored, _ar_batch(),
                                      jax.random.key(2))
        assert np.isfinite(float(m2['loss']))


class TestTrainerWiring:
    def test_trainer_rejects_bad_compositions(self):
        mesh = make_pp_mesh(2, 4)
        with pytest.raises(ValueError, match='num_layers'):
            Trainer(_cfg(num_layers=6), 'ValleAR', mesh=mesh,
                    use_tensorboard=False)
        # TP within stages requires head/ffn divisibility by mesh_model.
        with pytest.raises(ValueError, match='mesh_model'):
            Trainer(_cfg(n_heads=3, d_model=48), 'ValleAR',
                    mesh=make_pp_mesh(1, 2, 2), use_tensorboard=False)

    def test_trainer_uses_pp_step(self):
        mesh = make_pp_mesh(2, 4)
        tr = Trainer(_cfg(), 'ValleAR', mesh=mesh, use_tensorboard=False)
        assert tr._pp
        state = init_state(tr.config, 'ValleAR', jax.random.key(0))
        state = TrainState(pp_shard_params(mesh, state.params),
                           pp_shard_params(mesh, state.opt_state), state.step)
        state2, m = tr.train_step(state, _ar_batch(), jax.random.key(1))
        assert np.isfinite(float(m['loss']))
        # the layer stack really is sharded over 'pipe'
        leaf = jax.tree.leaves(state2.params['transformer'])[0]
        assert 'pipe' in str(leaf.sharding.spec)
