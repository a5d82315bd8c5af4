"""Ring attention + context parallelism (parallel/ring.py, parallel/context.py).

Parity bar: sharding the SEQUENCE over chips is a placement, not a model
change — the ring op must equal sdpa under the same prefix-LM mask, and the
DP x CP train step must equal the solo step on loss/grads/updated params.
Anchor: Liu et al. 2023 (Ring Attention with Blockwise Transformers); mask
semantics from ops/masks.py + the flash kernel's meta convention.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from valle2_tpu.config import ConfigValle
from valle2_tpu.models import ar
from valle2_tpu.ops.attention import sdpa
from valle2_tpu.ops.masks import NEG_INF
from valle2_tpu.parallel.context import make_cp_mesh, make_cp_train_step
from valle2_tpu.parallel.ring import ring_attention
from valle2_tpu.train import TrainState, init_state, make_train_step

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason='needs 8 virtual devices')


def _ref_bias(meta, tokens_total, s, causal):
    tv = meta[:, 0][:, None, None]
    ke = meta[:, 1][:, None, None]
    qp = jnp.arange(s)[None, :, None]
    kp = jnp.arange(s)[None, None, :]
    if causal:
        attend = (kp < tv) | ((kp >= tokens_total) & (kp <= qp))
    else:
        attend = (kp < tv) | (kp >= tokens_total)
    attend = attend & (kp < ke)
    return jnp.where(attend, 0.0, NEG_INF)[:, None]


def _ring_out(q, k, v, meta, tokens_total, n_ctx, causal):
    mesh = make_cp_mesh(1, n_ctx)
    fn = lambda q_, k_, v_, m_: ring_attention(
        q_, k_, v_, m_, tokens_total, 'ctx', causal=causal)
    return jax.jit(jax.shard_map(
        fn, mesh=mesh,
        in_specs=(P(None, None, 'ctx'), P(None, None, 'ctx'),
                  P(None, None, 'ctx'), P()),
        out_specs=P(None, None, 'ctx'), check_vma=False))(q, k, v, meta)


class TestRingOp:
    @pytest.mark.parametrize('causal', [True, False])
    @pytest.mark.parametrize('n_ctx', [2, 4, 8])
    def test_matches_sdpa(self, causal, n_ctx):
        b, h, s, hd = 3, 2, 32, 8
        ks = jax.random.split(jax.random.key(0), 3)
        q = jax.random.normal(ks[0], (b, h, s, hd))
        k = jax.random.normal(ks[1], (b, h, s, hd))
        v = jax.random.normal(ks[2], (b, h, s, hd))
        tokens_total = 10
        meta = jnp.asarray([[10, 32], [7, 25], [10, 18]], jnp.int32)
        ref = sdpa(q, k, v, _ref_bias(meta, tokens_total, s, causal))
        out = _ring_out(q, k, v, meta, tokens_total, n_ctx, causal)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)

    def test_grads_match_sdpa(self):
        b, h, s, hd = 2, 2, 16, 8
        ks = jax.random.split(jax.random.key(1), 3)
        q = jax.random.normal(ks[0], (b, h, s, hd))
        k = jax.random.normal(ks[1], (b, h, s, hd))
        v = jax.random.normal(ks[2], (b, h, s, hd))
        meta = jnp.asarray([[5, 16], [4, 12]], jnp.int32)
        tokens_total = 5

        ref_g = jax.grad(lambda args: jnp.sum(
            sdpa(*args, _ref_bias(meta, tokens_total, s, True)) ** 2))(
            (q, k, v))

        mesh = make_cp_mesh(1, 4)

        def loss(args):
            q_, k_, v_ = args
            fn = lambda a, b_, c: ring_attention(a, b_, c, meta, tokens_total,
                                                 'ctx', causal=True)
            out = jax.shard_map(
                fn, mesh=mesh,
                in_specs=(P(None, None, 'ctx'),) * 3,
                out_specs=P(None, None, 'ctx'), check_vma=False)(q_, k_, v_)
            return jnp.sum(out ** 2)
        got_g = jax.jit(jax.grad(loss))((q, k, v))
        for a, b_ in zip(ref_g, got_g):
            np.testing.assert_allclose(np.asarray(b_), np.asarray(a),
                                       atol=5e-5, rtol=5e-5)

    def test_fully_masked_rows_match_sdpa_semantics(self):
        # kv_end 0: every key masked — both paths degrade to the uniform
        # average (finite NEG_INF softmax), not NaN.
        b, h, s, hd = 1, 1, 16, 8
        ks = jax.random.split(jax.random.key(2), 3)
        q, k, v = (jax.random.normal(x, (b, h, s, hd)) for x in ks)
        meta = jnp.asarray([[0, 0]], jnp.int32)
        ref = sdpa(q, k, v, _ref_bias(meta, 4, s, True))
        out = _ring_out(q, k, v, meta, 4, 4, True)
        assert np.isfinite(np.asarray(out)).all()
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)


class TestCPTrainStep:
    def _batch(self, b=4, tt=10, tc=22):
        kt, kc, kl = jax.random.split(jax.random.key(3), 3)
        return {'tokens': jax.random.randint(kt, (b, tt), 0, 40),
                'codes': jax.random.randint(kc, (b, tc), 0, 50),
                'target': jax.random.randint(kl, (b, tc), 0, 50),
                'tokens_lens': jnp.array([10, 8, 9, 7]),
                'codes_lens': jnp.array([22, 15, 20, 11])}

    def _cfg(self, **kw):
        base = {'num_layers': 2, 'd_model': 32, 'n_heads': 4,
                'dim_feedforward': 64, 'num_audio_tokens': 50,
                'vocab_size': 40, 'batch_size': 4, 'dropout': 0.0,
                'use_flash_attention': False}
        base.update(kw)
        return ConfigValle.from_dict(base)

    def test_step_matches_solo(self):
        cfg = self._cfg()
        batch = self._batch()            # S = 32, splits 8 ways across ctx=4
        state = init_state(cfg, 'ValleAR', jax.random.key(0))
        solo_state, sm = make_train_step(cfg, 'ValleAR', mesh=None)(
            state, batch, jax.random.key(9))

        mesh = make_cp_mesh(2, 4)
        state2 = init_state(cfg, 'ValleAR', jax.random.key(0))
        cp_state, pm = make_cp_train_step(cfg, 'ValleAR', mesh)(
            state2, batch, jax.random.key(9))
        np.testing.assert_allclose(float(sm['loss']), float(pm['loss']),
                                   rtol=1e-6)
        np.testing.assert_allclose(float(sm['acc']), float(pm['acc']),
                                   rtol=1e-6)
        np.testing.assert_allclose(float(sm['grad_norm']),
                                   float(pm['grad_norm']), rtol=1e-4)
        diff = max(jax.tree.leaves(jax.tree.map(
            lambda a, b_: float(jnp.max(jnp.abs(a - b_))),
            solo_state.params, jax.device_get(cp_state.params))))
        assert diff < 1e-5, diff

    def test_non_divisible_sequence_pads(self):
        cfg = self._cfg()
        batch = self._batch(tt=9, tc=21)     # S = 30: pads to 32 over ctx=4
        batch['tokens_lens'] = jnp.array([9, 8, 9, 7])
        batch['codes_lens'] = jnp.array([21, 15, 20, 11])
        state = init_state(cfg, 'ValleAR', jax.random.key(0))
        _, sm = make_train_step(cfg, 'ValleAR', mesh=None)(
            state, batch, jax.random.key(9))
        mesh = make_cp_mesh(2, 4)
        state2 = init_state(cfg, 'ValleAR', jax.random.key(0))
        _, pm = make_cp_train_step(cfg, 'ValleAR', mesh)(
            state2, batch, jax.random.key(9))
        np.testing.assert_allclose(float(sm['loss']), float(pm['loss']),
                                   rtol=1e-6)

    def test_multi_step_descends(self):
        cfg = self._cfg()
        mesh = make_cp_mesh(2, 4)
        state = init_state(cfg, 'ValleAR', jax.random.key(0))
        step = make_cp_train_step(cfg, 'ValleAR', mesh)
        batch = self._batch()
        losses = []
        for _ in range(8):
            state, m = step(state, batch, jax.random.key(7))
            losses.append(float(m['loss']))
        assert losses[-1] < losses[0]

    def test_trainer_wires_cp(self):
        # config.mesh_ctx drives the CLI path: Trainer selects the CP steps
        # and validation returns finite token-weighted metrics.
        from valle2_tpu.train import Trainer
        cfg = self._cfg(mesh_ctx=4, mesh_data=2)
        mesh = make_cp_mesh(2, 4)
        tr = Trainer(cfg, 'ValleAR', mesh=mesh, use_tensorboard=False)
        assert tr._cp
        state = init_state(cfg, 'ValleAR', jax.random.key(0))
        state2, m = tr.train_step(state, self._batch(), jax.random.key(1))
        assert np.isfinite(float(m['loss']))
        em = tr.eval_step(state2.params, self._batch(), jax.random.key(2))
        assert np.isfinite(float(em['loss'])) and float(em['n_valid']) > 0

    def test_trainer_rejects_ctx_compositions(self):
        from valle2_tpu.train import Trainer
        with pytest.raises(ValueError, match='mesh_ctx'):
            Trainer(self._cfg(lora_rank=4), 'ValleAR',
                    mesh=make_cp_mesh(2, 4), use_tensorboard=False)

    def test_nar_step_matches_solo(self):
        cfg = self._cfg(num_quantizers=8)
        kt, kc = jax.random.split(jax.random.key(5), 2)
        batch = {'tokens': jax.random.randint(kt, (4, 10), 0, 40),
                 'codes': jax.random.randint(kc, (4, 22, 8), 0, 50),
                 'tokens_lens': jnp.array([10, 8, 9, 7]),
                 'codes_lens': jnp.array([22, 15, 20, 11])}
        state = init_state(cfg, 'ValleNAR', jax.random.key(0))
        solo_state, sm = make_train_step(cfg, 'ValleNAR', mesh=None)(
            state, batch, jax.random.key(9))
        mesh = make_cp_mesh(2, 4)
        state2 = init_state(cfg, 'ValleNAR', jax.random.key(0))
        cp_state, pm = make_cp_train_step(cfg, 'ValleNAR', mesh)(
            state2, batch, jax.random.key(9))
        np.testing.assert_allclose(float(sm['loss']), float(pm['loss']),
                                   rtol=1e-6)
        assert int(sm['stage']) == int(pm['stage'])
        diff = max(jax.tree.leaves(jax.tree.map(
            lambda a, b_: float(jnp.max(jnp.abs(a - b_))),
            solo_state.params, jax.device_get(cp_state.params))))
        assert diff < 1e-5, diff


class TestCPxTP:
    """CP x TP (VERDICT r4 Next #7): ring attention with Megatron-split heads
    per ctx shard, on a ('data', 'ctx', 'model') mesh — the standard
    long-context production layout, exact-parity-tested against solo."""

    _cfg = TestCPTrainStep._cfg
    _batch = TestCPTrainStep._batch

    def test_ar_step_matches_solo(self):
        cfg = self._cfg()
        batch = self._batch()
        state = init_state(cfg, 'ValleAR', jax.random.key(0))
        solo_state, sm = make_train_step(cfg, 'ValleAR', mesh=None)(
            state, batch, jax.random.key(9))
        mesh = make_cp_mesh(2, 2, 2)                     # DP x CP x TP
        assert mesh.axis_names == ('data', 'ctx', 'model')
        state2 = init_state(cfg, 'ValleAR', jax.random.key(0))
        cp_state, pm = make_cp_train_step(cfg, 'ValleAR', mesh)(
            state2, batch, jax.random.key(9))
        np.testing.assert_allclose(float(sm['loss']), float(pm['loss']),
                                   rtol=1e-6)
        np.testing.assert_allclose(float(sm['acc']), float(pm['acc']),
                                   rtol=1e-6)
        np.testing.assert_allclose(float(sm['grad_norm']),
                                   float(pm['grad_norm']), rtol=1e-4)
        diff = max(jax.tree.leaves(jax.tree.map(
            lambda a, b_: float(jnp.max(jnp.abs(a - b_))),
            solo_state.params, jax.device_get(cp_state.params))))
        assert diff < 1e-5, diff

    def test_ctx_tp_only_mesh(self):
        """1 x 2 x 4: all-TP-heavy layout, no data axis contribution."""
        cfg = self._cfg()
        batch = self._batch()
        state = init_state(cfg, 'ValleAR', jax.random.key(0))
        _, sm = make_train_step(cfg, 'ValleAR', mesh=None)(
            state, batch, jax.random.key(9))
        mesh = make_cp_mesh(1, 2, 4)
        state2 = init_state(cfg, 'ValleAR', jax.random.key(0))
        _, pm = make_cp_train_step(cfg, 'ValleAR', mesh)(
            state2, batch, jax.random.key(9))
        np.testing.assert_allclose(float(sm['loss']), float(pm['loss']),
                                   rtol=1e-6)

    def test_nar_step_matches_solo(self):
        cfg = self._cfg(num_quantizers=8)
        kt, kc = jax.random.split(jax.random.key(5), 2)
        batch = {'tokens': jax.random.randint(kt, (4, 10), 0, 40),
                 'codes': jax.random.randint(kc, (4, 22, 8), 0, 50),
                 'tokens_lens': jnp.array([10, 8, 9, 7]),
                 'codes_lens': jnp.array([22, 15, 20, 11])}
        state = init_state(cfg, 'ValleNAR', jax.random.key(0))
        solo_state, sm = make_train_step(cfg, 'ValleNAR', mesh=None)(
            state, batch, jax.random.key(9))
        mesh = make_cp_mesh(2, 2, 2)
        state2 = init_state(cfg, 'ValleNAR', jax.random.key(0))
        cp_state, pm = make_cp_train_step(cfg, 'ValleNAR', mesh)(
            state2, batch, jax.random.key(9))
        np.testing.assert_allclose(float(sm['loss']), float(pm['loss']),
                                   rtol=1e-6)
        assert int(sm['stage']) == int(pm['stage'])
        diff = max(jax.tree.leaves(jax.tree.map(
            lambda a, b_: float(jnp.max(jnp.abs(a - b_))),
            solo_state.params, jax.device_get(cp_state.params))))
        assert diff < 1e-5, diff

    def test_eval_step_matches_solo(self):
        from valle2_tpu.parallel.context import make_cp_eval_step
        from valle2_tpu.train import make_eval_step
        cfg = self._cfg()
        batch = self._batch()
        state = init_state(cfg, 'ValleAR', jax.random.key(0))
        sm = make_eval_step(cfg, 'ValleAR')(state.params, batch,
                                            jax.random.key(2))
        mesh = make_cp_mesh(2, 2, 2)
        pm = make_cp_eval_step(cfg, 'ValleAR', mesh)(state.params, batch,
                                                     jax.random.key(2))
        np.testing.assert_allclose(float(sm['loss']), float(pm['loss']),
                                   rtol=1e-6)

    def test_trainer_accepts_cp_tp(self):
        from valle2_tpu.train import Trainer
        cfg = self._cfg(mesh_ctx=2, mesh_data=2, mesh_model=2)
        mesh = make_cp_mesh(2, 2, 2)
        tr = Trainer(cfg, 'ValleAR', mesh=mesh, use_tensorboard=False)
        assert tr._cp
        state = init_state(cfg, 'ValleAR', jax.random.key(0))
        _, m = tr.train_step(state, self._batch(), jax.random.key(1))
        assert np.isfinite(float(m['loss']))

    def test_bad_tp_split_raises(self):
        cfg = self._cfg(n_heads=3)                       # 3 % 2 != 0
        mesh = make_cp_mesh(2, 2, 2)
        with pytest.raises(ValueError, match='mesh_model'):
            make_cp_train_step(cfg, 'ValleAR', mesh)
