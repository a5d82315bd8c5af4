"""LoRA fine-tuning (valle2_tpu/lora.py): adapter math, frozen-base training,
trainer/checkpoint integration, and serving loads.

No reference counterpart (the reference trains full models only,
/root/reference/valle/train_model.py:13-35); these gate the fine-tune workflow:
attach starts exactly at the base model, training moves ONLY the adapters, and
a fine-tune checkpoint serves through the ordinary model load path (merged
dense weights)."""

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from valle2_tpu import lora
from valle2_tpu.config import ConfigValle
from valle2_tpu.data import DataLoader, SyntheticValleDataset, get_collate
from valle2_tpu.models import ValleAR
from valle2_tpu.models import ar as ar_mod
from valle2_tpu.train import (TrainState, Trainer, init_state, make_eval_step,
                              make_train_step)


def tiny_cfg(tmp_path=None, **kw):
    base = dict(d_model=32, n_heads=2, dim_feedforward=64, num_layers=2,
                batch_size=2, max_steps=4, log_every_n_steps=0, dropout=0.0,
                bucket_sizes=(64, 128), ckpt_every_n_steps=0, norm='LayerNorm',
                max_audio_len=32, num_beams=1)
    base.update(kw)
    cfg = ConfigValle(**base)
    if tmp_path is not None:
        cfg.ckpt_path = Path(tmp_path) / 'ckpt'
        cfg.log_path = Path(tmp_path) / 'logs'
    return cfg


def ar_batch():
    rs = np.random.RandomState(7)
    return {
        'tokens': jnp.asarray(rs.randint(0, 255, (4, 6))),
        'tokens_lens': jnp.asarray([6, 6, 6, 6]),
        'codes': jnp.asarray(rs.randint(0, 1024, (4, 10))),
        'codes_lens': jnp.asarray([10, 10, 10, 10]),
        'target': jnp.asarray(rs.randint(0, 1024, (4, 10))),
    }


def trees_equal(a, b) -> bool:
    leaves = jax.tree.map(
        lambda x, y: bool(np.array_equal(np.asarray(x), np.asarray(y))), a, b)
    return all(jax.tree.leaves(leaves))


class TestAdapterMath:
    def test_attach_starts_exactly_at_base(self):
        cfg = tiny_cfg(lora_rank=4)
        params = ar_mod.init_params(jax.random.key(0), cfg)
        state = lora.attach(params, cfg, jax.random.key(1))
        merged = lora.merged(state, cfg)
        assert trees_equal(merged, params)          # B = 0 ⇒ bit-identical
        batch = ar_batch()
        l0, _ = ar_mod.loss_fn(params, cfg, batch, None)
        l1, _ = ar_mod.loss_fn(merged, cfg, batch, None)
        assert float(l0) == float(l1)

    def test_merge_touches_only_target_weights(self):
        cfg = tiny_cfg(lora_rank=2)
        params = ar_mod.init_params(jax.random.key(0), cfg)
        adapters = lora.lora_init(jax.random.key(1), params, 2,
                                  targets=('qkv',))
        # Make the delta nonzero.
        adapters = jax.tree.map(lambda x: x + 0.1, adapters)
        merged = lora.merge_lora(params, adapters, scale=2.0)
        tr, mtr = params['transformer'], merged['transformer']
        qkv_w, mqkv_w = tr['attn']['qkv']['w'], mtr['attn']['qkv']['w']
        a = adapters['transformer']['attn']['qkv']['lora_a']
        b = adapters['transformer']['attn']['qkv']['lora_b']
        expect = np.asarray(qkv_w, np.float32) + 2.0 * np.matmul(
            np.asarray(a, np.float32), np.asarray(b, np.float32))
        np.testing.assert_allclose(np.asarray(mqkv_w), expect, atol=1e-6)
        # Non-target leaves are SHARED (not copied), and untouched.
        assert mtr['attn']['out']['w'] is tr['attn']['out']['w']
        assert mtr['ffn']['lin1']['w'] is tr['ffn']['lin1']['w']
        assert merged['proj']['w'] is params['proj']['w']

    def test_init_covers_all_default_targets(self):
        cfg = tiny_cfg(lora_rank=2)
        params = ar_mod.init_params(jax.random.key(0), cfg)
        adapters = lora.lora_init(jax.random.key(1), params, 2)
        tr = adapters['transformer']
        assert set(tr['attn']) == {'qkv', 'out'}
        assert set(tr['ffn']) == {'lin1', 'lin2'}
        # Stacked-layer leading dim carries over; rank dims are right.
        L, d = cfg.num_layers, cfg.d_model
        assert tr['attn']['qkv']['lora_a'].shape == (L, d, 2)
        assert tr['attn']['qkv']['lora_b'].shape == (L, 2, 3 * d)
        with pytest.raises(ValueError):
            lora.lora_init(jax.random.key(1), params, 2, targets=('nope',))
        with pytest.raises(ValueError):
            lora.lora_init(jax.random.key(1), params, 0)

    def test_adapters_npz_roundtrip(self, tmp_path):
        cfg = tiny_cfg(lora_rank=3)
        params = ar_mod.init_params(jax.random.key(0), cfg)
        adapters = lora.lora_init(jax.random.key(1), params, 3)
        adapters = jax.tree.map(lambda x: x + 0.25, adapters)
        lora.save_adapters(tmp_path / 'v.npz', adapters)
        back = lora.load_adapters(tmp_path / 'v.npz')
        assert trees_equal(adapters, back)


class TestLoraTraining:
    def test_trains_adapters_only_base_frozen(self, tmp_path):
        cfg = tiny_cfg(tmp_path, lora_rank=4, lora_alpha=8.0, lr=3e-3,
                       max_steps=12)
        collate = get_collate('ValleAR')(cfg)
        ds = SyntheticValleDataset(cfg, size=4, min_frames=30, max_frames=60)
        loader = DataLoader(ds, cfg.batch_size, collate, shuffle=False)
        state = init_state(cfg, 'ValleAR', jax.random.key(0))
        assert lora.is_lora_state(state.params)
        base0 = jax.tree.map(np.asarray, state.params['base'])
        lora0 = jax.tree.map(np.asarray, state.params['lora'])
        step = make_train_step(cfg, 'ValleAR')
        rng = jax.random.key(1)
        losses = []
        for _ in range(6):
            for batch in loader:
                batch = jax.tree.map(jnp.asarray, batch)
                state, m = step(state, batch, rng)
                losses.append(float(m['loss']))
        assert losses[-1] < losses[0] - 0.2, losses[:3] + losses[-3:]
        # The base never moves — bit-for-bit; the adapters do.
        assert trees_equal(state.params['base'], base0)
        assert not trees_equal(state.params['lora'], lora0)

    def test_eval_step_merges_state(self, tmp_path):
        cfg = tiny_cfg(tmp_path, lora_rank=2)
        state = init_state(cfg, 'ValleAR', jax.random.key(0))
        # Nonzero adapters so merge matters.
        state = TrainState(
            {'base': state.params['base'],
             'lora': jax.tree.map(lambda x: x + 0.05, state.params['lora'])},
            state.opt_state, state.step)
        batch = ar_batch()
        ev = make_eval_step(cfg, 'ValleAR')
        got = float(ev(state.params, batch, jax.random.key(2))['loss'])
        want, _ = ar_mod.loss_fn(lora.merged(state.params, cfg), cfg, batch,
                                 None)
        np.testing.assert_allclose(got, float(want), rtol=1e-6)

    def test_finetune_from_base_checkpoint(self, tmp_path):
        # Full training produces a Trainer step dir; lora_base adapts it.
        cfg = tiny_cfg(tmp_path)
        state = init_state(cfg, 'ValleAR', jax.random.key(0))
        trainer = Trainer(cfg, 'ValleAR', use_tensorboard=False)
        trainer.save_checkpoint(state)
        ft_cfg = tiny_cfg(tmp_path, lora_rank=4,
                          lora_base=str(trainer.latest_checkpoint()))
        ft = init_state(ft_cfg, 'ValleAR', jax.random.key(5))
        assert trees_equal(ft.params['base'], state.params)

    def test_checkpoint_roundtrip_and_resume_state(self, tmp_path):
        cfg = tiny_cfg(tmp_path, lora_rank=2)
        state = init_state(cfg, 'ValleAR', jax.random.key(0))
        trainer = Trainer(cfg, 'ValleAR', use_tensorboard=False)
        trainer.save_checkpoint(state)
        fresh = init_state(cfg, 'ValleAR', jax.random.key(9))
        restored = trainer.restore_checkpoint(fresh,
                                              trainer.latest_checkpoint())
        assert trees_equal(restored.params, state.params)


class TestServingLoads:
    def test_model_load_accepts_plain_trainer_dir(self, tmp_path):
        # The documented train → serve path (examples/train_and_synthesize.md):
        # ValleAR.load('<ckpt>/ValleAR/step_N') on a FULL-training checkpoint.
        cfg = tiny_cfg(tmp_path)
        state = init_state(cfg, 'ValleAR', jax.random.key(0))
        trainer = Trainer(cfg, 'ValleAR', use_tensorboard=False)
        trainer.save_checkpoint(state)
        model = ValleAR(cfg, seed=3)
        model.load(trainer.latest_checkpoint())
        assert trees_equal(model.params, state.params)

    def test_model_load_merges_lora_trainer_dir(self, tmp_path):
        cfg = tiny_cfg(tmp_path, lora_rank=2, lora_alpha=4.0)
        state = init_state(cfg, 'ValleAR', jax.random.key(0))
        state = TrainState(
            {'base': state.params['base'],
             'lora': jax.tree.map(lambda x: x + 0.05, state.params['lora'])},
            state.opt_state, state.step)
        trainer = Trainer(cfg, 'ValleAR', use_tensorboard=False)
        trainer.save_checkpoint(state)
        model = ValleAR(cfg, seed=3)
        model.load(trainer.latest_checkpoint())
        assert trees_equal(model.params, lora.merged(state.params, cfg))
        # And the merged model decodes.
        rs = np.random.RandomState(1)
        out = np.asarray(model.generate(rs.randint(0, 24, (5,)),
                                        rs.randint(0, 96, (4, 8))))
        assert out.ndim == 1 and len(out) <= cfg.max_audio_len

    def test_lora_dir_without_config_raises_clearly(self, tmp_path):
        cfg = tiny_cfg(tmp_path, lora_rank=2)
        state = init_state(cfg, 'ValleAR', jax.random.key(0))
        trainer = Trainer(cfg, 'ValleAR', use_tensorboard=False)
        trainer.save_checkpoint(state)
        plain = ValleAR(tiny_cfg(tmp_path), seed=3)
        with pytest.raises(ValueError, match='LoRA'):
            plain.load(trainer.latest_checkpoint())


class TestVoiceAdaptation:
    """Task-level gate (the workflow LoRA exists for): a grammar-trained AR
    model adapts to a RE-VOICED acoustics mapping through adapters alone —
    high held-out accuracy on the new voice, near-zero without adaptation,
    and the frozen base still serves the original voice bit-for-bit (one base,
    many voices)."""

    def test_adapts_to_revoiced_grammar(self):
        from valle2_tpu.data.grammar import (GrammarDataset, GrammarSpec,
                                             _token_acc, default_config,
                                             split_sentences,
                                             synthesize_codes,
                                             train_grammar_model)
        from valle2_tpu.data.frontend import PhonemeTokenizer

        tok = PhonemeTokenizer(use_g2p=False)
        spec = GrammarSpec()
        v = spec.num_audio_tokens
        shift = 97                      # voice B = voice A re-voiced by +97 mod V
        train_s, held_s = split_sentences(seed=0, holdout_frac=0.1)
        train_s, held_s = train_s[:240], held_s[:16]
        ds_a = GrammarDataset(train_s, spec, tok, n_pairs=len(train_s))

        class Revoiced:
            def __len__(self):
                return len(ds_a)

            def __getitem__(self, i):
                item = ds_a[i]
                return {'tokens': item['tokens'],
                        'codes': (item['codes'] + shift) % v}

        cfg = default_config(spec, tok, norm='LayerNorm')
        base, _ = train_grammar_model('ValleAR', cfg, ds_a, max_epochs=40,
                                      loss_target=2e-3)
        # Snapshot BEFORE fine-tuning: the train step donates its state, so
        # the original `base` arrays are consumed on the first step — the
        # state's own base subtree stays valid (and must stay bit-identical).
        base_np = jax.tree.map(np.asarray, base)
        # Adapters only (base frozen); 'proj' included — a re-voicing is
        # heavy on the output mapping.
        ft_cfg = default_config(spec, tok, norm='LayerNorm', lora_rank=16,
                                lora_alpha=32.0, lr=3e-3,
                                lora_targets=('qkv', 'out', 'lin1', 'lin2',
                                              'proj'))
        ft, curves = train_grammar_model('ValleAR', ft_cfg, Revoiced(),
                                         max_epochs=60, loss_target=2e-3,
                                         base_params=base)
        assert trees_equal(ft['base'], base_np)           # frozen, bit-for-bit
        base = ft['base']
        adapted = lora.merged(ft, ft_cfg)

        def acc_on_voice(params, voice_shift):
            model = ValleAR(cfg, params=params)
            p_toks = tok(train_s[0] + ' ')
            pcodes = np.ascontiguousarray(
                (synthesize_codes(p_toks, spec).T + voice_shift) % v)
            gen = model.generate_batch(
                [jnp.asarray(np.concatenate([p_toks, tok(s)]))
                 for s in held_s],
                [pcodes] * len(held_s))
            truth = [(synthesize_codes(tok(s), spec)[0] + voice_shift) % v
                     for s in held_s]
            return float(np.mean([_token_acc(np.asarray(g), t)
                                  for g, t in zip(gen, truth)]))

        acc_adapted_b = acc_on_voice(adapted, shift)
        acc_base_b = acc_on_voice(base, shift)
        acc_base_a = acc_on_voice(base, 0)
        assert acc_adapted_b >= 0.9, (acc_adapted_b, curves['train_loss'][-5:])
        assert acc_base_b <= 0.2, acc_base_b        # no adaptation ⇒ wrong voice
        assert acc_base_a >= 0.9, acc_base_a        # original voice intact


class TestLoraUnderMesh:
    def test_one_step_on_data_mesh(self, tmp_path):
        from valle2_tpu.parallel import make_mesh, shard_batch, shard_params
        cfg = tiny_cfg(tmp_path, lora_rank=2, mesh_data=2)
        mesh = make_mesh(data=2)
        state = init_state(cfg, 'ValleAR', jax.random.key(0))
        base0 = jax.tree.map(np.asarray, state.params['base'])
        state = TrainState(shard_params(mesh, state.params),
                           shard_params(mesh, state.opt_state),
                           state.step)
        step = make_train_step(cfg, 'ValleAR', mesh=mesh)
        batch = shard_batch(mesh, jax.tree.map(np.asarray, ar_batch()))
        state, m = step(state, batch, jax.random.key(1))
        assert np.isfinite(float(m['loss']))
        assert trees_equal(state.params['base'], base0)
