"""Greedy token-ID parity vs the torch mirror of the reference equations.

The BASELINE gate: 'greedy (temperature-0) token-ID parity vs PyTorch reference'.
The real reference isn't installable here (lightning/encodec/g2p_en absent), so the
mirror in torch_mirror.py re-implements its documented math over the SAME weights —
an independent torch code path whose outputs the JAX stack must reproduce exactly.

Run with float32 + matmul_precision=highest (the parity configuration; conftest pins
highest globally).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from valle2_tpu.config import ConfigValle
from valle2_tpu.models import ar as ar_mod
from valle2_tpu.models import nar as nar_mod
from valle2_tpu.models.ar import ValleAR
from valle2_tpu.models.nar import ValleNAR
from torch_mirror import TorchValleAR, TorchValleNARStage


def parity_cfg(**kw):
    base = dict(d_model=64, n_heads=4, dim_feedforward=128, num_layers=3,
                num_audio_tokens=128, vocab_size=32, dropout=0.0,
                temperature=0.0, num_beams=2, max_audio_len=24,
                matmul_precision='highest', dtype='float32', norm='LayerNorm')
    base.update(kw)
    return ConfigValle(**base)


class TestARParity:
    @pytest.mark.parametrize('seed', [0, 1])
    def test_training_logits_match(self, seed):
        """Full-sequence forward logits match the mirror elementwise (padless)."""
        cfg = parity_cfg()
        model = ValleAR(cfg, seed=seed)
        rs = np.random.RandomState(seed)
        tokens = rs.randint(0, cfg.vocab_size, (7,))
        codes = np.concatenate([[cfg.bos_token],
                                rs.randint(0, cfg.num_audio_tokens, (11,))])
        jax_logits = np.asarray(ar_mod.forward(
            model.params, cfg, jnp.asarray(tokens)[None], jnp.asarray(codes)[None],
            None, None))
        mirror = TorchValleAR(model.params, cfg)
        torch_logits = mirror.forward_logits(tokens, codes).numpy()
        np.testing.assert_allclose(jax_logits[0], torch_logits, atol=2e-4)
        # Same argmax everywhere — the decision-level check.
        np.testing.assert_array_equal(jax_logits[0].argmax(-1),
                                      torch_logits.argmax(-1))

    @pytest.mark.parametrize('seed', [0, 1, 2])
    def test_greedy_decode_token_parity(self, seed):
        """On-device while_loop decode == mirror's step-by-step argmax loop."""
        cfg = parity_cfg()
        model = ValleAR(cfg, seed=seed)
        rs = np.random.RandomState(100 + seed)
        prompt_tokens = rs.randint(0, cfg.vocab_size, (6,))
        prompt_codes = rs.randint(0, cfg.num_audio_tokens, (5, cfg.num_quantizers))

        fast = np.asarray(model.generate(jnp.asarray(prompt_tokens),
                                         jnp.asarray(prompt_codes)))
        mirror = TorchValleAR(model.params, cfg)
        slow = mirror.greedy_generate(prompt_tokens, prompt_codes[:, 0],
                                      cfg.max_audio_len)
        np.testing.assert_array_equal(fast, np.asarray(slow, np.int64))


class TestNARParity:
    @pytest.mark.parametrize('stage', [1, 4, 7])
    def test_stage_logits_match(self, stage):
        """Single refinement stage logits match the AdaLN mirror."""
        cfg = parity_cfg(norm='AdaptiveLayerNorm')
        model = ValleNAR(cfg, seed=3)
        rs = np.random.RandomState(stage)
        tokens = rs.randint(0, cfg.vocab_size, (5,))
        prompt_codes = rs.randint(0, cfg.num_audio_tokens, (6, cfg.num_quantizers))
        out_layers = [rs.randint(0, cfg.num_audio_tokens, (9,)) for _ in range(stage)]

        # JAX path: build the stage input exactly as _generate_fn does.
        tp = jnp.asarray(prompt_codes)
        emb_prompt = nar_mod._embed_codes_all(
            model.params['codes_embs'], tp[None]).sum(axis=2)
        emb_out = sum(model.params['codes_embs'][q][jnp.asarray(out_layers[q])][None]
                      for q in range(stage))
        from valle2_tpu.ops import add_positional, sinusoidal_table, transformer
        pe = sinusoidal_table(nar_mod.MAX_POS, cfg.d_model)
        x_tok = add_positional(pe, model.params['tokens_emb']['emb'][
            jnp.asarray(tokens)][None])
        codes_emb = add_positional(pe, jnp.concatenate([emb_prompt, emb_out], axis=1))
        x = jnp.concatenate([x_tok, codes_emb], axis=1)
        cond = model.params['stage_embs'][stage - 1][None]
        y = transformer(model.params['transformer'], x, cfg.n_heads, None, cond)
        jax_logits = np.asarray(
            y[0, len(tokens) + len(prompt_codes):] @ model.params['proj_layers'][stage - 1])

        mirror = TorchValleNARStage(model.params, cfg)
        torch_logits = mirror.stage_logits(tokens, prompt_codes, out_layers,
                                           stage).numpy()
        np.testing.assert_allclose(jax_logits, torch_logits, atol=3e-4)
        np.testing.assert_array_equal(jax_logits.argmax(-1), torch_logits.argmax(-1))

    def test_full_nar_greedy_refinement_parity(self):
        """All 7 stages: the scanned JAX decode equals sequential mirror stages."""
        cfg = parity_cfg(norm='AdaptiveLayerNorm')
        model = ValleNAR(cfg, seed=4)
        rs = np.random.RandomState(9)
        prompt_tokens = rs.randint(0, cfg.vocab_size, (4,))
        target_tokens = rs.randint(0, cfg.vocab_size, (3,))
        prompt_codes = rs.randint(0, cfg.num_audio_tokens, (5, cfg.num_quantizers))
        first_layer = rs.randint(0, cfg.num_audio_tokens, (8,))

        fast = np.asarray(model.generate(prompt_tokens, prompt_codes, target_tokens,
                                         first_layer))

        mirror = TorchValleNARStage(model.params, cfg)
        tokens = np.concatenate([prompt_tokens, target_tokens])
        out_layers = [first_layer]
        for stage in range(1, cfg.num_quantizers):
            logits = mirror.stage_logits(tokens, prompt_codes, out_layers, stage)
            out_layers.append(logits.argmax(-1).numpy())
        want = np.stack(out_layers, axis=1)
        np.testing.assert_array_equal(fast, want)
