"""Closed-loop integration: train tiny AR + NAR to memorize one utterance, then
ValleTTS.synthesize_fused must emit exactly the memorized code sequences.

This wires the full reference pipeline end to end (train_model.py:13-35 +
valle_ar.py generate + valle_nar.py generate, composed the way BASELINE config #4
describes) — the round-1 repo trained on synthetic data and synthesized from random
weights but never closed the loop (VERDICT r1 item 5).

Construction: one fixed utterance of T frames; the acoustic prompt is its first
T//3 frames so the NAR's training-time prefix layout (prefix_len =
min(T//3, 3 s) with ALL codebooks summed) coincides exactly with the
generation-time prompt layout.  After overfitting, greedy decode reproduces the
target suffix (AR: first codebook + EOS; NAR: the 7 residual codebooks).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from valle2_tpu.config import ConfigValle
from valle2_tpu.data.frontend import PhonemeTokenizer
from valle2_tpu.models.ar import ValleAR
from valle2_tpu.models.nar import ValleNAR
from valle2_tpu.train import init_state, make_train_step

T_FRAMES = 18
PREFIX = T_FRAMES // 3            # == NAR training prefix_len for this T
TEXT = 'one two.'


def _cfg(**kw):
    tok = PhonemeTokenizer()
    base = dict(d_model=64, n_heads=2, dim_feedforward=128, num_layers=2,
                vocab_size=tok.vocab_size, num_audio_tokens=64, dropout=0.0,
                temperature=0.0, num_beams=2, max_audio_len=16,
                norm='AdaptiveLayerNorm', bucket_sizes=(24,), lr=5e-3,
                schedule='constant', matmul_precision='highest',
                decode_attn_buckets=1)
    base.update(kw)
    return ConfigValle(**base)


@pytest.fixture(scope='module')
def memorized():
    """Train AR + NAR to loss ~0 on one utterance; return everything needed."""
    cfg = _cfg()
    tok = PhonemeTokenizer()
    rs = np.random.RandomState(0)
    prompt_tokens = rs.randint(0, 40, (4,)).astype(np.int32)
    text_tokens = tok(TEXT)
    tokens = np.concatenate([prompt_tokens, text_tokens]).astype(np.int32)
    codes = rs.randint(0, cfg.num_audio_tokens, (T_FRAMES, 8)).astype(np.int32)

    eos, bos = cfg.num_audio_tokens, cfg.num_audio_tokens + 1

    # --- AR: memorize the first-codebook continuation ---
    ar_batch = {
        'tokens': jnp.asarray(tokens[None]),
        'tokens_lens': jnp.asarray([len(tokens)]),
        'codes': jnp.asarray(np.concatenate([[bos], codes[:, 0]])[None]),
        'codes_lens': jnp.asarray([T_FRAMES + 1]),
        'target': jnp.asarray(np.concatenate([codes[:, 0], [eos]])[None]),
    }
    ar_state = init_state(cfg, 'ValleAR', jax.random.key(0))
    ar_step = make_train_step(cfg, 'ValleAR')
    rng = jax.random.key(1)
    for _ in range(250):
        ar_state, ar_m = ar_step(ar_state, ar_batch, rng)
    assert float(ar_m['loss']) < 0.05, f"AR did not overfit: {float(ar_m['loss'])}"

    # --- NAR: memorize the residual codebooks (stage drawn per step) ---
    nar_batch = {
        'tokens': jnp.asarray(tokens[None]),
        'tokens_lens': jnp.asarray([len(tokens)]),
        'codes': jnp.asarray(codes[None]),
        'codes_lens': jnp.asarray([T_FRAMES]),
    }
    nar_state = init_state(cfg, 'ValleNAR', jax.random.key(2))
    nar_step = make_train_step(cfg, 'ValleNAR')
    for i in range(700):
        nar_state, nar_m = nar_step(nar_state, nar_batch, jax.random.key(3))
    assert float(nar_m['loss']) < 0.1, f"NAR did not overfit: {float(nar_m['loss'])}"

    return cfg, prompt_tokens, codes, ar_state.params, nar_state.params


class TestTrainSynthesizeLoop:
    def test_ar_decode_reproduces_memorized_codes(self, memorized):
        cfg, prompt_tokens, codes, ar_params, _ = memorized
        model = ValleAR(cfg, params=ar_params)
        out = np.asarray(model.generate(
            np.concatenate([prompt_tokens, PhonemeTokenizer()(TEXT)]),
            codes[:PREFIX]))
        np.testing.assert_array_equal(out, codes[PREFIX:, 0])

    def test_fused_tts_reproduces_all_codebooks(self, memorized):
        """The full fused pipeline (AR while_loop -> NAR scan -> codec decode)
        emits exactly the memorized (T-P, 8) code block and a waveform of the
        matching length."""
        from valle2_tpu.tts import ValleTTS
        cfg, prompt_tokens, codes, ar_params, nar_params = memorized
        tts = ValleTTS(cfg, ar=ValleAR(cfg, params=ar_params),
                       nar=ValleNAR(cfg, params=nar_params))
        res = tts.synthesize_fused(TEXT, prompt_tokens, codes[:PREFIX])
        np.testing.assert_array_equal(res.codes, codes[PREFIX:])
        assert res.waveform.shape == ((T_FRAMES - PREFIX) * 320,)
        assert np.isfinite(res.waveform).all()

    def test_waveform_roundtrip_through_codec(self, memorized):
        """Codes -> waveform -> codes through a *consistent* codec: with
        scale-separated RVQ codebooks (stage n an order of magnitude smaller than
        n-1) the quantizer inverts its own decode exactly, so the end-to-end
        waveform check reduces to SEANet encode∘decode fidelity.  With the
        random-init SEANet that mapping is not an inverse pair, so this asserts
        the *pipeline* property on the quantizer layer (rvq), which is the part
        the memorized codes flow through; full waveform parity is a
        trained-checkpoint property (PARITY.md item 5)."""
        from valle2_tpu.codec import rvq_decode, rvq_encode, rvq_init
        _, _, codes, _, _ = memorized
        p = rvq_init(jax.random.key(4), num_quantizers=8, codebook_size=64, dim=16)
        scales = (10.0 ** -jnp.arange(8))[:, None, None] * 100.0
        p = {'codebooks': p['codebooks'] * scales}
        latents = rvq_decode(p, jnp.asarray(codes.T[None]))
        back = rvq_encode(p, latents, 8)
        np.testing.assert_array_equal(np.asarray(back[0]), codes.T)
