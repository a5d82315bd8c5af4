"""Generalization gate: the framework trains models that are correct on UNSEEN
inputs — not just memorization (tests/test_e2e_loop.py covers that).

TTS (AR + NAR) and ASR train from scratch on the train split of a compositional
grammar (valle2_tpu/data/grammar.py); the held-out split contains only novel
word COMBINATIONS (every word seen in training).  The eval is the full serving
composition: held-out text → AR decode (with a train-split cloning prompt) →
NAR refinement → the SYNTHESIZED codes → ASR → text.

Same construction as examples/grammar_generalization.py (whose full run
measures 0.98-1.00 on every metric — numbers in
examples/grammar_generalization.md); thresholds here leave margin for the
stage-draw/eval rng.
"""

import jax
import numpy as np
import pytest

from valle2_tpu.data.frontend import PhonemeTokenizer
from valle2_tpu.data.grammar import (GrammarDataset, GrammarSpec, default_config,
                                     evaluate_closed_loop, split_sentences,
                                     train_grammar_model)
from valle2_tpu.models.ar import ValleAR
from valle2_tpu.models.nar import ValleNAR


@pytest.fixture(scope='module')
def trained():
    tok = PhonemeTokenizer(use_g2p=False)
    spec = GrammarSpec()
    train_s, held_s = split_sentences(seed=0, holdout_frac=0.1)
    train_ds = GrammarDataset(train_s, spec, tok, n_pairs=len(train_s))
    held_ds = GrammarDataset(held_s, spec, tok)

    # AR/ASR decide exact-match quality (EOS/length errors dominate near
    # convergence), so they train to a tighter loss than the NAR (whose
    # pointwise stage rule saturates early).
    ar_cfg = default_config(spec, tok, norm='LayerNorm')
    ar_params, ar_curves = train_grammar_model(
        'ValleAR', ar_cfg, train_ds, held_ds, max_epochs=30, loss_target=2e-3)
    nar_cfg = default_config(spec, tok)
    nar_params, nar_curves = train_grammar_model(
        'ValleNAR', nar_cfg, train_ds, held_ds, max_epochs=30, loss_target=4e-3)
    asr_cfg = default_config(spec, tok, norm='LayerNorm', direction='asr')
    asr_params, asr_curves = train_grammar_model(
        'ValleASR', asr_cfg, train_ds, held_ds, max_epochs=30, loss_target=2e-3)

    models = (ValleAR(ar_cfg, params=ar_params),
              ValleNAR(nar_cfg, params=nar_params),
              ValleAR(asr_cfg, params=asr_params))
    curves = {'ValleAR': ar_curves, 'ValleNAR': nar_curves,
              'ValleASR': asr_curves}
    metrics = evaluate_closed_loop(*models, held_s, spec, tok,
                                   prompt_text=train_s[0])
    return curves, metrics, models, (train_s, held_s, spec, tok)


class TestGeneralization:
    def test_validation_tracks_training(self, trained):
        """Held-out loss must track the training loss down — the curves that
        distinguish learning from memorizing noise."""
        curves, *_ = trained
        for name, c in curves.items():
            tl, vl = c['train_loss'], c['valid_loss']
            assert vl[-1] < 0.25 * vl[0], f'{name}: held-out loss barely moved'
            assert vl[-1] < 0.05, f'{name}: held-out loss did not converge'
            assert vl[-1] < tl[-1] + 0.05, f'{name}: val diverged from train'

    def test_tts_correct_on_heldout(self, trained):
        """Greedy AR decode reproduces the ground-truth first-codebook codes of
        sentences never seen in training."""
        _, m, _, _ = trained
        assert m['tts_token_acc'] >= 0.90, m
        assert m['tts_exact'] >= 0.70, m

    def test_nar_correct_on_synthesized_codes(self, trained):
        _, m, _, _ = trained
        assert m['nar_token_acc'] >= 0.90, m

    def test_asr_closed_loop_recovers_text(self, trained):
        """The synthesized (not ground-truth!) codes transcribe back to the
        original held-out text — the full TTS→ASR loop."""
        _, m, _, _ = trained
        assert m['asr_token_acc'] >= 0.90, m
        assert m['asr_exact'] >= 0.75, m
        assert m['text_exact'] >= 0.75, m

    def test_int4_quantized_models_stay_correct(self, trained):
        """int4 W4A16 on the TRAINED models (weight_dtype='int4', shared
        params → quantized decode view): the same held-out closed loop keeps
        task accuracy — evidence the 4-bit rounding preserves FUNCTION, not
        just numerics, even at d_model=64 (far coarser groups than the
        production scales int4 targets)."""
        import dataclasses
        _, dense_m, (ar, nar, asr), (train_s, held_s, spec, tok) = trained
        ar4 = ValleAR(dataclasses.replace(ar.config, weight_dtype='int4'),
                      params=ar.params)
        asr4 = ValleAR(dataclasses.replace(asr.config, weight_dtype='int4'),
                       params=asr.params)
        assert 'q4' in ar4.decode_params['transformer']['attn']['qkv']
        m = evaluate_closed_loop(ar4, nar, asr4, held_s, spec, tok,
                                 prompt_text=train_s[0])
        assert m['tts_token_acc'] >= 0.85, (m, dense_m)
        assert m['asr_token_acc'] >= 0.85, (m, dense_m)
        assert m['text_exact'] >= 0.60, (m, dense_m)
