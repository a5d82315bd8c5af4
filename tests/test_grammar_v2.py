"""Grammar v2: prompt-conditioned (multi-speaker) acoustics + dataset plumbing.

The v1 grammar's acoustics were injective per phoneme — the cloning prompt was
informationally irrelevant (VERDICT r3 Missing #2).  v2 adds per-speaker
offsets recoverable ONLY from the prompt codes; these tests pin the
construction's invariants and the ``grammar://`` production-dataset path.
The trained-model conditioning gate lives in
tools/grammar_production.py (TPU) and test_generalization.py (CPU scale).
"""

import numpy as np
import pytest

from valle2_tpu.config import ConfigValle
from valle2_tpu.data.dataset import get_dataloaders
from valle2_tpu.data.frontend import PhonemeTokenizer
from valle2_tpu.data.grammar import (GrammarDataset, GrammarSpec,
                                     build_grammar_datasets, multispeaker_spec,
                                     parse_grammar_dataset, speaker_offset,
                                     split_sentences, synthesize_codes)


class TestMultispeakerSpec:
    def test_v1_unchanged(self):
        """speaker=0 under the default spec reproduces the r3 ground truth —
        existing trained artifacts/tests stay valid."""
        t = np.arange(12)
        c = synthesize_codes(t, GrammarSpec())
        want0 = np.stack([(37 * t + 11) % 256, (53 * t + 29) % 256],
                         axis=1).reshape(-1)
        np.testing.assert_array_equal(c[0], want0)

    def test_speakers_distinct_and_offset(self):
        spec = multispeaker_spec(4)
        t = np.arange(10)
        c0 = synthesize_codes(t, spec, 0)
        for s in range(1, 4):
            cs = synthesize_codes(t, spec, s)
            off = speaker_offset(spec, s)
            np.testing.assert_array_equal(cs, (c0 + off) % 256)
            assert off != 0

    def test_asr_well_posed_across_speakers(self):
        """The within-motif difference is speaker-invariant AND injective in
        the token id — transcription is a function even with the speaker
        unknown (the property the (37, 54) multipliers exist for)."""
        spec = multispeaker_spec(6)
        t = np.arange(60)               # > any tokenizer vocab
        diffs = []
        for s in range(6):
            m = synthesize_codes(t, spec, s)[0].reshape(-1, 2)
            diffs.append((m[:, 1] - m[:, 0]) % 256)
        for d in diffs[1:]:
            np.testing.assert_array_equal(d, diffs[0])
        assert len(set(diffs[0].tolist())) == len(t)

    def test_v1_muls_would_be_ill_posed(self):
        """Documents WHY the factory swaps 53 → 54: the v1 difference
        multiplier 16 shares a factor with 256, so distinct (token, speaker)
        pairs can collide onto the same motif."""
        v = 256
        d16 = [(16 * t + 18) % v for t in range(32)]
        assert len(set(d16)) < 32          # collisions: t and t+16

    def test_speaker_range_checked(self):
        with pytest.raises(ValueError, match='out of range'):
            synthesize_codes(np.arange(3), multispeaker_spec(2), speaker=2)


class TestGrammarDatasetURI:
    def test_parse(self):
        assert parse_grammar_dataset('grammar') == {
            'speakers': 1, 'pairs': 0, 'holdout': 0.1, 'seed': 0,
            'variants': 1, 'real': 1}
        assert parse_grammar_dataset('grammar://speakers=4,pairs=300')[
            'speakers'] == 4
        with pytest.raises(ValueError, match='unknown grammar'):
            parse_grammar_dataset('grammar://bogus=1')

    def test_build_and_same_voice_pairs(self):
        cfg = ConfigValle.from_dict(dict(
            dataset='grammar://speakers=2,pairs=20', num_audio_tokens=256,
            num_quantizers=8, vocab_size=128))
        train_ds, valid_ds, spec = build_grammar_datasets(cfg)
        assert spec.num_speakers == 2
        # every sentence realized once per speaker
        train_s, held_s = split_sentences(0, 0.1)
        assert len(train_ds) == (len(train_s) + 20) * 2
        assert len(valid_ds) == len(held_s) * 2
        # pair items: prompt + continuation codes share one speaker offset
        tok = PhonemeTokenizer(use_g2p=False)
        pair = train_ds.items[-1]
        toks = tok(pair['text'])
        np.testing.assert_array_equal(
            pair['codes'], synthesize_codes(toks, spec, pair['speaker']))

    def test_production_dataloaders(self):
        """config.dataset='grammar://...' drives the REAL get_dataloaders
        path (collate buckets, lengths) — the train CLI's data plumbing."""
        cfg = ConfigValle.from_dict(dict(
            dataset='grammar://speakers=2', num_audio_tokens=256,
            num_quantizers=8, vocab_size=128, batch_size=8,
            bucket_sizes=(32, 64, 96)))
        train, valid = get_dataloaders('ValleAR', cfg)
        batch = next(iter(train))
        assert batch['codes'].shape[0] == 8
        assert batch['codes'].shape[1] in (32, 64, 96)
        assert (batch['codes_lens'] > batch['tokens_lens']).all()

    def test_vocab_guard(self):
        cfg = ConfigValle.from_dict(dict(
            dataset='grammar', num_audio_tokens=256, num_quantizers=8,
            vocab_size=8))
        with pytest.raises(ValueError, match='vocab'):
            build_grammar_datasets(cfg)


class TestPromptConditioningPlumbing:
    def test_random_model_cannot_match(self):
        """Shape/contract check on the conditioning eval: an untrained model
        scores ~0 everywhere and the matrix has the right geometry."""
        from valle2_tpu.data.grammar import evaluate_prompt_conditioning
        from valle2_tpu.models.ar import ValleAR
        tok = PhonemeTokenizer(use_g2p=False)
        spec = multispeaker_spec(2)
        cfg = ConfigValle.from_dict(dict(
            d_model=32, n_heads=2, dim_feedforward=64, num_layers=2,
            vocab_size=tok.vocab_size, num_audio_tokens=256,
            dropout=0.0, temperature=0.0, num_beams=1, max_audio_len=16,
            norm='LayerNorm', bucket_sizes=(32, 64)))
        m = evaluate_prompt_conditioning(
            ValleAR(cfg), ['the good dog ran.'], spec, tok,
            prompt_text='the old cat fell.')
        assert np.asarray(m['exact_matrix']).shape == (2, 2)
        assert m['match_exact'] <= 0.5 and m['n'] == 1
