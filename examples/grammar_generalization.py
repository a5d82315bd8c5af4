"""Generalization evidence: TTS→ASR closed loop on a held-out synthetic grammar.

Trains ValleAR (TTS), ValleNAR, and ValleAR-ASR **from scratch** on the train
split of a compositional grammar (``valle2_tpu/data/grammar.py``), then on the
HELD-OUT split: synthesizes codes with the TTS stack and transcribes the
*synthesized* codes back to text with the ASR stack.  Every decode is greedy
and runs through the production batched on-device decode path.

Run:  python examples/grammar_generalization.py  [--holdout 0.1] [--seed 0]
Measured numbers live in examples/grammar_generalization.md.
"""

import argparse
import dataclasses
import time

import jax
import numpy as np

from valle2_tpu.data.frontend import PhonemeTokenizer
from valle2_tpu.data.grammar import (GrammarDataset, GrammarSpec, default_config,
                                     evaluate_closed_loop, split_sentences,
                                     train_grammar_model)
from valle2_tpu.models.ar import ValleAR
from valle2_tpu.models.nar import ValleNAR


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument('--holdout', type=float, default=0.1)
    parser.add_argument('--seed', type=int, default=0)
    parser.add_argument('--max-epochs', type=int, default=80)
    args = parser.parse_args(argv)

    tok = PhonemeTokenizer(use_g2p=False)
    spec = GrammarSpec()
    train_s, held_s = split_sentences(seed=args.seed, holdout_frac=args.holdout)
    # Pairs teach the continuation-after-prompt layout that cloning-prompt
    # inference uses (both halves always from the TRAIN split).
    train_ds = GrammarDataset(train_s, spec, tok, n_pairs=len(train_s))
    held_ds = GrammarDataset(held_s, spec, tok)
    print(f'{len(train_s)} train sentences, {len(held_s)} held out '
          f'(every word appears in training; combinations are novel)')

    curves = {}
    t0 = time.time()
    ar_cfg = default_config(spec, tok, norm='LayerNorm')
    ar_params, curves['ValleAR'] = train_grammar_model(
        'ValleAR', ar_cfg, train_ds, held_ds, max_epochs=args.max_epochs,
        loss_target=2e-3, seed=args.seed)
    nar_cfg = default_config(spec, tok)
    nar_params, curves['ValleNAR'] = train_grammar_model(
        'ValleNAR', nar_cfg, train_ds, held_ds, max_epochs=2 * args.max_epochs,
        loss_target=2e-3, seed=args.seed)
    asr_cfg = default_config(spec, tok, norm='LayerNorm', direction='asr')
    asr_params, curves['ValleASR'] = train_grammar_model(
        'ValleASR', asr_cfg, train_ds, held_ds, max_epochs=args.max_epochs,
        loss_target=2e-3, seed=args.seed)
    train_secs = time.time() - t0

    for name, c in curves.items():
        tl, vl = c['train_loss'], c['valid_loss']
        print(f'{name}: {len(tl)} epochs | final train loss {tl[-1]:.4f} | '
              f'final HELD-OUT loss {vl[-1]:.4f} | '
              f'val curve {["%.3f" % v for v in vl[:3]]}...{vl[-1]:.3f}')

    ar = ValleAR(ar_cfg, params=ar_params)
    nar = ValleNAR(nar_cfg, params=nar_params)
    asr = ValleAR(asr_cfg, params=asr_params)
    t0 = time.time()
    # Cloning prompt = a TRAIN sentence's ground-truth codes (the BASELINE #4
    # serving composition; nothing from the held-out split leaks).
    m = evaluate_closed_loop(ar, nar, asr, held_s, spec, tok,
                             prompt_text=train_s[0])
    print(f'\nHeld-out closed-loop evaluation ({m["n"]} sentences, '
          f'{time.time() - t0:.0f}s; training took {train_secs:.0f}s):')
    print(f'  TTS  first-codebook token accuracy : {m["tts_token_acc"]:.3f}')
    print(f'  TTS  exact code-sequence match     : {m["tts_exact"]:.3f}')
    print(f'  NAR  residual-codebook accuracy    : {m["nar_token_acc"]:.3f}')
    print(f'  ASR  phoneme token accuracy        : {m["asr_token_acc"]:.3f}')
    print(f'  ASR  exact phoneme-sequence match  : {m["asr_exact"]:.3f}')
    print(f'  text round-trip exact match        : {m["text_exact"]:.3f}')
    mism = [(g, w) for g, w in zip(m['texts'], held_s) if g != w][:5]
    if mism:
        print('  round-trip mismatches (up to 5):')
        for g, w in mism:
            print(f'    got {g!r}  want {w!r}')
    return m


if __name__ == '__main__':
    main()
