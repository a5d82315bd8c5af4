"""Quantized-serving QUALITY gate on trained weights (VERDICT r4 Next #2).

r1-r4 measured the quantized serving paths (int8 W8A8, int4 W4A16, bf16/int8
KV caches, fused whole-stack decode) only for SPEED; quality was a documented
caveat ("quantization-lossy by design", quantize.py).  This tool closes that:
it loads the TPU-trained grammar checkpoints (runs/grammar_tpu — v2 exact
acoustics; runs/grammar_v3_tpu — v3 ambiguous acoustics) and sweeps

    weight_dtype ∈ {compute(bf16), int8, int4}
  × kv_cache_dtype ∈ {float32, bfloat16, int8}
  × fused decode ∈ {on, off}

scoring every cell's GREEDY decode on the held-out split: exact match of
codebook 0 vs ground truth (v2) or realization validity via the parser (v3),
plus first-token-stream accuracy and measured decode wall-clock.  Output:
``QUANT_QUALITY.json`` with the full grid and a recommended serving config
(the fastest cell within a quality epsilon of the bf16/f32 reference cell).

Run (TPU):  python -m valle2_tpu.tools.quant_quality
            python -m valle2_tpu.tools.quant_quality --v3
CPU smoke:  python -m valle2_tpu.tools.quant_quality --run-dir <dir> --limit 4

The CPU-scale regression pin lives in tests/test_grammar_v3.py
(TestQuantFloor) — this tool is the measurement, that test is the gate.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import time
from pathlib import Path

import numpy as np


def _truth_codes(token_ids, spec, speaker, v3: bool, seed: int = 777):
    """Ground-truth codes for one utterance: the deterministic v2 realization
    or a seeded v3 sample."""
    from ..data.grammar import sample_realization, synthesize_codes
    if v3:
        codes, _ = sample_realization(token_ids, spec, speaker,
                                      np.random.RandomState(seed))
        return codes
    return synthesize_codes(token_ids, spec, speaker)


def cell_nll(ar, sentences, spec, tok, prompt_text, speaker, v3: bool
             ) -> float:
    """Teacher-forced per-token NLL of held-out ground truth under this
    cell's WEIGHT layout (prompt-conditioned; KV dtype is decode-only and
    does not enter).  The resolution the exact-match column lacks: int8/int4
    perturb logits measurably even when every greedy argmax survives."""
    import jax
    import jax.numpy as jnp

    from ..config import bucket_len
    from ..models import ar as ar_mod

    cfg = ar.config
    p_toks = tok(prompt_text + ' ')
    pcodes = _truth_codes(p_toks, spec, speaker, v3)
    rows = []
    for si, s in enumerate(sentences):
        t = tok(s)
        c0 = np.concatenate([pcodes[0],
                             _truth_codes(t, spec, speaker, v3, 131 * si)[0]])
        rows.append((np.concatenate([p_toks, t]).astype(np.int32),
                     np.concatenate([[cfg.bos_token], c0]).astype(np.int32),
                     np.concatenate([c0, [cfg.eos_token]]).astype(np.int32),
                     pcodes.shape[1]))
    tw = bucket_len(cfg.bucket_sizes, max(len(r[0]) for r in rows))
    cw = bucket_len(cfg.bucket_sizes, max(len(r[1]) for r in rows))
    pad = lambda a, w: np.pad(np.asarray(a, np.int32), (0, w - len(a)))  # noqa: E731
    tokens = jnp.asarray(np.stack([pad(r[0], tw) for r in rows]))
    codes = jnp.asarray(np.stack([pad(r[1], cw) for r in rows]))
    target = jnp.asarray(np.stack([pad(r[2], cw) for r in rows]))
    tokens_lens = jnp.asarray([len(r[0]) for r in rows], jnp.int32)
    codes_lens = jnp.asarray([len(r[1]) for r in rows], jnp.int32)
    starts = jnp.asarray([r[3] for r in rows], jnp.int32)

    @jax.jit
    def score(params, tokens, codes, target, tokens_lens, codes_lens, starts):
        logits = ar_mod.forward(params, cfg, tokens, codes,
                                tokens_lens, codes_lens, None)
        lp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(lp, target[..., None], axis=-1)[..., 0]
        pos = jnp.arange(target.shape[1])[None, :]
        valid = (pos >= starts[:, None]) & (pos < codes_lens[:, None])
        return jnp.sum(nll * valid), jnp.sum(valid)

    tot, n = score(ar.decode_params, tokens, codes, target, tokens_lens,
                   codes_lens, starts)
    return float(tot) / float(n)


def score_cell(ar, sentences, spec, tok, prompt_text, speaker, v3: bool
               ) -> dict:
    """Greedy-decode ``sentences`` through one serving configuration and
    score against the grammar ground truth."""
    import jax.numpy as jnp

    from ..data.grammar import (parse_codes0, sample_realization,
                                synthesize_codes, _token_acc)

    p_toks = tok(prompt_text + ' ')
    if v3:
        rs = np.random.RandomState(777)
        pcodes_arr, _ = sample_realization(p_toks, spec, speaker, rs)
    else:
        pcodes_arr = synthesize_codes(p_toks, spec, speaker)
    pcodes = np.ascontiguousarray(pcodes_arr.T)
    token_lists = [tok(s) for s in sentences]
    batch_tokens = [jnp.asarray(np.concatenate([p_toks, t]))
                    for t in token_lists]
    batch_codes = [pcodes] * len(sentences)
    # Warm decode (compile) then the timed pass.
    _ = ar.generate_batch(batch_tokens[:1], batch_codes[:1])
    t0 = time.time()
    gen0 = [np.asarray(g) for g in ar.generate_batch(batch_tokens,
                                                     batch_codes)]
    wall = time.time() - t0
    n_tok = int(sum(len(g) for g in gen0))
    if v3:
        parses = [parse_codes0(g, t, spec, speaker)
                  for g, t in zip(gen0, token_lists)]
        quality = float(np.mean([p['valid'] for p in parses]))
        tokacc = float(np.mean([p['n_parsed'] / max(p['n_tokens'], 1)
                                for p in parses]))
    else:
        truth = [synthesize_codes(t, spec, speaker) for t in token_lists]
        quality = float(np.mean(
            [len(g) == tr.shape[1] and np.array_equal(g, tr[0])
             for g, tr in zip(gen0, truth)]))
        tokacc = float(np.mean([_token_acc(g, tr[0])
                                for g, tr in zip(gen0, truth)]))
    return {'quality': quality, 'token_acc': tokacc,
            'decode_wall_s': round(wall, 3),
            'tokens_per_s': round(n_tok / wall, 1) if wall > 0 else None}


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument('--run-dir', type=Path, default=None)
    p.add_argument('--v3', action='store_true')
    p.add_argument('--out', type=Path, default=Path('QUANT_QUALITY.json'))
    p.add_argument('--limit', type=int, default=0,
                   help='cap held-out sentences (CPU smoke)')
    p.add_argument('--speaker', type=int, default=0)
    p.add_argument('--quality-eps', type=float, default=0.02,
                   help='recommended config = fastest cell within eps of '
                        'the reference cell quality')
    args = p.parse_args(argv)
    if args.run_dir is None:
        args.run_dir = Path('runs/grammar_v3_tpu' if args.v3
                            else 'runs/grammar_tpu')

    import jax

    from ..config import ConfigValle
    from ..data.frontend import PhonemeTokenizer
    from ..data.grammar import (build_grammar_datasets, parse_grammar_dataset,
                                split_sentences)
    from ..models.ar import ValleAR

    report = json.loads((args.run_dir / 'report.json').read_text())
    cfg = ConfigValle.from_dict(report['config'])
    ckpt = report['runs']['ValleAR']['final_ckpt']
    _, _, spec = build_grammar_datasets(cfg)
    opts = parse_grammar_dataset(report['config']['dataset'])
    tok = PhonemeTokenizer(use_g2p=False)
    train_s, held_s = split_sentences(seed=int(opts['seed']),
                                      holdout_frac=opts['holdout'])
    if args.limit:
        held_s = held_s[:args.limit]

    # Greedy + single beam: quantization error shows up as flipped argmax.
    base = dataclasses.replace(cfg, temperature=0.0, num_beams=1)
    grid: dict[str, dict] = {}
    cells = [(w, k, f)
             for w in ('compute', 'int8', 'int4')
             for k in ('float32', 'bfloat16', 'int8')
             for f in (True, False)]
    nll_by_weight: dict[str, float] = {}
    for w, k, f in cells:
        name = f'{w}/{k}/{"fused" if f else "unfused"}'
        try:
            m = ValleAR(dataclasses.replace(base, weight_dtype=w,
                                            kv_cache_dtype=k,
                                            use_fused_decode=f))
            m.load(ckpt)
            grid[name] = score_cell(m, held_s, spec, tok, train_s[0],
                                    args.speaker, args.v3)
            if w not in nll_by_weight:
                # Teacher-forced NLL depends only on the WEIGHT layout (KV
                # and the fused kernel are decode-side) — one forward per
                # weight dtype resolves perturbation below argmax.
                nll_by_weight[w] = cell_nll(m, held_s, spec, tok, train_s[0],
                                            args.speaker, args.v3)
            grid[name]['nll_per_token'] = round(nll_by_weight[w], 5)
            print(f'{name:32s} quality={grid[name]["quality"]:.3f} '
                  f'tok_acc={grid[name]["token_acc"]:.3f} '
                  f'nll={grid[name]["nll_per_token"]:.4f} '
                  f'wall={grid[name]["decode_wall_s"]}s', flush=True)
        except Exception as e:  # noqa: BLE001 — record per-cell failures
            grid[name] = {'error': f'{type(e).__name__}: {e}'}
            print(f'{name:32s} ERROR {type(e).__name__}: {e}', flush=True)

    ref_name = 'compute/float32/unfused'
    ref_q = grid.get(ref_name, {}).get('quality')
    rec = None
    if ref_q is not None:
        ok_cells = [(n, c) for n, c in grid.items()
                    if c.get('quality') is not None
                    and c['quality'] >= ref_q - args.quality_eps
                    and c.get('tokens_per_s')]
        if ok_cells:
            rec = max(ok_cells, key=lambda nc: nc[1]['tokens_per_s'])[0]
    out = {'run_dir': str(args.run_dir), 'v3': args.v3,
           'n_sentences': len(held_s), 'speaker': args.speaker,
           'reference_cell': ref_name, 'reference_quality': ref_q,
           'recommended': rec, 'backend': jax.default_backend(),
           'grid': grid}
    args.out.write_text(json.dumps(out, indent=1))
    print(json.dumps({'recommended': rec, 'reference_quality': ref_q},
                     indent=1))


if __name__ == '__main__':
    main()
