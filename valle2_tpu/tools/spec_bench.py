"""Speculative-decoding benchmark: plain greedy vs the n-gram
(prompt-lookup) verify loop, same weights, same process, on the real chip.

    python -m valle2_tpu.tools.spec_bench [--steps 512] [--k 4] [--scale large]

Speculative decoding commits bit-identical tokens (tests/test_spec_decode.py);
the only question is wall-clock, and that is entirely a function of the
acceptance rate — how often the codec stream repeats its own recent n-grams.
So the bench measures the two ends of that axis plus the verify pass's raw
cost, from which any intermediate regime follows:

- ``natural``: a random-init model decoding its own greedy feedback.  Greedy
  feedback from an untrained model typically falls into short cycles, which
  FLATTERS prompt lookup — treat this arm as indicative, not representative
  (a trained model's acceptance depends on how much silence / sustained sound
  the utterance contains).
- ``repetitive``: an EOS-suppressed dominant-token model — the best case
  (acceptance → 1, speedup → K x cost_ratio).
- ``cost_ratio``: spec turns/s vs plain steps/s.  A verify turn is one
  K-token whole-stack step — the fused Pallas q-block verify kernel when the
  fused gate is on (same per-op overhead removal as the decode kernel; the
  K-wide matmuls are marginal against the cache-bandwidth bound), else the
  XLA block ``transformer_decode_step`` — plus the VPU n-gram scan; the
  ratio is the break-even acceptance: speedup = mean_accepted / cost_ratio.

Each arm reports tokens/s, turns (verify passes), and mean accepted tokens
per turn.  Results recorded in BENCHMARKS.md "Speculative decoding".

No reference counterpart: the reference decodes one host-driven token at a
time (/root/reference/valle/models/valle_ar.py:141-171).
"""
from __future__ import annotations

import argparse
import json
import time

import numpy as np


def _model(scale: str, steps: int, spec_k: int = 0, dominant: int | None = None,
           temperature: float = 0.0, ngram: int = 3):
    import jax.numpy as jnp
    from ..config import ConfigValle
    from ..models.ar import ValleAR

    # The ngram must be in the CONSTRUCTION config: ValleAR bakes its decode
    # config into the jitted decode at __init__ (rebinding .config later only
    # affects host-side helpers, not the timed arms).
    kw = dict(dtype='bfloat16', temperature=temperature, num_beams=1,
              max_audio_len=steps, ignore_eos=True, dropout=0.0,
              speculative_k=spec_k, speculative_ngram=ngram)
    if scale == 'large':
        kw.update(d_model=1024, num_layers=16, n_heads=16,
                  dim_feedforward=4096)
    model = ValleAR(ConfigValle(**kw))
    if dominant is not None:
        w = model.params['proj']['w']
        b = jnp.zeros((w.shape[1],), w.dtype).at[dominant].set(50.0)
        model.params = {**model.params,
                        'proj': {**model.params['proj'], 'b': b}}
    return model


def _decode_timed(model, tokens, codes, repeats: int = 3):
    """Best-of-N wall time for one full jitted decode (compile excluded)."""
    out = model.generate_batch([tokens], [codes], bucket=False)   # compile
    np.asarray(out[0])
    best = None
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = model.generate_batch([tokens], [codes], bucket=False)
        np.asarray(out[0])
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best


def _spec_turns(model, tokens, codes, pad_to: tuple[int, int] | None = None):
    """Run prefill + the spec loop directly to read the turns counter.

    ``pad_to`` = (tokens_width, codes_width): pad the prompt streams to fixed
    widths (true lengths still drive the masks) so many utterances share ONE
    compilation — the trained-weights acceptance sweep needs this."""
    import jax
    import jax.numpy as jnp
    from ..models.ar import _decode_advance_spec, _decode_prefill

    # Mirror _decode_fn: the verify pass follows the fused gate (the fused
    # q-block verify kernel consumes the head-major layout directly), so the
    # turns counter runs the same path the timed arms do.
    config = model.config
    tok = jnp.asarray(tokens, jnp.int32)[None]
    cds = jnp.concatenate([jnp.array([model.bos_token], jnp.int32),
                           jnp.asarray(codes, jnp.int32)[:, 0]])[None]
    tl = jnp.asarray([tok.shape[1]], jnp.int32)
    pl = jnp.asarray([cds.shape[1]], jnp.int32)
    if pad_to is not None:
        tok = jnp.pad(tok, ((0, 0), (0, pad_to[0] - tok.shape[1])))
        cds = jnp.pad(cds, ((0, 0), (0, pad_to[1] - cds.shape[1])))
    state, tl_f, pl_f = _decode_prefill(
        model.decode_params, tok, tl, cds, pl, jax.random.key(0), config)
    fn = jax.jit(lambda p, s: _decode_advance_spec(
        p, s, tl_f, pl_f, config, tok.shape[1], cds.shape[1]))
    final, turns = fn(model.decode_params, state)
    return int(turns), int(final.step[0])


def _trained_grammar(args) -> dict:
    """Acceptance + speedup on TRAINED weights decoding REAL text (r4,
    VERDICT item 6 — the r3 recommendation extrapolated from random-init
    extremes).  Loads the production-run AR checkpoint (GRAMMAR_TPU.json),
    decodes held-out grammar sentences with a cloning prompt, and measures
    plain vs speculative wall-clock (EOS active — real utterance lengths)
    plus accepted tokens per verify turn."""
    import dataclasses
    import jax.numpy as jnp

    from ..config import ConfigValle
    from ..data.frontend import PhonemeTokenizer
    from ..data.grammar import (build_grammar_datasets, parse_grammar_dataset,
                                split_sentences, synthesize_codes)
    from ..models.ar import ValleAR

    rep = json.load(open(args.trained_grammar, encoding='utf-8'))
    conf = ConfigValle.from_dict(rep['config'])
    _, _, spec_g = build_grammar_datasets(conf)
    opts = parse_grammar_dataset(rep['config']['dataset'])
    tokz = PhonemeTokenizer(use_g2p=False)
    train_s, held_s = split_sentences(seed=int(opts['seed']),
                                      holdout_frac=opts['holdout'])
    p_toks = tokz(train_s[0] + ' ')
    pcodes = np.ascontiguousarray(synthesize_codes(p_toks, spec_g, 0).T)
    sents = held_s[:args.sentences]
    toks = [jnp.asarray(np.concatenate([p_toks, tokz(s)])) for s in sents]
    pcs = [pcodes] * len(sents)

    def load(spec_k):
        m = ValleAR(dataclasses.replace(conf, num_beams=1, temperature=0.0,
                                        speculative_k=spec_k,
                                        speculative_ngram=args.ngram))
        m.load(rep['runs']['ValleAR']['final_ckpt'])
        return m

    plain = load(0)
    spec = load(args.k)

    def timed(model):
        outs = model.generate_batch(toks, pcs)             # compile
        n_tok = sum(len(o) for o in outs)
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            outs = model.generate_batch(toks, pcs)
            np.asarray(outs[0])
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        return best, n_tok

    t_plain, n_tok = timed(plain)
    t_spec, n_tok2 = timed(spec)
    assert n_tok == n_tok2, 'speculative decode changed greedy outputs'

    # Acceptance statistics over a handful of utterances (bucket-padded so
    # they share one compilation).
    turns_tot, steps_tot = 0, 0
    for s in sents[:8]:
        t, fs = _spec_turns(spec, np.concatenate([p_toks, tokz(s)]), pcodes,
                            pad_to=(64, 96))
        turns_tot += t
        steps_tot += fs
    result = {
        'trained': True, 'n_sentences': len(sents), 'k': args.k,
        'tokens_decoded': n_tok,
        'plain_tok_s': round(n_tok / t_plain, 1),
        'spec_tok_s': round(n_tok / t_spec, 1),
        'speedup': round(t_plain / t_spec, 3),
        'turns': turns_tot, 'steps': steps_tot,
        'mean_accepted': round(steps_tot / max(turns_tot, 1), 2),
    }
    print(f'trained grammar: plain {result["plain_tok_s"]} tok/s, spec '
          f'{result["spec_tok_s"]} tok/s = {result["speedup"]}x; '
          f'{result["mean_accepted"]} accepted/turn '
          f'({steps_tot} steps / {turns_tot} turns)', flush=True)
    print(json.dumps(result), flush=True)
    return result


def _cb_timed(model, tokens, codes, n_sessions: int, steps: int,
              speculative: bool, repeats: int = 3):
    """Best-of-N wall time for N concurrent sessions drained through the
    continuous batcher (join + advance-to-completion; one warm run first)."""
    from ..models.continuous import ContinuousDecoder

    def run():
        cb = ContinuousDecoder(model, n_slots=n_sessions,
                               speculative=speculative)
        slots = [cb.join(tokens, codes) for _ in range(n_sessions)]
        got = 0
        for _ in range(10 * steps):
            out = cb.advance(steps)
            got += sum(len(v) for v in out.values())
            if all(cb.finished(s) for s in slots):
                # Every ignore_eos session decoded exactly ``steps`` tokens;
                # emission may report slightly fewer (advance() strips eos
                # IDS a random-init model can legitimately sample).
                assert got >= n_sessions * (steps - 16), got
                return
        raise AssertionError('batcher did not finish')

    run()                                                  # compile
    best = None
    for _ in range(repeats):
        t0 = time.perf_counter()
        run()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split('\n')[0])
    ap.add_argument('--steps', type=int, default=512)
    ap.add_argument('--k', type=int, default=4)
    ap.add_argument('--ngram', type=int, default=3)
    ap.add_argument('--cb', type=int, default=0, metavar='N',
                    help='continuous-batching mode: drain N concurrent '
                         'sessions through ContinuousDecoder, plain loop vs '
                         'speculative=True, at both acceptance extremes '
                         '(replaces the solo arms)')
    ap.add_argument('--scale', choices=('default', 'large'), default='default')
    ap.add_argument('--temperature', type=float, default=0.0,
                    help='0 = greedy (bit-identical spec); >0 = sampled '
                         '(rejection sampling, distribution-exact — '
                         'acceptance drops to p(draft), so expect fewer '
                         'accepted tokens per turn than greedy)')
    ap.add_argument('--trained-grammar', type=str, default='',
                    metavar='GRAMMAR_TPU.json',
                    help='measure on the production-run TRAINED AR weights '
                         'decoding held-out grammar text (real acceptance, '
                         'not the random-init extremes)')
    ap.add_argument('--sentences', type=int, default=16,
                    help='held-out sentences for --trained-grammar')
    args = ap.parse_args(argv)

    if args.trained_grammar:
        return _trained_grammar(args)

    rs = np.random.RandomState(0)
    tokens = rs.randint(0, 70, (24,))
    codes = rs.randint(0, 1024, (75, 8))
    result: dict = {'steps': args.steps, 'k': args.k, 'scale': args.scale}

    if args.cb:
        # Continuous-batching A/B: N sessions drained jointly, plain
        # one-token loop vs speculative verify turns, same weights.
        n = args.cb
        result['cb_sessions'] = n
        for arm, dom in (('natural', None), ('repetitive', 7)):
            base = _model(args.scale, args.steps, dominant=dom,
                          temperature=args.temperature, ngram=args.ngram)
            t_plain = _cb_timed(base, tokens, codes, n, args.steps, False)
            spec = _model(args.scale, args.steps, spec_k=args.k, dominant=dom,
                          temperature=args.temperature, ngram=args.ngram)
            spec.params = base.params
            t_spec = _cb_timed(spec, tokens, codes, n, args.steps, True)
            result[f'cb_{arm}'] = {
                'plain_tok_s': round(n * args.steps / t_plain, 1),
                'spec_tok_s': round(n * args.steps / t_spec, 1),
                'speedup': round(t_plain / t_spec, 2),
            }
            print(f'cb[{arm}] x{n}: plain {t_plain * 1e3:.1f} ms '
                  f'({result[f"cb_{arm}"]["plain_tok_s"]} tok/s) vs spec '
                  f'{t_spec * 1e3:.1f} ms '
                  f'({result[f"cb_{arm}"]["spec_tok_s"]} tok/s) = '
                  f'{result[f"cb_{arm}"]["speedup"]}x', flush=True)
        print(json.dumps(result), flush=True)
        return result

    plain = _model(args.scale, args.steps, temperature=args.temperature)
    t_plain = _decode_timed(plain, tokens, codes)
    result['plain_tok_s'] = round(args.steps / t_plain, 1)
    print(f'plain greedy: {t_plain * 1e3:.1f} ms '
          f'({result["plain_tok_s"]} tok/s)', flush=True)

    for arm, dom in (('natural', None), ('repetitive', 7)):
        spec = _model(args.scale, args.steps, spec_k=args.k, dominant=dom,
                      temperature=args.temperature, ngram=args.ngram)
        t = _decode_timed(spec, tokens, codes)
        turns, final_step = _spec_turns(spec, tokens, codes)
        assert final_step == args.steps, (arm, final_step)
        result[arm] = {
            'tok_s': round(args.steps / t, 1),
            'speedup': round(t_plain / t, 2),
            'turns': turns,
            'mean_accepted': round(args.steps / turns, 2),
        }
        print(f'{arm}: {t * 1e3:.1f} ms ({result[arm]["tok_s"]} tok/s, '
              f'{result[arm]["speedup"]}x), {turns} turns, '
              f'{result[arm]["mean_accepted"]} accepted/turn', flush=True)

    # Cost per verify turn vs cost per plain step — the break-even acceptance
    # rate (speedup = mean_accepted / this ratio).
    nat = result['natural']
    if nat['turns']:
        spec_wall = args.steps / nat['tok_s']
        result['cost_per_turn_vs_step'] = round(
            (spec_wall / nat['turns']) / (t_plain / args.steps), 2)
    print(json.dumps(result), flush=True)
    return result


if __name__ == '__main__':
    main()
