"""Concurrent streaming benchmark: aggregate WAVEFORM throughput for N
simultaneous sessions, comparing the serving arms on the real chip:

    python -m valle2_tpu.tools.hub_bench [--sessions 4] [--steps 128]
        [--arms solo,hub,hub-solo-nar]

- ``solo``: N threads each driving ``synthesize_streaming`` (one DecodeStream
  + one batch-1 NAR refine per chunk per session) — the pre-hub serving path.
- ``hub-solo-nar``: StreamHub with ``batched_nar=False`` — AR decode batched
  (one joint loop), NAR refinement still one batch-1 dispatch per session per
  chunk from its handler thread.
- ``hub``: StreamHub default — AR batched AND all due sessions' NAR refines
  in ONE joint dispatch per chunk.
- ``hub-spec``: the hub decoding via speculative verify turns
  (``speculative=True``, ``--spec-k``) — random-init weights put this at the
  n-gram acceptance floor, so it measures the verify turns' pure overhead.

Reports per-arm wall time, aggregate frames/s, and audio-seconds/s (RTF⁻¹).
Each arm runs once to compile, then ``--repeats`` timed runs (best kept).
Results recorded in BENCHMARKS.md "Continuous batching".

No reference counterpart (the reference has no serving/streaming; its
inference is a host-driven batch-1 loop, valle_ar.py:141-171).
"""
from __future__ import annotations

import argparse
import json
import threading
import time

import numpy as np

FRAME_S = 320.0 / 24000.0     # seconds of audio per codec frame


def _tts(steps: int, spec_k: int = 0):
    from ..config import ConfigValle
    from ..tts import ValleTTS
    return ValleTTS(ConfigValle(dtype='bfloat16', temperature=0.0,
                                num_beams=1, max_audio_len=steps,
                                ignore_eos=True, dropout=0.0,
                                speculative_k=spec_k))


def _prompts(n: int):
    rs = np.random.RandomState(0)
    return [(rs.randint(0, 70, (24,)), rs.randint(0, 1024, (75, 8)))
            for _ in range(n)]


def _drain_concurrent(streams):
    """Consume every generator on its own thread (the serving pattern);
    returns (total samples, worst per-session time-to-first-audio in s,
    measured from drain start — prefill/join happened at open())."""
    totals = [0] * len(streams)
    ttfa = [None] * len(streams)
    errs: list = []
    t0 = time.perf_counter()

    def run(i, gen):
        try:
            for wav in gen:
                if ttfa[i] is None:
                    ttfa[i] = time.perf_counter() - t0
                totals[i] += len(np.asarray(wav))
        except Exception as e:              # noqa: BLE001
            errs.append(e)

    threads = [threading.Thread(target=run, args=(i, g))
               for i, g in enumerate(streams)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    if errs:
        raise errs[0]
    got = [x for x in ttfa if x is not None]
    if not got:
        raise RuntimeError('no session produced any audio (hub failed all '
                           'sessions without raising?)')
    return sum(totals), max(got)


def _timed(once, repeats: int):
    once()                                   # compile
    best = best_ttfa = None
    for _ in range(repeats):
        t0 = time.perf_counter()
        _, ttfa = once()
        dt = time.perf_counter() - t0
        if best is None or dt < best:
            best, best_ttfa = dt, ttfa
    return best, best_ttfa


def bench_solo(tts, prompts, chunk: int, repeats: int):
    return _timed(lambda: _drain_concurrent([
        tts.synthesize_streaming('hello there.', pt, pc, chunk_frames=chunk)
        for pt, pc in prompts]), repeats)


def bench_hub(tts, prompts, chunk: int, repeats: int, batched_nar: bool,
              speculative: bool = False):
    from ..stream_hub import StreamHub
    hub = StreamHub(tts, n_slots=len(prompts), chunk_frames=chunk,
                    batched_nar=batched_nar, speculative=speculative)
    try:
        return _timed(lambda: _drain_concurrent([
            hub.open('hello there.', pt, pc) for pt, pc in prompts]), repeats)
    finally:
        hub.stop()


def bench_trained(run_dir, sessions: int, chunk: int, rounds: int,
                  temperature: float, seed: int = 0) -> dict:
    """Serving latency under load with TRAINED weights and REAL EOS lengths
    (VERDICT r4 Next #6 — the random-init numbers had artificial utterance
    lengths and EOS never fired).

    N concurrent sessions stream held-out grammar sentences through the
    StreamHub (batched AR + batched NAR), each with a cloning prompt in its
    own speaker's voice, sampled at ``temperature``.  Reports p50/p99
    time-to-first-chunk, steady-state chunk cadence (inter-chunk gap), per-
    session EOS'd utterance lengths, and per-session text exactness (the
    collected codebook-0 stream vs the grammar ground truth)."""
    import dataclasses
    import json as _json
    from pathlib import Path

    import jax

    from ..config import ConfigValle
    from ..data.frontend import PhonemeTokenizer
    from ..data.grammar import (build_grammar_datasets, parse_grammar_dataset,
                                split_sentences, synthesize_codes)
    from ..models.ar import ValleAR
    from ..models.nar import ValleNAR
    from ..stream_hub import StreamHub
    from ..tts import ValleTTS

    report = _json.loads((Path(run_dir) / 'report.json').read_text())
    cfg = ConfigValle.from_dict(report['config'])
    cfg = dataclasses.replace(cfg, temperature=temperature, num_beams=1,
                              dropout=0.0, ignore_eos=False)
    ar = ValleAR(cfg)
    ar.load(report['runs']['ValleAR']['final_ckpt'])
    nar = ValleNAR(dataclasses.replace(cfg, norm='AdaptiveLayerNorm'))
    nar.load(report['runs']['ValleNAR']['final_ckpt'])
    tok = PhonemeTokenizer(use_g2p=False)
    tts = ValleTTS(cfg, ar=ar, nar=nar, tokenizer=tok)
    _, _, spec = build_grammar_datasets(cfg)
    opts = parse_grammar_dataset(report['config']['dataset'])
    train_s, held_s = split_sentences(seed=int(opts['seed']),
                                      holdout_frac=opts['holdout'])
    p_toks = tok(train_s[0] + ' ')

    def prompt_for(spk: int) -> np.ndarray:
        if spec.num_variants > 1:
            from ..data.grammar import sample_realization
            pc, _ = sample_realization(p_toks, spec, spk,
                                       np.random.RandomState(777 + spk))
            return np.ascontiguousarray(pc.T)
        return np.ascontiguousarray(synthesize_codes(p_toks, spec, spk).T)

    jobs = []                      # (sentence, speaker, prompt_codes (Tp, nq))
    for i in range(sessions):
        spk = i % max(spec.num_speakers, 1)
        jobs.append((held_s[i % len(held_s)], spk, prompt_for(spk)))

    hub = StreamHub(tts, n_slots=sessions, chunk_frames=chunk)
    ttfas: list[float] = []
    gaps: list[float] = []
    exact: list[bool] = []
    lengths: list[int] = []
    walls: list[float] = []
    try:
        for rd in range(rounds + 1):          # round 0 = compile warmup
            sinks: list[list] = [[] for _ in jobs]
            gens = [hub.open(s, p_toks, pc, rng=jax.random.key(seed + 31 * rd + i),
                             codes_sink=sinks[i])
                    for i, (s, _, pc) in enumerate(jobs)]
            t0 = time.perf_counter()
            rtt, rgaps = [None] * len(gens), [[] for _ in gens]
            errs: list = []

            def run(i, gen):
                try:
                    last = None
                    for _wav in gen:
                        now = time.perf_counter()
                        if rtt[i] is None:
                            rtt[i] = now - t0
                        else:
                            rgaps[i].append(now - last)
                        last = now
                except Exception as e:          # noqa: BLE001
                    errs.append(e)

            threads = [threading.Thread(target=run, args=(i, g))
                       for i, g in enumerate(gens)]
            for t in threads:
                t.start()
            for t in threads:
                t.join()
            if errs:
                raise errs[0]
            if rd == 0:
                continue                       # discard the compile round
            walls.append(time.perf_counter() - t0)
            ttfas.extend(x for x in rtt if x is not None)
            for g in rgaps:
                gaps.extend(g)
            for (s, spk, _), sink in zip(jobs, sinks):
                got = np.concatenate(sink) if sink else np.zeros(0, np.int32)
                lengths.append(int(len(got)))
                if spec.num_variants > 1:
                    # v3 grammar: one-to-many acoustics — score parse
                    # VALIDITY instead of exact match.
                    from ..data.grammar import parse_codes0
                    exact.append(bool(parse_codes0(got, tok(s), spec,
                                                   spk)['valid']))
                else:
                    want = synthesize_codes(tok(s), spec, spk)[0]
                    exact.append(len(got) == len(want)
                                 and bool(np.array_equal(got, want)))
    finally:
        hub.stop()

    pct = lambda a, q: float(np.percentile(np.asarray(a), q)) if a else None  # noqa: E731
    frames = float(np.mean(lengths)) * sessions if lengths else 0.0
    wall = float(np.median(walls)) if walls else None
    return {
        'sessions': sessions, 'chunk': chunk, 'rounds': rounds,
        'temperature': temperature,
        'ttfa_p50_s': pct(ttfas, 50), 'ttfa_p99_s': pct(ttfas, 99),
        'chunk_gap_p50_s': pct(gaps, 50), 'chunk_gap_p99_s': pct(gaps, 99),
        'mean_utterance_frames': float(np.mean(lengths)) if lengths else None,
        'session_exact': float(np.mean(exact)) if exact else None,
        'wall_s': wall,
        'audio_s_per_s': round(frames * FRAME_S / wall, 2) if wall else None,
    }


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split('\n')[0])
    ap.add_argument('--sessions', type=int, default=4)
    ap.add_argument('--steps', type=int, default=128)
    ap.add_argument('--chunk', type=int, default=25)
    ap.add_argument('--repeats', type=int, default=3)
    ap.add_argument('--arms', default='solo,hub-solo-nar,hub')
    ap.add_argument('--spec-k', type=int, default=4,
                    help='speculative_k for the hub-spec arm')
    ap.add_argument('--trained', default=None, metavar='RUN_DIR',
                    help='trained-weights mode: stream held-out grammar '
                         'sentences with real EOS through the hub from this '
                         'run dir (e.g. runs/grammar_tpu); reports p50/p99 '
                         'TTFA + cadence + per-session exactness')
    ap.add_argument('--temperature', type=float, default=0.7)
    args = ap.parse_args(argv)

    if args.trained:
        result = bench_trained(args.trained, args.sessions, args.chunk,
                               args.repeats, args.temperature)
        print(json.dumps(result), flush=True)
        return result

    tts = _tts(args.steps)
    prompts = _prompts(args.sessions)
    frames = args.sessions * args.steps
    result: dict = {'sessions': args.sessions, 'steps': args.steps,
                    'chunk': args.chunk}
    for arm in args.arms.split(','):
        t0 = time.perf_counter()
        if arm == 'solo':
            dt, ttfa = bench_solo(tts, prompts, args.chunk, args.repeats)
        elif arm == 'hub':
            dt, ttfa = bench_hub(tts, prompts, args.chunk, args.repeats, True)
        elif arm == 'hub-solo-nar':
            dt, ttfa = bench_hub(tts, prompts, args.chunk, args.repeats, False)
        elif arm == 'hub-spec':
            # Speculative hub at the acceptance FLOOR: random-init weights
            # produce non-repetitive streams, so this measures the verify
            # turns' pure overhead; real repetitive content scales it up
            # (spec_bench measures the acceptance axis ends).
            dt, ttfa = bench_hub(_tts(args.steps, args.spec_k), prompts,
                                 args.chunk, args.repeats, True,
                                 speculative=True)
        else:
            raise SystemExit(f'unknown arm {arm!r}')
        result[arm] = {
            'wall_s': round(dt, 3),
            'frames_per_s': round(frames / dt, 1),
            'audio_s_per_s': round(frames * FRAME_S / dt, 2),
            'worst_ttfa_s': round(ttfa, 3),
        }
        print(f'{arm}: {dt:.2f} s for {frames} frames '
              f'({result[arm]["frames_per_s"]} frames/s aggregate, '
              f'{result[arm]["audio_s_per_s"]}x real time, worst TTFA '
              f'{ttfa * 1e3:.0f} ms; compile+bench total '
              f'{time.perf_counter() - t0:.0f} s)',
              flush=True)
    if 'solo' in result and 'hub' in result:
        result['hub_vs_solo'] = round(
            result['solo']['wall_s'] / result['hub']['wall_s'], 2)
        print(f"hub vs solo: {result['hub_vs_solo']}x", flush=True)
    print(json.dumps(result), flush=True)
    return result


if __name__ == '__main__':
    main()
