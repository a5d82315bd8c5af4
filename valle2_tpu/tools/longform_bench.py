"""Long-form synthesis benchmark: one unbounded-text document, comparing the
sequential solo path against hub-pipelined sentence decode on the real chip:

    python -m valle2_tpu.tools.longform_bench [--sentences 6] [--steps 128]
        [--arms solo-prompt,solo-chain,hub]

- ``solo-prompt``: ``synthesize_longform(carry='prompt')`` — sentences decode
  back to back; each boundary pays a full prefill before any new audio.
- ``solo-chain``: ``carry='chain'`` — same cadence plus the chained prompt
  (longer prefill, prosodic continuity).
- ``hub``: ``StreamHub.open_longform`` — up to ``--inflight`` sentences decode
  CONCURRENTLY in the shared continuous-batching loop while the current one's
  audio streams out, hiding sentence-boundary prefills.

Reports per-arm wall time, document RTF (wall / audio seconds), and
time-to-first-audio.  ``ignore_eos`` pins every sentence at ``--steps`` frames
so the work is identical across arms.  Each arm runs once to compile, then
``--repeats`` timed runs (best kept).  Results: BENCHMARKS.md "Long-form".

No reference counterpart (the reference has no serving, streaming, or
long-form path; its generate is one bounded host loop, valle_ar.py:92-180).
"""
from __future__ import annotations

import argparse
import json
import time

import numpy as np

FRAME_S = 320.0 / 24000.0     # seconds of audio per codec frame


def _tts(steps: int):
    from ..config import ConfigValle
    from ..tts import ValleTTS
    return ValleTTS(ConfigValle(dtype='bfloat16', temperature=0.0,
                                num_beams=1, max_audio_len=steps,
                                ignore_eos=True, dropout=0.0))


def _prompt():
    rs = np.random.RandomState(0)
    return rs.randint(0, 70, (24,)), rs.randint(0, 1024, (75, 8))


def _drain(gen):
    """Consume a waveform-chunk generator in order (the client pattern);
    returns (total samples, time-to-first-audio in s from drain start)."""
    total, ttfa = 0, None
    t0 = time.perf_counter()
    for wav in gen:
        if ttfa is None:
            ttfa = time.perf_counter() - t0
        total += len(np.asarray(wav))
    if ttfa is None:
        raise RuntimeError('no audio produced')
    return total, ttfa


def _timed(once, repeats: int):
    once()                                   # compile
    best = best_ttfa = samples = None
    for _ in range(repeats):
        t0 = time.perf_counter()
        samples, ttfa = once()
        dt = time.perf_counter() - t0
        if best is None or dt < best:
            best, best_ttfa = dt, ttfa
    return best, best_ttfa, samples


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split('\n')[0])
    ap.add_argument('--sentences', type=int, default=6)
    ap.add_argument('--steps', type=int, default=128,
                    help='frames per sentence (ignore_eos pins the length)')
    ap.add_argument('--chunk', type=int, default=25)
    ap.add_argument('--inflight', type=int, default=2)
    ap.add_argument('--slots', type=int, default=0,
                    help='hub rows (default: inflight)')
    ap.add_argument('--repeats', type=int, default=3)
    ap.add_argument('--arms', default='solo-prompt,solo-chain,hub')
    args = ap.parse_args(argv)

    tts = _tts(args.steps)
    pt, pc = _prompt()
    text = ' '.join('the quick brown fox jumps over the lazy dog.'
                    for _ in range(args.sentences))
    result: dict = {'sentences': args.sentences, 'steps': args.steps,
                    'chunk': args.chunk, 'inflight': args.inflight}
    for arm in args.arms.split(','):
        t0 = time.perf_counter()
        if arm == 'solo-prompt':
            dt, ttfa, samples = _timed(lambda: _drain(
                tts.synthesize_longform(text, pt, pc, carry='prompt',
                                        chunk_frames=args.chunk)),
                args.repeats)
        elif arm == 'solo-chain':
            dt, ttfa, samples = _timed(lambda: _drain(
                tts.synthesize_longform(text, pt, pc, carry='chain',
                                        chunk_frames=args.chunk)),
                args.repeats)
        elif arm == 'hub':
            from ..stream_hub import StreamHub
            hub = StreamHub(tts, n_slots=args.slots or args.inflight,
                            chunk_frames=args.chunk)
            try:
                dt, ttfa, samples = _timed(lambda: _drain(
                    hub.open_longform(text, pt, pc,
                                      max_inflight=args.inflight)),
                    args.repeats)
                result['hub_prefetched'] = hub.longform_prefetched
            finally:
                hub.stop()
        else:
            raise SystemExit(f'unknown arm {arm!r}')
        audio_s = samples / 24000.0
        result[arm] = {
            'wall_s': round(dt, 3),
            'audio_s': round(audio_s, 2),
            'rtf': round(dt / audio_s, 4),
            'ttfa_s': round(ttfa, 3),
        }
        print(f'{arm}: {dt:.2f} s for {audio_s:.1f} s of audio '
              f'(RTF {result[arm]["rtf"]}, TTFA {ttfa * 1e3:.0f} ms; '
              f'compile+bench total {time.perf_counter() - t0:.0f} s)',
              flush=True)
    if 'solo-prompt' in result and 'hub' in result:
        result['hub_vs_solo'] = round(
            result['solo-prompt']['wall_s'] / result['hub']['wall_s'], 2)
        print(f"hub vs solo-prompt: {result['hub_vs_solo']}x", flush=True)
    print(json.dumps(result), flush=True)
    return result


if __name__ == '__main__':
    main()
