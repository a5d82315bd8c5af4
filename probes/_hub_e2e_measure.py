"""End-to-end concurrent STREAMING measurement (AR + per-chunk NAR + codec):
N sessions via (a) solo synthesize_streaming in N threads (today's
max_streams path) vs (b) StreamHub continuous batching.  Reports wall time,
aggregate audio-seconds/s, and per-session time-to-first-audio."""
import json
import os
import sys
import threading
import time

os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/tmp/jax_cache_tpu')
import numpy as np
import jax

from valle2_tpu.compile_cache import enable_compilation_cache
from valle2_tpu.config import ConfigValle
from valle2_tpu.stream_hub import StreamHub
from valle2_tpu.tts import ValleTTS

enable_compilation_cache('/tmp/jax_cache_tpu')

N = int(sys.argv[1]) if len(sys.argv) > 1 else 4
STEPS, CHUNK = 512, 25

cfg = ConfigValle(dtype='bfloat16', temperature=0.0, num_beams=1,
                  max_audio_len=STEPS, ignore_eos=True)
tts = ValleTTS(cfg)
rs = np.random.RandomState(0)
prompts = [(rs.randint(0, 70, (24,)), rs.randint(0, 1024, (75, 8)))
           for _ in range(N)]
TEXT = 'the quick brown fox jumps over the lazy dog.'


def run_threads(make_gen):
    ttfa = [None] * N
    audio = [0.0] * N
    errs = []

    def worker(i):
        try:
            t0 = time.perf_counter()
            for chunk in make_gen(i):
                if ttfa[i] is None:
                    ttfa[i] = time.perf_counter() - t0
                audio[i] += len(chunk) / 24000.0
        except Exception as e:      # noqa: BLE001
            errs.append(repr(e))

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(N)]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    assert not errs, errs
    return wall, sum(audio), ttfa


def solo_gen(i):
    pt, pc = prompts[i]
    return tts.synthesize_streaming(TEXT, pt, pc, chunk_frames=CHUNK)


hub = None


def hub_gen(i):
    pt, pc = prompts[i]
    return hub.open(TEXT, pt, pc)


for name in ('solo', 'hub'):
    if name == 'hub':
        hub = StreamHub(tts, n_slots=N, chunk_frames=CHUNK)
    gen = solo_gen if name == 'solo' else hub_gen
    run_threads(gen)                      # warm
    wall, audio, ttfa = run_threads(gen)  # measure
    print(json.dumps({
        'arm': name, 'n': N,
        'wall_s': round(wall, 2),
        'audio_s_per_s': round(audio / wall, 2),
        'ttfa_ms_median': round(sorted(ttfa)[N // 2] * 1e3, 0),
        'ttfa_ms_max': round(max(ttfa) * 1e3, 0)}), flush=True)
if hub is not None:
    hub.stop()
