"""Aggregate AR streaming throughput on the real TPU: N concurrent sessions
via (a) today's serving path — N independent batch-1 DecodeStreams advanced
round-robin — vs (b) the continuous batcher (one shared rows=N program).

Default scale, bf16, num_beams=1, ignore_eos (fixed 512-step decodes),
geometry ttm=pm=128, chunk advance = 25 frames (the serve.py streaming chunk
scale).  Prints one JSON line per arm.
"""
import json
import os
import sys
import time

os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/tmp/jax_cache_tpu')

import numpy as np
import jax

from valle2_tpu.compile_cache import enable_compilation_cache
from valle2_tpu.config import ConfigValle
from valle2_tpu.models.ar import DecodeStream, ValleAR
from valle2_tpu.models.continuous import ContinuousDecoder

enable_compilation_cache('/tmp/jax_cache_tpu')

N = int(sys.argv[1]) if len(sys.argv) > 1 else 4
STEPS = 512
CHUNK = 25

cfg = ConfigValle(dtype='bfloat16', temperature=0.0, num_beams=1,
                  max_audio_len=STEPS, ignore_eos=True)
model = ValleAR(cfg, seed=0)
rs = np.random.RandomState(0)
prompts = [(rs.randint(0, 70, (24,)), rs.randint(0, 1024, (75, 8)))
           for _ in range(N)]


def run_solo():
    streams = [DecodeStream(model, t, c) for t, c in prompts]
    while not all(s.finished for s in streams):
        for s in streams:
            if not s.finished:
                s.advance(CHUNK)
    return sum(s.steps_done for s in streams)


def run_cb():
    cb = ContinuousDecoder(model, n_slots=N, ttm=128, pm=128)
    slots = [cb.join(t, c) for t, c in prompts]
    while not all(cb.finished(s) for s in slots):
        cb.advance(CHUNK)
    return N * STEPS


for name, fn in (('solo_streams', run_solo), ('continuous', run_cb)):
    t0 = time.perf_counter()
    tok = fn()                      # first run: compiles
    t_compile = time.perf_counter() - t0
    t0 = time.perf_counter()
    tok = fn()                      # measurement
    wall = time.perf_counter() - t0
    print(json.dumps({'arm': name, 'n_sessions': N, 'steps': STEPS,
                      'first_run_s': round(t_compile, 1),
                      'wall_s': round(wall, 3),
                      'agg_tok_per_s': round(tok / wall, 1)}), flush=True)
