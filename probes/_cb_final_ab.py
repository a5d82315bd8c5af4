"""Same-process A/B: aggregate streaming tokens/s for N concurrent sessions.
Arms: solo DecodeStreams (round-robin, fused kernel), CB unfused (XLA path),
CB fused (per-row kernel).  Default scale, bf16, 512 fixed steps, chunk 25."""
import dataclasses
import json
import os
import time

os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/tmp/jax_cache_tpu')
import numpy as np
import jax

from valle2_tpu.compile_cache import enable_compilation_cache
from valle2_tpu.config import ConfigValle
from valle2_tpu.models.ar import DecodeStream, ValleAR
from valle2_tpu.models.continuous import ContinuousDecoder

enable_compilation_cache('/tmp/jax_cache_tpu')

STEPS, CHUNK = 512, 25
rs = np.random.RandomState(0)
ALL_PROMPTS = [(rs.randint(0, 70, (24,)), rs.randint(0, 1024, (75, 8)))
               for _ in range(8)]

base = ConfigValle(dtype='bfloat16', temperature=0.0, num_beams=1,
                   max_audio_len=STEPS, ignore_eos=True)
model_fused = ValleAR(base, seed=0)
model_xla = ValleAR(dataclasses.replace(base, use_fused_decode=False), seed=0)


def solo(n):
    streams = [DecodeStream(model_fused, t, c) for t, c in ALL_PROMPTS[:n]]
    while not all(s.finished for s in streams):
        for s in streams:
            if not s.finished:
                s.advance(CHUNK)
    return n * STEPS


def cb(n, model):
    d = ContinuousDecoder(model, n_slots=n, ttm=128, pm=128)
    slots = [d.join(t, c) for t, c in ALL_PROMPTS[:n]]
    while not all(d.finished(s) for s in slots):
        d.advance(CHUNK)
    return n * STEPS


ARMS = [('solo_streams', 4, lambda: solo(4)),
        ('cb_xla', 4, lambda: cb(4, model_xla)),
        ('cb_fused', 4, lambda: cb(4, model_fused)),
        ('solo_streams', 8, lambda: solo(8)),
        ('cb_fused', 8, lambda: cb(8, model_fused))]

for name, n, fn in ARMS:
    fn()                                 # warm (compile)
    best = None
    for _ in range(2):
        t0 = time.perf_counter()
        tok = fn()
        dt = time.perf_counter() - t0
        best = min(best, dt) if best else dt
    print(json.dumps({'arm': name, 'n': n, 'wall_s': round(best, 2),
                      'agg_tok_per_s': round(tok / best, 1)}), flush=True)
