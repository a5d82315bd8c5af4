"""Per-advance(25) wall time of the continuous batcher, fused kernel vs XLA
path, N=4 rows, default scale, bf16, max_audio_len=512."""
import dataclasses
import json
import os
import time

os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/tmp/jax_cache_tpu')
import numpy as np
import jax

from valle2_tpu.compile_cache import enable_compilation_cache
from valle2_tpu.config import ConfigValle
from valle2_tpu.models.ar import ValleAR
from valle2_tpu.models.continuous import ContinuousDecoder

enable_compilation_cache('/tmp/jax_cache_tpu')

rs = np.random.RandomState(0)
prompts = [(rs.randint(0, 70, (24,)), rs.randint(0, 1024, (75, 8)))
           for _ in range(4)]

for fused in (False, True):
    cfg = ConfigValle(dtype='bfloat16', temperature=0.0, num_beams=1,
                      max_audio_len=512, ignore_eos=True,
                      use_fused_decode=fused)
    model = ValleAR(cfg, seed=0)
    cb = ContinuousDecoder(model, n_slots=4, ttm=128, pm=128)
    assert cb._use_fused == fused, (fused, cb._use_fused)
    for t, c in prompts:
        cb.join(t, c)
    t0 = time.perf_counter()
    cb.advance(25)
    warm = time.perf_counter() - t0
    times = []
    for _ in range(10):
        t0 = time.perf_counter()
        cb.advance(25)
        times.append(time.perf_counter() - t0)
    print(json.dumps({'fused': fused, 'first_advance_s': round(warm, 1),
                      'advance25_ms_median': round(
                          sorted(times)[5] * 1e3, 1),
                      'advance25_ms_min': round(min(times) * 1e3, 1)}),
          flush=True)
