"""204M decode: int4 W4A16 vs int8 W8A8 vs dense, XLA and fused-kernel paths.

Same setup as BENCHMARKS.md's "Fused decode at 204M" table (beams=1, 256
steps, bucket=False, warm same-process arms) with the two quantized weight
modes side by side.  int4 quarters the streamed weight bytes; the question is
whether the dequant VPU work (plane shifts + group rescale) eats the
bandwidth win at this scale.  Prints one JSON line per arm.
"""
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

enable_compilation_cache('/tmp/jax_cache_tpu')

STEPS = 256
REPEATS = 5

base = ConfigValle(d_model=1024, n_heads=16, dim_feedforward=4096,
                   num_layers=16, dtype='bfloat16', temperature=0.0,
                   num_beams=1, max_audio_len=STEPS, ignore_eos=True,
                   dropout=0.0)
rs = np.random.RandomState(0)
prompt_t = rs.randint(0, 70, (64,))
prompt_c = rs.randint(0, 1024, (150, 8)).astype(np.int32)

ref = ValleAR(base, seed=0)          # one param init shared across arms
params = ref.params


def arm(name: str, **over):
    cfg = dataclasses.replace(base, **over)
    model = ValleAR(cfg, params=params)
    t0 = time.perf_counter()
    model.generate(prompt_t, prompt_c, bucket=False)
    compile_s = time.perf_counter() - t0
    times = []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        model.generate(prompt_t, prompt_c, bucket=False)
        times.append(time.perf_counter() - t0)
    us_per_step = min(times) / STEPS * 1e6
    print(json.dumps({'arm': name, 'us_per_step': round(us_per_step, 1),
                      'compile_s': round(compile_s, 1)}), flush=True)
    return us_per_step


print(json.dumps({'backend': jax.default_backend(),
                  'device': str(jax.devices()[0])}), flush=True)

dense_xla = arm('xla_dense', use_fused_decode=False)
int8_xla = arm('xla_int8', use_fused_decode=False, weight_dtype='int8')
int4_xla = arm('xla_int4', use_fused_decode=False, weight_dtype='int4')
dense_f = arm('fused_dense', use_fused_decode=True)
int8_f = arm('fused_int8', use_fused_decode=True, weight_dtype='int8')
int4_f = arm('fused_int4', use_fused_decode=True, weight_dtype='int4')

print(json.dumps({'summary': {
    'xla': {'dense': round(dense_xla, 1), 'int8': round(int8_xla, 1),
            'int4': round(int4_xla, 1)},
    'fused': {'dense': round(dense_f, 1), 'int8': round(int8_f, 1),
              'int4': round(int4_f, 1)},
    'int4_vs_dense_fused': round(dense_f / int4_f, 2),
    'int4_vs_int8_fused': round(int8_f / int4_f, 2)}}), flush=True)
