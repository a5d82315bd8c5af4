"""A/B the fused AdaLN Pallas kernel inside the REAL NAR train step (r4,
VERDICT item 3 / weak #3): same process, interleaved arms (runtime drifts
hour-to-hour — NOTES.md), default scale + 204M.

The flag is read at trace time (ops/nn.adaln), so each arm builds its own
step in a subprocess-free way: set the env var, build, run.  Run on the TPU:

    python probes/_adaln_ab.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/tmp/jax_cache_tpu')

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)


def build_step(batch, frames, fused: bool, **kw):
    from valle2_tpu.config import ConfigValle
    from valle2_tpu.train import init_state, make_train_step
    os.environ['VALLE2_FUSED_ADALN'] = '1' if fused else '0'
    config = ConfigValle(dropout=0.1, batch_size=batch, dtype='bfloat16',
                         norm='AdaptiveLayerNorm', **kw)
    state = init_state(config, 'ValleNAR', jax.random.key(0))
    step = make_train_step(config, 'ValleNAR')
    rs = np.random.RandomState(0)
    data = {
        'tokens': jnp.asarray(rs.randint(0, 256, (batch, frames // 4)), jnp.int32),
        'tokens_lens': jnp.asarray([frames // 4] * batch),
        'codes': jnp.asarray(rs.randint(0, 1024, (batch, frames, 8)), jnp.int32),
        'codes_lens': jnp.asarray([frames] * batch),
    }
    rng = jax.random.key(1, impl=config.train_rng_impl)
    state, m = step(state, data, rng)          # compile
    _ = np.asarray(m['loss'])
    return step, state, data, rng


def measure(step, state, data, rng, n_chain=8, reps=4):
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _k in range(n_chain):
            state, m = step(state, data, rng)
        _ = np.asarray(m['loss'])
        times.append((time.perf_counter() - t0) / n_chain)
    return min(times), state


def ab(tag, batch, frames, **kw):
    arms = {}
    for fused in (False, True):
        arms[fused] = build_step(batch, frames, fused, **kw)
    # Interleave the measurement rounds A/B/A/B.
    best = {False: 1e9, True: 1e9}
    for _round in range(3):
        for fused in (False, True):
            step, state, data, rng = arms[fused]
            t, state = measure(step, state, data, rng, reps=2)
            arms[fused] = (step, state, data, rng)
            best[fused] = min(best[fused], t)
    speedup = best[False] / best[True]
    print(f'{tag}: jnp {best[False]*1e3:.2f} ms | fused {best[True]*1e3:.2f} ms '
          f'| fused speedup {speedup:.3f}x', flush=True)
    return speedup


def main():
    print('devices:', jax.devices(), file=sys.stderr, flush=True)
    s1 = ab('default (b=32, f=512)', 32, 512)
    s2 = ab('204M (b=16, f=512)', 16, 512, d_model=1024, num_layers=16,
            n_heads=16, dim_feedforward=4096)
    print(f'VERDICT-input: default {s1:.3f}x, 204M {s2:.3f}x')


if __name__ == '__main__':
    main()
