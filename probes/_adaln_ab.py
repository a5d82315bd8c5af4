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
    """Alternating A/B rounds; each arm is REBUILT per round (holding both
    arms' states at once OOMs the chip at 204M — two full f32 opt states).
    Compiles cache after the first build, so rebuilds cost only init."""
    best = {False: 1e9, True: 1e9}
    for _round in range(3):
        for fused in (False, True):
            step, state, data, rng = build_step(batch, frames, fused, **kw)
            t, _ = measure(step, state, data, rng, reps=2)
            best[fused] = min(best[fused], t)
            del step, state, data
    speedup = best[False] / best[True]
    print(f'{tag}: jnp {best[False]*1e3:.2f} ms | fused {best[True]*1e3:.2f} ms '
          f'| fused speedup {speedup:.3f}x', flush=True)
    return speedup


def main():
    # One scale per process: the two scales back to back exhausted HBM
    # (fragmentation across rebuilt 204M states in one process).
    print('devices:', jax.devices(), file=sys.stderr, flush=True)
    scale = sys.argv[1] if len(sys.argv) > 1 else 'default'
    if scale == 'default':
        ab('default (b=32, f=512)', 32, 512)
    else:
        ab('204M (b=8, f=512)', 8, 512, d_model=1024, num_layers=16,
           n_heads=16, dim_feedforward=4096)


if __name__ == '__main__':
    main()
