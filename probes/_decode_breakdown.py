"""Fused-era decode-step breakdown (VERDICT r4 Next #5).

6338 useful tok/s at the default scale = ~158 us per 4-row fused step.
NOTES.md's pre-fused decomposition (weights ~7 us VMEM-resident, attention
~27 us) predates the whole-stack kernel; this probe re-measures the
components AT the fused-era shapes by timing isolated ``lax.fori_loop``s of
each piece on-chip (512 iterations, medians of 5, np.asarray sync — the
axon runtime ignores block_until_ready):

  turn      — empty fori body: pure loop-turn cost
  kernel    — fused_decode_step only (cache carried, step index varying)
  sampling  — topk_sampling on carried (4, 257) logits
  embed     — token embedding + positional add (4 rows)
  proj      — LM head (4, 256) @ (256, 257) in f32
  codewrite — dynamic_update_slice of the sampled column

The full loop is NOT the sum of isolated arms (XLA overlaps/fuses across
them inside one body), so the report shows sum-vs-full as the fusion gap:
full >> sum would mean per-step dead time (dispatch/dependency stalls);
full ~= max(kernel, rest) would mean good overlap.

Run on the TPU:  PYTHONPATH=. python probes/_decode_breakdown.py
"""

import json
import os
import sys
import time

os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/tmp/jax_cache_tpu')

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from valle2_tpu.config import ConfigValle
from valle2_tpu.models import ar as ar_mod
from valle2_tpu.models.ar import ValleAR
from valle2_tpu.ops.sampling import topk_sampling
from valle2_tpu.ops.nn import embedding, linear
from valle2_tpu.ops import sinusoidal_table

STEPS = 512
REPEATS = 5


def timed(fn, *args):
    out = fn(*args)
    _ = np.asarray(jax.tree.leaves(out)[0])
    ts = []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        out = fn(*args)
        _ = np.asarray(jax.tree.leaves(out)[0])
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2] / STEPS * 1e6        # us/step


def main():
    config = ConfigValle(max_audio_len=STEPS, ignore_eos=True, dropout=0.0,
                         dtype='bfloat16')
    model = ValleAR(config)
    rs = np.random.RandomState(0)
    prompt_tokens = jnp.asarray(rs.randint(0, 256, (64,)), jnp.int32)
    prompt_codes = rs.randint(0, 1024, (150, 8)).astype(np.int32)

    # Real prefill -> a live DecodeState at the fused shapes (4 beams).
    tokens = jnp.pad(prompt_tokens, (0, 0))[None]
    codes0 = jnp.concatenate([jnp.array([model.bos_token], jnp.int32),
                              jnp.asarray(prompt_codes[:, 0])])[None]
    state, tl_f, pl_f = model._prefill_jit(
        model.decode_params, tokens,
        jnp.asarray([prompt_tokens.shape[0]], jnp.int32), codes0,
        jnp.asarray([codes0.shape[1]], jnp.int32), jax.random.key(0))
    params = model.decode_params
    tparams = params['transformer']
    n_heads = config.n_heads
    ttm, pm = tokens.shape[1], codes0.shape[1]
    rows = state.logits.shape[0]
    d = config.d_model
    pe = sinusoidal_table(ar_mod.MAX_POS, d)
    dtype = jnp.dtype(config.dtype)
    results = {}

    # Full loop baseline: the production generate (per-call, minus prefill is
    # already amortized in bench.py's marginal metric; here just the whole).
    def full():
        return model.generate(prompt_tokens, prompt_codes,
                              rng=jax.random.key(1), bucket=False)
    full()
    ts = []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        out = full()
        _ = np.asarray(out)
        ts.append(time.perf_counter() - t0)
    results['full_loop'] = sorted(ts)[len(ts) // 2] / STEPS * 1e6

    @jax.jit
    def arm_turn(x):
        def body(i, c):
            return c + 1
        return jax.lax.fori_loop(0, STEPS, body, x)
    results['turn'] = timed(arm_turn, jnp.int32(0))

    x0 = jnp.zeros((rows, 1, d), dtype)

    @jax.jit
    def arm_kernel(cache, x):
        from valle2_tpu.kernels.fused_decode import fused_decode_step

        def body(i, carry):
            cache, x = carry
            y, cache = fused_decode_step(
                tparams, x, n_heads, cache, ttm + pm + i, tl_f, pl_f, ttm, pm,
                chunk_override=config.decode_chunk or None, tp=None)
            return (cache, y.astype(dtype))
        return jax.lax.fori_loop(0, STEPS, body, (cache, x))
    results['kernel'] = timed(arm_kernel, state.cache, x0)

    @jax.jit
    def arm_sampling(logits, rng):
        def body(i, carry):
            logits, rng = carry
            rng, srng = jax.random.split(rng)
            s, lp = topk_sampling(srng, logits, top_k=config.top_k,
                                  tok_p=config.tok_p, temperature=1.0)
            return (logits + lp[:, None] * 0, rng)
        return jax.lax.fori_loop(0, STEPS, body, (logits, rng))
    results['sampling'] = timed(arm_sampling, state.logits, jax.random.key(2))

    @jax.jit
    def arm_embed(samples):
        def body(i, s):
            x = embedding(params['audio_emb'], s[:, None])
            x = (x + jnp.take(pe, pl_f + i, axis=0)[:, None]).astype(dtype)
            return (s + x[:, 0, 0].astype(jnp.int32) * 0)
        return jax.lax.fori_loop(0, STEPS, body, samples)
    results['embed'] = timed(arm_embed, jnp.zeros((rows,), jnp.int32))

    y0 = jnp.zeros((rows, d), jnp.float32)

    @jax.jit
    def arm_proj(y):
        def body(i, y):
            logits = linear(params['proj'], y)
            return y + logits[:, :1] * 0
        return jax.lax.fori_loop(0, STEPS, body, y)
    results['proj'] = timed(arm_proj, y0)

    @jax.jit
    def arm_codewrite(codes):
        def body(i, codes):
            return jax.lax.dynamic_update_slice_in_dim(
                codes, jnp.zeros((rows, 1), jnp.int32), pm + i, axis=1)
        return jax.lax.fori_loop(0, STEPS, body, codes)
    results['codewrite'] = timed(arm_codewrite, state.codes)

    comp = ['kernel', 'sampling', 'embed', 'proj', 'codewrite']
    results['sum_components'] = round(sum(results[k] for k in comp)
                                      + results['turn'], 1)
    results = {k: round(v, 1) for k, v in results.items()}
    results['gap_full_vs_sum'] = round(
        results['full_loop'] / max(results['sum_components'], 1e-9), 3)
    print(json.dumps(results, indent=1))


if __name__ == '__main__':
    main()
