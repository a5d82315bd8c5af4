"""Cold-start benchmark: what a RESTARTED serving process pays before its
first request, under each caching layer.

Each invocation is ONE fresh process (that is what cold start means) — run the
modes back to back and compare the JSON lines:

    python -m valle2_tpu.tools.coldstart_bench compile   # XLA compile cache only
    python -m valle2_tpu.tools.coldstart_bench aot       # + AOT executable cache
    python -m valle2_tpu.tools.coldstart_bench warmup    # full TTSServer.warmup()
    python -m valle2_tpu.tools.coldstart_bench decompose-compile
    python -m valle2_tpu.tools.coldstart_bench decompose-aot

The first run of any mode populates the caches (expect compile-scale times);
the SECOND fresh-process run is the measurement.  ``decompose-*`` splits the
single fused-TTS program's cold start into phases (trace+lower | compile |
first exec, or deserialize | first exec) so the numbers in BENCHMARKS.md
("Cold start on this runtime") can be reproduced.

Measured 2026-08-17 on the target runtime (TPU v5e via axon): the XLA
persistent compile cache is the winning layer — a cache-served compile is
~1 s and the unavoidable first execution ~29 s — while a deserialized AOT
executable pays ~154 s at first execution (server-side finalization that the
compile-cache path amortizes), so ``--aot-cache`` is NOT recommended on
compile-server-backed runtimes.  See docs/serving.md "Cold start".
"""
from __future__ import annotations

import json
import os
import sys
import time

COMPILE_DIR = os.environ.get('VALLE2_COMPILE_CACHE', '/tmp/jax_cache_tpu')
AOT_DIR = os.environ.get('VALLE2_AOT_CACHE', '/tmp/aot_cache_tpu')


def _setup(mode: str):
    os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', COMPILE_DIR)
    from ..aot import enable_aot_cache
    from ..compile_cache import enable_compilation_cache
    from ..config import ConfigValle
    from ..tts import ValleTTS

    enable_compilation_cache(COMPILE_DIR)
    if 'aot' in mode:
        enable_aot_cache(AOT_DIR)
    cfg = ConfigValle(dtype='bfloat16', temperature=0.0,
                      num_beams=1 if mode == 'warmup' else 4,
                      max_audio_len=512)
    return ConfigValle, ValleTTS, cfg


def _programs_breakdown(order: str = 'default-first') -> dict:
    """Per-program compile-seconds for the bench.py program suite (r4,
    VERDICT item 5): WHAT dominates the cold start, measured by toggling one
    feature at a time on the AR-decode program (the bench's 274.9 s r3 cold
    number) plus the train-step programs.  Compilation cache pointed at a
    throwaway dir so every arm pays its true compile."""
    import tempfile
    os.environ['JAX_COMPILATION_CACHE_DIR'] = tempfile.mkdtemp(
        prefix='coldstart_programs_')
    import jax
    import numpy as np
    from ..config import ConfigValle
    from ..models.ar import ValleAR

    rs = np.random.RandomState(0)
    pt = rs.randint(0, 256, (64,))
    pc = rs.randint(0, 1024, (150, 8)).astype(np.int32)
    out: dict = {}

    def time_decode(tag, **kw):
        base = dict(max_audio_len=512, ignore_eos=True, dropout=0.0,
                    dtype='bfloat16')
        base.update(kw)
        m = ValleAR(ConfigValle(**base))
        t0 = time.perf_counter()
        m.generate(pt, pc, rng=jax.random.key(0), bucket=False)
        dt = time.perf_counter() - t0
        out[tag] = round(dt, 1)
        print(f'{tag}: {dt:.1f}s', flush=True)

    # The bench's exact program, then single-feature ablations.  'reorder'
    # runs a small program FIRST to separate per-process one-time costs
    # (compile-server handshake, backend warmup) from the program's own cost
    # — the first arm of any process absorbs them.
    if order == 'reorder':
        time_decode('decode_beams1', num_beams=1)
        time_decode('decode_default')
        time_decode('decode_unfused', use_fused_decode=False)
    else:
        time_decode('decode_default')                   # fused + buckets=4
        time_decode('decode_buckets1', decode_attn_buckets=1)
        time_decode('decode_unfused', use_fused_decode=False)
        time_decode('decode_unfused_buckets1', use_fused_decode=False,
                    decode_attn_buckets=1)
        time_decode('decode_beams1', num_beams=1)

    from ..train import init_state, make_train_step
    for tag, kw in (('train_ar_default', {}),
                    ('train_ar_204m', dict(d_model=1024, num_layers=16,
                                           n_heads=16, dim_feedforward=4096))):
        cfg = ConfigValle(dropout=0.1, batch_size=8, dtype='bfloat16', **kw)
        st = init_state(cfg, 'ValleAR', jax.random.key(0))
        step = make_train_step(cfg, 'ValleAR')
        b = {
            'tokens': np.asarray(rs.randint(0, 256, (8, 128)), np.int32),
            'tokens_lens': np.asarray([128] * 8),
            'codes': np.asarray(rs.randint(0, 1024, (8, 512)), np.int32),
            'codes_lens': np.asarray([512] * 8),
            'target': np.asarray(rs.randint(0, 1024, (8, 512)), np.int32),
        }
        t0 = time.perf_counter()
        st, m = step(st, b, jax.random.key(1, impl=cfg.train_rng_impl))
        np.asarray(m['loss'])
        out[tag] = round(time.perf_counter() - t0, 1)
        print(f'{tag}: {out[tag]}s', flush=True)
    return out


def main(argv=None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    if len(argv) != 1 or argv[0] not in (
            'compile', 'aot', 'warmup', 'decompose-compile', 'decompose-aot',
            'programs', 'programs-reorder'):
        print(__doc__)
        return 2
    mode = argv[0]
    if mode.startswith('programs'):
        order = 'reorder' if mode.endswith('reorder') else 'default-first'
        print(json.dumps({'mode': mode, **_programs_breakdown(order)}))
        return 0

    t_start = time.perf_counter()
    import numpy as np
    import jax
    _, ValleTTS, cfg = _setup(mode)
    tts = ValleTTS(cfg)
    rs = np.random.RandomState(0)
    pt = rs.randint(0, 70, (12,))
    pc = rs.randint(0, 1024, (75, 8))
    text = 'hello world, this is a cold start measurement.'
    out: dict = {'mode': mode}

    if mode == 'warmup':
        from ..serve import TTSServer
        server = TTSServer(tts, max_batch=8)
        t_init = time.perf_counter()
        wall = server.warmup(streams=True)
        out.update(init_s=round(t_init - t_start, 2), warmup_s=round(wall, 2),
                   total_s=round(time.perf_counter() - t_start, 2))
    elif mode in ('compile', 'aot'):
        t_init = time.perf_counter()
        r = tts.synthesize_fused(text, pt, pc, rng=jax.random.key(0))
        t_first = time.perf_counter()
        tts.synthesize_fused(text, pt, pc, rng=jax.random.key(0))
        t_second = time.perf_counter()
        out.update(init_s=round(t_init - t_start, 2),
                   first_call_s=round(t_first - t_init, 2),
                   second_call_s=round(t_second - t_first, 2),
                   aot_compiles=tts._fused_jit.n_compiles,
                   aot_disk_loads=tts._fused_jit.n_disk_loads,
                   codes_sum=int(np.asarray(r.codes).sum()))
    else:
        # Decompose the fused program's cold start phase by phase, using the
        # exact bucketed arguments batch_synthesize would pass.
        import jax.numpy as jnp
        from ..config import bucket_len
        tokens = np.concatenate([np.asarray(pt, np.int32), tts.tokenizer(text)])
        ttm = bucket_len(cfg.bucket_sizes, len(tokens))
        pm = bucket_len(cfg.bucket_sizes, len(pc))
        tokens_b = np.zeros((1, ttm), np.int32)
        tokens_b[0, :len(tokens)] = tokens
        codes_b = np.zeros((1, pm, 8), np.int32)
        codes_b[0, :len(pc)] = pc
        args = (tts.ar.decode_params, tts.nar.params, tts.codec.dec_params,
                jnp.asarray(tokens_b), jnp.asarray([len(tokens)], jnp.int32),
                jnp.asarray(codes_b), jnp.asarray([len(pc)], jnp.int32),
                jax.random.key(cfg.seed))
        cj = tts._fused_jit
        if mode == 'decompose-compile':
            t0 = time.perf_counter()
            lowered = cj._jitted.lower(*args)
            t1 = time.perf_counter()
            compiled = lowered.compile()
            t2 = time.perf_counter()
            np.asarray(compiled(*args)[0])
            t3 = time.perf_counter()
            out.update(trace_lower_s=round(t1 - t0, 2),
                       compile_s=round(t2 - t1, 2),
                       first_exec_s=round(t3 - t2, 2))
        else:
            key = cj._key(args, {})
            t0 = time.perf_counter()
            loaded = cj._load(AOT_DIR, key)
            t1 = time.perf_counter()
            if loaded is None:
                out['error'] = ('no AOT entry for this signature — run '
                                '"aot" mode once first')
            else:
                np.asarray(loaded(*args)[0])
                out.update(deserialize_s=round(t1 - t0, 2),
                           first_exec_s=round(time.perf_counter() - t1, 2))
    print(json.dumps(out))
    return 0


if __name__ == '__main__':
    raise SystemExit(main())
