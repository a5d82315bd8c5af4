"""Can a hand-written Pallas GEMM beat XLA's measured bf16 GEMM rate on this
runtime?  BENCHMARKS.md r3 pinned the XLA 4096^3 bf16 rate at 81.2 TFLOP/s
(41.2% of the 197 TF nominal v5e peak) and argued the 204M train step (41.5%
MFU) is matmul-bound at that rate.  This probe A/Bs, same-process:

  - XLA jnp.dot (bf16 operands, preferred f32)
  - Pallas full-K tiled matmul (grid over M,N; one dot per program)
  - Pallas k-split matmul (grid M,N,K with f32 VMEM accumulator)

across the 4096^3 square and the 204M step's hot shapes.  Chained dispatches
(each call consumes the previous output) so one fetch times ITERS dispatches.

Usage: python probes/_gemm_pallas_roofline.py [--iters 16] [--best 3]
Prints one JSON line per (shape, arm, config).
"""
import argparse
import functools
import json
import os
import sys
import time

os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/tmp/jax_cache_tpu')
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from valle2_tpu.compile_cache import enable_compilation_cache

enable_compilation_cache('/tmp/jax_cache_tpu')


def _fullk_kernel(a_ref, b_ref, o_ref):
    o_ref[:] = jnp.dot(a_ref[:], b_ref[:],
                       preferred_element_type=jnp.float32).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=('bm', 'bn'))
def matmul_fullk(a, b, bm=256, bn=256):
    m, k = a.shape
    _, n = b.shape
    return pl.pallas_call(
        _fullk_kernel,
        grid=(m // bm, n // bn),
        in_specs=[
            pl.BlockSpec((bm, k), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), a.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('parallel', 'parallel'),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n * k,
            bytes_accessed=(m * k + k * n + m * n) * 2,
            transcendentals=0,
        ),
    )(a, b)


def _ksplit_kernel(a_ref, b_ref, o_ref, acc_ref):
    @pl.when(pl.program_id(2) == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
    acc_ref[:] += jnp.dot(a_ref[:], b_ref[:],
                          preferred_element_type=jnp.float32)

    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=('bm', 'bn', 'bk'))
def matmul_ksplit(a, b, bm=512, bn=512, bk=1024):
    m, k = a.shape
    _, n = b.shape
    return pl.pallas_call(
        _ksplit_kernel,
        grid=(m // bm, n // bn, k // bk),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, h: (i, h),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda i, j, h: (h, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, h: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), a.dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('parallel', 'parallel', 'arbitrary'),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n * k,
            bytes_accessed=(m * k + k * n + m * n) * 2,
            transcendentals=0,
        ),
    )(a, b)


@jax.jit
def matmul_xla(a, b):
    return jnp.dot(a, b, preferred_element_type=jnp.float32).astype(a.dtype)


def time_arm(fn, m, k, n, iters, best):
    rs = np.random.RandomState(0)
    a = jnp.asarray(rs.randn(m, k), jnp.bfloat16)
    b = jnp.asarray(rs.randn(k, n), jnp.bfloat16)
    # chaining: next a-operand is a slice of the previous output when shapes
    # allow, else re-dispatch on the same operands (still queue-pipelined).
    chain = (m, n) == (m, k)
    out = fn(a, b)
    np.asarray(out[:1, :1])  # warm (compile)
    rates = []
    for _ in range(best):
        x = a
        t0 = time.perf_counter()
        for _ in range(iters):
            x = fn(x, b) if chain else fn(a, b)
        np.asarray(x[:1, :1])
        dt = time.perf_counter() - t0
        rates.append(2.0 * m * k * n * iters / dt / 1e12)
    return max(rates)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--iters', type=int, default=16)
    ap.add_argument('--best', type=int, default=3)
    args = ap.parse_args()

    shapes = [
        ('square4096', 4096, 4096, 4096),
        ('ffn1_204m', 10240, 1024, 4096),
        ('out_204m', 10240, 1024, 1024),
    ]
    arms = [
        ('xla', matmul_xla),
        ('pallas_fullk_256', functools.partial(matmul_fullk, bm=256, bn=256)),
        ('pallas_fullk_512', functools.partial(matmul_fullk, bm=512, bn=512)),
        ('pallas_ksplit_512x512x1024',
         functools.partial(matmul_ksplit, bm=512, bn=512, bk=1024)),
        ('pallas_ksplit_1024x256x512',
         functools.partial(matmul_ksplit, bm=1024, bn=256, bk=512)),
    ]
    for sname, m, k, n in shapes:
        for aname, fn in arms:
            try:
                tf = time_arm(fn, m, k, n, args.iters, args.best)
                print(json.dumps({'shape': sname, 'arm': aname,
                                  'tflops': round(tf, 1)}), flush=True)
            except Exception as e:  # noqa: BLE001
                print(json.dumps({'shape': sname, 'arm': aname,
                                  'error': str(e)[:200]}), flush=True)


if __name__ == '__main__':
    main()
