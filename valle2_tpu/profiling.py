"""Tracing, profiling and numerics-debugging hooks (SURVEY §5).

The reference has no profiler/sanitizer integration at all; the TPU-native analogs:

- ``trace(logdir)`` — jax.profiler device trace, viewable in TensorBoard's profile
  plugin (or Perfetto).
- ``annotate(name)`` — named region inside a trace (shows up on the TPU timeline).
- ``enable_nan_checks()`` — jax_debug_nans: every jitted function re-runs eagerly on
  NaN production and raises with the offending primitive (the TPU-world equivalent of
  a sanitizer; SURVEY §5 'race detection' row).
- ``log_compiles()`` — jax_log_compiles: surface recompilation storms (shape leaks
  from the bucketing collate show up here first).
"""

from __future__ import annotations

import contextlib
from pathlib import Path

import jax


@contextlib.contextmanager
def trace(logdir: str | Path):
    """Capture a device trace: ``with trace('logs/profile'): step(...)``."""
    jax.profiler.start_trace(str(logdir), create_perfetto_trace=False)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region for the profiler timeline (usable as decorator or context)."""
    return jax.profiler.TraceAnnotation(name)


def enable_nan_checks(enable: bool = True) -> None:
    jax.config.update('jax_debug_nans', enable)


def log_compiles(enable: bool = True) -> None:
    jax.config.update('jax_log_compiles', enable)


V5E_PEAK_BF16_FLOPS = 197e12  # TPU v5e peak bf16 matmul throughput per chip


def train_step_flops(config, batch: int, tokens_len: int, codes_len: int) -> float:
    """Analytic matmul FLOPs for one AR train step (fwd + bwd ≈ 3 × fwd).

    Counts the transformer matmuls (fused QKV, output proj, FFN), the attention
    score/value dots over the full (causal-masked) sequence — what the kernels
    actually compute — and the output head.  Embedding gathers and elementwise ops
    are excluded (MFU convention).  Divide by wall time and the chip's peak
    (``V5E_PEAK_BF16_FLOPS``) for MFU.
    """
    s = tokens_len + codes_len
    d, layers, dff = config.d_model, config.num_layers, config.dim_feedforward
    mm_per_tok = layers * 2 * (4 * d * d + 2 * d * dff)   # qkv(3d²)+out(d²)+ffn(2·d·dff)
    attn_per_tok = layers * 4 * s * d                     # QKᵀ + PV over s keys
    head_per_code = 2 * d * (config.num_audio_tokens + 1)
    fwd = batch * (s * (mm_per_tok + attn_per_tok) + codes_len * head_per_code)
    return 3.0 * fwd


def nar_train_step_flops(config, batch: int, tokens_len: int,
                         codes_len: int) -> float:
    """Analytic matmul FLOPs for one NAR train step (fwd + bwd ≈ 3 × fwd).

    Same transformer accounting as the AR step (the stack is identical and
    the attention is full-bidirectional — the AR count already charges the
    full s² dot, matching what the kernels compute), plus the NAR-specific
    terms: the masked 8-way codebook-embedding reduction (``btqd,tq->btd`` —
    a real MAC per (position, quantizer, channel)) and the single-stage
    output head over the code positions.  AdaLN's conditioning projections
    act on a (1, d) row — negligible, excluded."""
    s = tokens_len + codes_len
    d, layers, dff = config.d_model, config.num_layers, config.dim_feedforward
    nq = config.num_quantizers
    mm_per_tok = layers * 2 * (4 * d * d + 2 * d * dff)
    attn_per_tok = layers * 4 * s * d
    head_per_code = 2 * d * config.num_audio_tokens
    embed_reduce = 2 * codes_len * nq * d
    fwd = batch * (s * (mm_per_tok + attn_per_tok)
                   + codes_len * head_per_code + embed_reduce)
    return 3.0 * fwd


def memory_stats(device=None) -> dict:
    """Live/peak HBM usage for the given (default first) device."""
    device = device or jax.devices()[0]
    stats = device.memory_stats() or {}
    return {'bytes_in_use': stats.get('bytes_in_use', 0),
            'peak_bytes_in_use': stats.get('peak_bytes_in_use', 0),
            'bytes_limit': stats.get('bytes_limit', 0)}
