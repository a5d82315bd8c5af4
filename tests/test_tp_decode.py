"""Manual tensor parallelism for the decode path under ``jax.shard_map``.

GSPMD cannot partition a ``pallas_call``, so TP serving needs MANUAL
parallelism: each model rank holds a Megatron column/row split of the
attn/ffn weights (``parallel.tp_decode_specs``; fused-qkv columns regrouped
rank-major by ``parallel.tp_permute_qkv``), runs the transformer on its LOCAL
heads / local FFN slice, and the row-parallel projections ``psum`` partials
over the 'model' axis (``ops.nn.linear_row_parallel``).  These tests pin the
ops layer: prefill + decode steps with ``tp_axis='model'`` inside a shard_map
are (numerically) identical to the solo single-device path, for dense f32,
int8-quantized weights, and int8 KV caches.

No reference counterpart: /root/reference has no multi-device inference at
all (SURVEY §2.3) — this is the framework's own serving-scale path.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from valle2_tpu.ops.transformer import (transformer_init, transformer_prefill,
                                        transformer_decode_step)
from valle2_tpu.parallel import (make_mesh, tp_decode_specs, tp_divisible,
                                 tp_permute_qkv, tp_shard_map)

L, D, H, DFF = 2, 32, 4, 64
B, S, MAX_LEN, STEPS = 4, 6, 12, 3


def _params(key=0, int8=False):
    p = transformer_init(jax.random.key(key), L, D, H, DFF, adaptive_norm=False)
    if int8:
        from valle2_tpu.quantize import quantize_transformer
        p = quantize_transformer(p)
    return p


def _inputs(key=1):
    k1, k2 = jax.random.split(jax.random.key(key))
    x = jax.random.normal(k1, (B, S, D), jnp.float32)
    steps = jax.random.normal(k2, (B, STEPS, D), jnp.float32)
    return x, steps


def _causal_bias(s):
    from valle2_tpu.ops.masks import NEG_INF
    m = jnp.tril(jnp.ones((s, s), bool))
    return jnp.where(m, 0.0, NEG_INF)[None, None]


def _run(params, x, steps, n_heads, *, tp_axis=None, cache_dtype=None,
         bias=None):
    """Prefill then STEPS single-token decode steps; returns (y0, ys)."""
    y0, cache = transformer_prefill(params, x, n_heads, MAX_LEN, bias=bias,
                                    cache_dtype=cache_dtype, tp_axis=tp_axis)
    ys = []
    for t in range(STEPS):
        xt = steps[:, t:t + 1]
        y, cache = transformer_decode_step(params, xt, n_heads, cache,
                                           jnp.int32(S + t), tp_axis=tp_axis)
        ys.append(y[:, 0])
    return y0, jnp.stack(ys, axis=1)


def _run_tp(mesh, params, x, steps, *, cache_dtype=None, bias=None):
    mp = mesh.shape['model']
    assert tp_divisible(H, DFF, mp)
    pperm = tp_permute_qkv(params, mp)
    n_local = H // mp

    def body(p, x, steps):
        return _run(p, x, steps, n_local, tp_axis='model',
                    cache_dtype=cache_dtype, bias=bias)

    fn = tp_shard_map(mesh, body, n_args=3, sharded=(1, 2), n_out=2,
                      param_specs=tp_decode_specs(pperm))
    return jax.jit(fn)(pperm, x, steps)


@pytest.mark.parametrize('data,model', [(2, 2), (1, 4)])
class TestTPDecodeOps:
    def test_dense_parity(self, data, model):
        params, (x, steps) = _params(), _inputs()
        y0_solo, ys_solo = _run(params, x, steps, H)
        mesh = make_mesh(data=data, model=model)
        y0_tp, ys_tp = _run_tp(mesh, params, x, steps)
        np.testing.assert_allclose(y0_tp, y0_solo, atol=2e-5, rtol=2e-5)
        np.testing.assert_allclose(ys_tp, ys_solo, atol=2e-5, rtol=2e-5)

    def test_causal_bias_parity(self, data, model):
        params, (x, steps) = _params(key=3), _inputs(key=4)
        bias = _causal_bias(S)
        y0_solo, ys_solo = _run(params, x, steps, H, bias=bias)
        mesh = make_mesh(data=data, model=model)
        y0_tp, ys_tp = _run_tp(mesh, params, x, steps, bias=bias)
        np.testing.assert_allclose(y0_tp, y0_solo, atol=2e-5, rtol=2e-5)
        np.testing.assert_allclose(ys_tp, ys_solo, atol=2e-5, rtol=2e-5)

    def test_int8_weights(self, data, model):
        """int8 TP accumulates EXACTLY like solo: column splits reuse the solo
        activation scale (full-width input), and the row-parallel path pmax-es
        the activation amax globally then psums the s8×s8→s32 partials in
        integers — associative, so identical to the solo full-width dot.  The
        only residual is f32 ULP noise from XLA fusing the ``y·sx·scale``
        rescale with different associativity in the two programs — orders of
        magnitude below the ±1-int8-step quantization floor."""
        params, (x, steps) = _params(int8=True), _inputs(key=5)
        y0_solo, ys_solo = _run(params, x, steps, H)
        mesh = make_mesh(data=data, model=model)
        y0_tp, ys_tp = _run_tp(mesh, params, x, steps)
        np.testing.assert_allclose(y0_tp, y0_solo, atol=5e-6, rtol=5e-4)
        np.testing.assert_allclose(ys_tp, ys_solo, atol=5e-6, rtol=5e-4)

    def test_int8_kv_cache(self, data, model):
        """The quantized cache holds only local heads per rank; per-slot f32
        scale arithmetic is head-local so TP slices don't change rounding."""
        params, (x, steps) = _params(key=6), _inputs(key=7)
        y0_solo, ys_solo = _run(params, x, steps, H, cache_dtype=jnp.int8)
        mesh = make_mesh(data=data, model=model)
        y0_tp, ys_tp = _run_tp(mesh, params, x, steps, cache_dtype=jnp.int8)
        np.testing.assert_allclose(y0_tp, y0_solo, atol=2e-5, rtol=2e-5)
        np.testing.assert_allclose(ys_tp, ys_solo, atol=2e-5, rtol=2e-5)


class TestTPHelpers:
    def test_tp_divisible(self):
        assert tp_divisible(16, 4096, 4)
        assert not tp_divisible(16, 4094, 4)   # odd hidden width
        assert not tp_divisible(6, 4096, 4)    # heads don't split
        assert not tp_divisible(16, 4096, 0)

    def test_permute_qkv_rank_slice(self):
        """Rank r's contiguous 1/mp slice of the permuted fused qkv == the
        concatenation of rank r's head-aligned q/k/v column blocks."""
        mp = 2
        params = _params(key=8)
        w = params['attn']['qkv']['w']            # (L, d, 3d)
        d = w.shape[-1] // 3
        q, k, v = np.split(np.asarray(w), 3, axis=-1)
        perm = np.asarray(tp_permute_qkv(params, mp)['attn']['qkv']['w'])
        for r in range(mp):
            lo, hi = r * d // mp, (r + 1) * d // mp
            want = np.concatenate([q[..., lo:hi], k[..., lo:hi], v[..., lo:hi]],
                                  axis=-1)
            got = perm[..., r * 3 * d // mp:(r + 1) * 3 * d // mp]
            np.testing.assert_array_equal(got, want)

    def test_permute_preserves_other_leaves(self):
        params = _params(key=9)
        perm = tp_permute_qkv(params, 2)
        assert perm['ffn']['lin1']['w'] is params['ffn']['lin1']['w']
        assert perm['attn']['out']['w'] is params['attn']['out']['w']
