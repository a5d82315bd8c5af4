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

    def test_int4_weights(self, data, model):
        """int4 W4A16 under manual TP: column-parallel q4 slices are valid
        standalone layouts of the GLOBAL packing, row-parallel linears use the
        RANKED per-rank packing (quantize_linear_int4_ranked) and complete
        with a plain fp psum.  Reference: the solo dense run on the exact
        dequantized weights the TP ranks multiply by."""
        from valle2_tpu.quantize import (dequantize_linear_int4,
                                         dequantize_linear_int4_ranked,
                                         quantize_transformer)
        dense, (x, steps) = _params(key=8), _inputs(key=9)
        qtp = quantize_transformer(dense, bits=4, tp_mp=model)
        ref = jax.tree.map(lambda a: a, dense)
        ref['attn'] = {'qkv': dequantize_linear_int4(qtp['attn']['qkv']),
                       'out': dequantize_linear_int4_ranked(
                           qtp['attn']['out'], model)}
        ref['ffn'] = {'lin1': dequantize_linear_int4(qtp['ffn']['lin1']),
                      'lin2': dequantize_linear_int4_ranked(
                          qtp['ffn']['lin2'], model)}
        y0_solo, ys_solo = _run(ref, x, steps, H)
        mesh = make_mesh(data=data, model=model)
        y0_tp, ys_tp = _run_tp(mesh, qtp, x, steps)
        np.testing.assert_allclose(y0_tp, y0_solo, atol=2e-5, rtol=2e-5)
        np.testing.assert_allclose(ys_tp, ys_solo, atol=2e-5, rtol=2e-5)

    def test_int8_kv_cache(self, data, model):
        """The quantized cache holds only local heads per rank; per-slot f32
        scale arithmetic is head-local so TP slices don't change rounding."""
        params, (x, steps) = _params(key=6), _inputs(key=7)
        y0_solo, ys_solo = _run(params, x, steps, H, cache_dtype=jnp.int8)
        mesh = make_mesh(data=data, model=model)
        y0_tp, ys_tp = _run_tp(mesh, params, x, steps, cache_dtype=jnp.int8)
        np.testing.assert_allclose(y0_tp, y0_solo, atol=2e-5, rtol=2e-5)
        np.testing.assert_allclose(ys_tp, ys_solo, atol=2e-5, rtol=2e-5)


class TestTPFusedKernel:
    """The fused whole-stack decode kernel under manual TP: per-rank local
    heads/FFN slice with IN-KERNEL ring all-reduces over the 'model' axis
    (kernels/fused_decode._ring_allreduce), vs the solo XLA decode step.

    Uses the 1-axis ('model',) mesh: jax's interpret-mode remote-DMA discharge
    only supports a single named axis in the axis env (see
    parallel.make_model_mesh) — on real TPUs the 2-axis ('data', 'model')
    layout lowers fine through Mosaic, with base = axis_index('data') * mp."""

    def _setup(self, seed=0):
        from valle2_tpu.ops.transformer import KVCache
        L, rows, h, hd, dff, S = 2, 4, 4, 8, 64, 40
        d = h * hd
        ttm, pm = 6, 8
        p = transformer_init(jax.random.key(seed), L, d, h, dff,
                             adaptive_norm=False)
        ks = jax.random.split(jax.random.key(seed + 100), 4)
        cache = KVCache(jax.random.normal(ks[0], (L, rows, h, S, hd)),
                        jax.random.normal(ks[1], (L, rows, h, S, hd)))
        x = jax.random.normal(ks[2], (rows, 1, d))
        tl = jnp.asarray([6, 4, 5, 6], jnp.int32)
        plen = jnp.asarray([8, 6, 3, 7], jnp.int32)
        return p, cache, x, tl, plen, (L, rows, h, hd, dff, S, d, ttm, pm)

    def _want(self, p, cache, x, tl, plen, dims, index):
        from valle2_tpu.ops.transformer import transformer_decode_step
        from valle2_tpu.kernels.fused_decode import fused_cache_layout
        L, rows, h, hd, dff, S, d, ttm, pm = dims
        slots = jnp.arange(S)[None, :]
        idx_r = index[:, None] if jnp.ndim(index) == 1 else index
        attend = ((slots < tl[:, None])
                  | ((slots >= ttm) & (slots < ttm + plen[:, None]))
                  | ((slots >= ttm + pm) & (slots <= idx_r)))
        want_y, want_cache = transformer_decode_step(p, x, h, cache, index,
                                                     attend_mask=attend)
        return want_y, fused_cache_layout(want_cache)

    @pytest.mark.parametrize('mp', [2, 4])
    def test_tp_fused_step_matches_solo(self, mp):
        from jax.sharding import PartitionSpec as P
        from valle2_tpu.ops.transformer import KVCache
        from valle2_tpu.kernels.fused_decode import (fused_cache_layout,
                                                     fused_decode_step)
        from valle2_tpu.parallel import make_model_mesh
        p, cache, x, tl, plen, dims = self._setup()
        L_, rows, h, hd, dff, S_, d, ttm, pm = dims
        index = jnp.int32(ttm + pm + 5)
        want_y, want_cache = self._want(p, cache, x, tl, plen, dims, index)

        mesh = make_model_mesh(mp)
        pperm = tp_permute_qkv(p, mp)

        def body(p_sh, ck, cv, x_sh, tl_sh, pl_sh):
            fc = fused_cache_layout(KVCache(ck, cv))
            my = jax.lax.axis_index('model')
            y, nc = fused_decode_step(p_sh, x_sh, h // mp, fc, index,
                                      tl_sh, pl_sh, ttm, pm,
                                      tp=(my, jnp.int32(0), mp))
            return y, nc.k, nc.v

        kv_in = P(None, None, 'model', None, None)     # (L, rows, h, S, hd)
        kv_out = P(None, None, None, 'model')          # fused (L, rows, S, d_att)
        fn = jax.shard_map(body, mesh=mesh,
                           in_specs=(tp_decode_specs(pperm), kv_in, kv_in,
                                     P(), P(), P()),
                           out_specs=(P(), kv_out, kv_out),
                           check_vma=False)
        got_y, got_k, got_v = jax.jit(fn)(pperm, cache.k, cache.v, x, tl, plen)
        np.testing.assert_allclose(got_y, want_y, rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(got_k, want_cache.k, atol=1e-5)
        np.testing.assert_allclose(got_v, want_cache.v, atol=1e-5)

    def test_tp_fused_step_per_row_index_int8_cache(self):
        """Per-row indices (continuous batching) + int8 KV cache compose with
        the TP kernel: quantization is head-local, so rank slices don't change
        rounding; the deepest row still drives the chunk-skip clamp."""
        from jax.sharding import PartitionSpec as P
        from valle2_tpu.ops.transformer import KVCache, quantize_kv
        from valle2_tpu.kernels.fused_decode import (fused_cache_layout,
                                                     fused_decode_step)
        from valle2_tpu.parallel import make_model_mesh
        p, cache, x, tl, plen, dims = self._setup(seed=11)
        L_, rows, h, hd, dff, S_, d, ttm, pm = dims
        qk, sk = quantize_kv(cache.k)
        qv, sv = quantize_kv(cache.v)
        cache = KVCache(qk, qv, sk, sv)
        index = jnp.asarray([ttm + pm + 5, ttm + pm + 2, ttm + pm + 7,
                             ttm + pm + 4], jnp.int32)
        want_y, want_cache = self._want(p, cache, x, tl, plen, dims, index)

        mp = 2
        mesh = make_model_mesh(mp)
        pperm = tp_permute_qkv(p, mp)

        def body(p_sh, ck, cv, cks, cvs, x_sh, tl_sh, pl_sh, idx_sh):
            fc = fused_cache_layout(KVCache(ck, cv, cks, cvs))
            my = jax.lax.axis_index('model')
            y, nc = fused_decode_step(p_sh, x_sh, h // mp, fc, idx_sh,
                                      tl_sh, pl_sh, ttm, pm,
                                      tp=(my, jnp.int32(0), mp))
            return y, nc.k, nc.v, nc.k_scale, nc.v_scale

        kv_in = P(None, None, 'model', None, None)
        kv_out = P(None, None, None, 'model')
        fn = jax.shard_map(
            body, mesh=mesh,
            in_specs=(tp_decode_specs(pperm), kv_in, kv_in, kv_in, kv_in,
                      P(), P(), P(), P()),
            out_specs=(P(), kv_out, kv_out, kv_out, kv_out),
            check_vma=False)
        got = jax.jit(fn)(pperm, cache.k, cache.v, cache.k_scale, cache.v_scale,
                          x, tl, plen, index)
        got_y, got_k, got_v, got_ks, got_vs = got
        np.testing.assert_allclose(got_y, want_y, rtol=1e-4, atol=1e-4)
        np.testing.assert_array_equal(np.asarray(got_k), np.asarray(want_cache.k))
        np.testing.assert_array_equal(np.asarray(got_v), np.asarray(want_cache.v))
        np.testing.assert_allclose(got_ks, want_cache.k_scale, atol=1e-6)
        np.testing.assert_allclose(got_vs, want_cache.v_scale, atol=1e-6)


class TestTPFusedVerify:
    """The fused q-block verify kernel (speculative decoding) under manual TP
    — same ring all-reduce mechanics as the decode kernel, q_blk query rows."""

    def test_tp_verify_matches_xla_block_step(self):
        from jax.sharding import PartitionSpec as P
        from valle2_tpu.ops.transformer import KVCache, transformer_decode_step
        from valle2_tpu.kernels.fused_decode import (fused_cache_layout,
                                                     fused_verify_step)
        from valle2_tpu.parallel import make_model_mesh
        L, rows, h, hd, dff, S, K = 2, 3, 4, 8, 64, 48, 3
        d = h * hd
        ttm, pm = 6, 8
        p = transformer_init(jax.random.key(20), L, d, h, dff,
                             adaptive_norm=False)
        ks = jax.random.split(jax.random.key(21), 3)
        cache = KVCache(jax.random.normal(ks[0], (L, rows, h, S, hd)),
                        jax.random.normal(ks[1], (L, rows, h, S, hd)))
        x = jax.random.normal(ks[2], (rows, K, d))
        tl = jnp.asarray([6, 4, 5], jnp.int32)
        plen = jnp.asarray([8, 6, 3], jnp.int32)
        index = jnp.asarray([ttm + pm + 5, ttm + pm + 2, ttm + pm + 9],
                            jnp.int32)

        slots = jnp.arange(S)[None, None, :]
        qi = jnp.arange(K)[None, :, None]
        attend = ((slots < tl[:, None, None])
                  | ((slots >= ttm) & (slots < ttm + plen[:, None, None]))
                  | ((slots >= ttm + pm) & (slots <= index[:, None, None] + qi)))
        want_y, want_cache = transformer_decode_step(p, x, h, cache, index,
                                                     attend_mask=attend)
        want_cache = fused_cache_layout(want_cache)

        mp = 2
        mesh = make_model_mesh(mp)
        pperm = tp_permute_qkv(p, mp)

        def body(p_sh, ck, cv, x_sh, tl_sh, pl_sh, idx_sh):
            fc = fused_cache_layout(KVCache(ck, cv))
            my = jax.lax.axis_index('model')
            y, nc = fused_verify_step(p_sh, x_sh, h // mp, fc, idx_sh,
                                      tl_sh, pl_sh, ttm, pm,
                                      tp=(my, jnp.int32(0), mp))
            return y, nc.k, nc.v

        kv_in = P(None, None, 'model', None, None)
        kv_out = P(None, None, None, 'model')
        fn = jax.shard_map(body, mesh=mesh,
                           in_specs=(tp_decode_specs(pperm), kv_in, kv_in,
                                     P(), P(), P(), P()),
                           out_specs=(P(), kv_out, kv_out),
                           check_vma=False)
        got_y, got_k, got_v = jax.jit(fn)(pperm, cache.k, cache.v, x, tl,
                                          plen, index)
        np.testing.assert_allclose(got_y, want_y, rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(got_k, want_cache.k, atol=1e-5)
        np.testing.assert_allclose(got_v, want_cache.v, atol=1e-5)


def _ar_cfg(**kw):
    from valle2_tpu.config import ConfigValle
    base = dict(d_model=48, n_heads=2, dim_feedforward=96, num_layers=2,
                num_audio_tokens=96, vocab_size=24, dropout=0.0,
                temperature=0.0, num_beams=2, max_audio_len=16,
                norm='LayerNorm', bucket_sizes=(16, 32),
                matmul_precision='highest')
    base.update(kw)
    return ConfigValle(**base)


class TestValleARManualTP:
    """End-to-end ValleAR decode through the manual-TP shard_map (models/ar.py
    wires it whenever the mesh has a divisible 'model' axis > 1)."""

    def test_xla_tp_path_matches_solo(self):
        """2x2 mesh, XLA psum path (the fused gate is off on CPU 'auto'):
        greedy per-item tokens equal the unmeshed solo decode."""
        from valle2_tpu.models.ar import ValleAR
        c = _ar_cfg()
        mesh = make_mesh(data=2, model=2)
        solo = ValleAR(c)
        meshed = ValleAR(c, params=solo.params, mesh=mesh)
        assert meshed._decode_tp == (('data', 'model'), 2)
        rs = np.random.RandomState(3)
        items = [(rs.randint(0, 24, (4 + i,)), rs.randint(0, 96, (3 + i, 8)))
                 for i in range(3)]
        batched = meshed.generate_batch([t for t, _ in items],
                                        [pc for _, pc in items], bucket=False)
        for (t, pc), got in zip(items, batched):
            want = solo.generate(jnp.asarray(t), jnp.asarray(pc), bucket=False)
            np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    def test_fused_tp_decode_matches_solo(self):
        """Model-only mesh, fused kernel FORCED: the whole decode loop runs
        the TP Pallas kernel (interpret mode) with in-kernel ring all-reduces
        — tokens equal the solo fused decode."""
        from valle2_tpu.models.ar import ValleAR
        from valle2_tpu.parallel import make_model_mesh
        c = _ar_cfg(use_fused_decode=True, matmul_precision='default',
                    kv_cache_dtype='float32', dtype='float32')
        mesh = make_model_mesh(2)
        solo = ValleAR(c)
        meshed = ValleAR(c, params=solo.params, mesh=mesh)
        assert meshed._decode_tp == (('model',), 2)
        rs = np.random.RandomState(5)
        items = [(rs.randint(0, 24, (4,)), rs.randint(0, 96, (3, 8))),
                 (rs.randint(0, 24, (6,)), rs.randint(0, 96, (5, 8)))]
        batched = meshed.generate_batch([t for t, _ in items],
                                        [pc for _, pc in items])
        for (t, pc), got in zip(items, batched):
            want = solo.generate(jnp.asarray(t), jnp.asarray(pc))
            np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    def test_fused_tp_speculative_matches_solo(self):
        """Speculative decoding under TP: the fused q-block verify kernel runs
        per-rank with ring all-reduces; greedy committed tokens stay
        bit-identical to the solo speculative decode."""
        from valle2_tpu.models.ar import ValleAR
        from valle2_tpu.parallel import make_model_mesh
        c = _ar_cfg(use_fused_decode=True, matmul_precision='default',
                    kv_cache_dtype='float32', dtype='float32', num_beams=1,
                    speculative_k=3)
        mesh = make_model_mesh(2)
        solo = ValleAR(c)
        meshed = ValleAR(c, params=solo.params, mesh=mesh)
        rs = np.random.RandomState(6)
        items = [(rs.randint(0, 24, (5,)), rs.randint(0, 96, (4, 8)))]
        got = meshed.generate_batch([items[0][0]], [items[0][1]])[0]
        want = solo.generate(jnp.asarray(items[0][0]), jnp.asarray(items[0][1]))
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    def test_int4_fused_tp_matches_xla_tp(self):
        """int4 weights KEEP the fused kernel under manual TP (ranked per-rank
        packing + fp ring all-reduce): the in-kernel _q4_dot dequant must
        match the XLA path's int4_matmul bit-for-bit in interpret mode, so
        greedy tokens agree between the two TP programs on the same ranked
        view."""
        import dataclasses
        from valle2_tpu.models.ar import ValleAR, _fused_gate
        from valle2_tpu.parallel import make_model_mesh
        c = _ar_cfg(weight_dtype='int4', use_fused_decode=True,
                    matmul_precision='default', kv_cache_dtype='float32',
                    dtype='float32')
        assert _fused_gate(c, rows=2, total_max=64, tp_mp=2)
        mesh = make_model_mesh(2)
        seedm = ValleAR(c)
        fused = ValleAR(c, params=seedm.params, mesh=mesh)
        xla = ValleAR(dataclasses.replace(c, use_fused_decode=False),
                      params=seedm.params, mesh=mesh)
        assert fused._decode_tp == (('model',), 2)
        assert 'q4' in fused._tp_params()['transformer']['attn']['qkv']
        rs = np.random.RandomState(11)
        items = [(rs.randint(0, 24, (4,)), rs.randint(0, 96, (3, 8))),
                 (rs.randint(0, 24, (6,)), rs.randint(0, 96, (5, 8)))]
        got = fused.generate_batch([t for t, _ in items],
                                   [pc for _, pc in items])
        want = xla.generate_batch([t for t, _ in items],
                                  [pc for _, pc in items])
        for g, w in zip(got, want):
            np.testing.assert_array_equal(np.asarray(g), np.asarray(w))

    def test_int8_weights_tp_falls_back_to_xla_path(self):
        """int8 weights + TP: the fused gate declines (global activation
        scales) but the manual-TP XLA path runs them EXACTLY (integer psum) —
        tokens equal solo int8."""
        from valle2_tpu.models.ar import ValleAR, _fused_gate
        c = _ar_cfg(weight_dtype='int8', use_fused_decode=True)
        assert not _fused_gate(c, rows=2, total_max=64, tp_mp=2)
        assert _fused_gate(c, rows=2, total_max=64)    # solo keeps the kernel
        mesh = make_mesh(data=1, model=2)
        solo = ValleAR(c, seed=2)
        # Solo must ALSO take the XLA path for an apples-to-apples token
        # comparison (the fused int8 kernel rounds differently).
        import dataclasses
        solo = ValleAR(dataclasses.replace(c, use_fused_decode=False),
                       params=solo.params)
        meshed = ValleAR(c, params=solo.params, mesh=mesh)
        rs = np.random.RandomState(7)
        t, pc = rs.randint(0, 24, (5,)), rs.randint(0, 96, (4, 8))
        got = meshed.generate_batch([t], [pc], bucket=False)[0]
        want = solo.generate(jnp.asarray(t), jnp.asarray(pc), bucket=False)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


class TestTTSManualTP:
    """The fused TTS pipeline (AR while_loop → NAR 7-stage scan → codec
    decode) as ONE shard_map under manual TP — AR and NAR both Megatron-split
    per model rank, codec replicated."""

    def _cfg(self, **kw):
        return _ar_cfg(num_beams=1, max_audio_len=12, num_quantizers=8, **kw)

    def test_fused_pipeline_tp_matches_solo(self):
        from valle2_tpu.models.ar import ValleAR
        from valle2_tpu.parallel import make_model_mesh
        from valle2_tpu.tts import ValleTTS
        c = self._cfg(use_fused_decode=True, matmul_precision='default',
                      kv_cache_dtype='float32', dtype='float32')
        mesh = make_model_mesh(2)
        plain = ValleTTS(c)
        meshed = ValleTTS(c, ar=ValleAR(c, params=plain.ar.params),
                          nar=plain.nar, codec=plain.codec, mesh=mesh)
        assert meshed._pipe_tp == (('model',), 2)
        rs = np.random.RandomState(9)
        reqs = [('hello there.', rs.randint(0, 24, (3,)),
                 rs.randint(0, 96, (4, 8))) for _ in range(2)]
        got = meshed.batch_synthesize([r[0] for r in reqs],
                                      [r[1] for r in reqs],
                                      [r[2] for r in reqs])
        for (text, pt, pc), g in zip(reqs, got):
            want = plain.synthesize_fused(text, pt, pc)
            np.testing.assert_array_equal(g.codes, want.codes)
            np.testing.assert_allclose(g.waveform, want.waveform, atol=2e-5)

    def test_int4_pipeline_tp_fused_matches_xla(self):
        """The fused TTS pipeline under manual TP with int4 AR weights: the
        Pallas decode kernel (ranked q4, in-kernel dequant + ring all-reduce)
        against the same TP pipeline on the XLA step — codes and waveforms
        agree (identical ranked quantization, identical fp arithmetic in
        interpret mode)."""
        import dataclasses
        from valle2_tpu.models.ar import ValleAR
        from valle2_tpu.parallel import make_model_mesh
        from valle2_tpu.tts import ValleTTS
        c = self._cfg(weight_dtype='int4', use_fused_decode=True,
                      matmul_precision='default', kv_cache_dtype='float32',
                      dtype='float32')
        mesh = make_model_mesh(2)
        seedm = ValleAR(c)
        fused = ValleTTS(c, ar=ValleAR(c, params=seedm.params, mesh=mesh),
                         mesh=mesh)
        cx = dataclasses.replace(c, use_fused_decode=False)
        xla = ValleTTS(cx, ar=ValleAR(cx, params=seedm.params, mesh=mesh),
                       nar=fused.nar, codec=fused.codec, mesh=mesh)
        assert fused._pipe_tp == (('model',), 2)
        rs = np.random.RandomState(12)
        reqs = [('go on.', rs.randint(0, 24, (3,)),
                 rs.randint(0, 96, (4, 8))) for _ in range(2)]
        got = fused.batch_synthesize([r[0] for r in reqs],
                                     [r[1] for r in reqs],
                                     [r[2] for r in reqs])
        want = xla.batch_synthesize([r[0] for r in reqs],
                                    [r[1] for r in reqs],
                                    [r[2] for r in reqs])
        for g, w in zip(got, want):
            np.testing.assert_array_equal(g.codes, w.codes)
            np.testing.assert_allclose(g.waveform, w.waveform, atol=2e-5)

    def test_xla_pipeline_tp_matches_solo(self):
        """2x2 (data x model) mesh, XLA psum path (fused gate off on CPU):
        per-item codes equal the unmeshed fused pipeline."""
        from valle2_tpu.models.ar import ValleAR
        from valle2_tpu.tts import ValleTTS
        c = self._cfg()
        mesh = make_mesh(data=2, model=2)
        plain = ValleTTS(c)
        meshed = ValleTTS(c, ar=ValleAR(c, params=plain.ar.params),
                          nar=plain.nar, codec=plain.codec, mesh=mesh)
        assert meshed._pipe_tp == (('data', 'model'), 2)
        rs = np.random.RandomState(10)
        reqs = [(f'word {i}.', rs.randint(0, 24, (3,)),
                 rs.randint(0, 96, (4, 8))) for i in range(3)]
        got = meshed.batch_synthesize([r[0] for r in reqs],
                                      [r[1] for r in reqs],
                                      [r[2] for r in reqs])
        for (text, pt, pc), g in zip(reqs, got):
            want = plain.synthesize_fused(text, pt, pc)
            np.testing.assert_array_equal(g.codes, want.codes)
            np.testing.assert_allclose(g.waveform, want.waveform, atol=2e-5)


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
