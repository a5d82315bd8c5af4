"""Pallas kernel tests (interpreter mode on CPU; compiled on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from valle2_tpu.kernels.flash_attention import flash_attention, reference_attention


def make_qkv(seed, b, h, s, hd):
    ks = jax.random.split(jax.random.key(seed), 3)
    return tuple(jax.random.normal(k, (b, h, s, hd)) for k in ks)


class TestFlashAttention:
    @pytest.mark.parametrize('causal', [True, False])
    def test_matches_reference_unpadded(self, causal):
        b, h, s, hd = 2, 2, 160, 32
        q, k, v = make_qkv(0, b, h, s, hd)
        tokens_total = 48
        meta = jnp.asarray([[48, s], [48, s]], jnp.int32)
        out = flash_attention(q, k, v, meta, tokens_total, causal,
                              block_q=64, block_k=64)
        want = reference_attention(q, k, v, meta, tokens_total, causal)
        np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=2e-5)

    def test_matches_reference_with_padding(self):
        b, h, s, hd = 2, 2, 192, 32
        q, k, v = make_qkv(1, b, h, s, hd)
        tokens_total = 64
        # Row 0: only 40 valid tokens, codes end at 150; row 1 fully valid.
        meta = jnp.asarray([[40, 150], [64, 192]], jnp.int32)
        out = flash_attention(q, k, v, meta, tokens_total, True,
                              block_q=64, block_k=64)
        want = reference_attention(q, k, v, meta, tokens_total, True)
        # Compare only rows the model consumes (valid queries); padded-query rows
        # are don't-care (masked out of the loss downstream).
        o, w = np.asarray(out), np.asarray(want)
        np.testing.assert_allclose(o[0, :, :150], w[0, :, :150], atol=2e-5)
        np.testing.assert_allclose(o[1], w[1], atol=2e-5)

    @pytest.mark.parametrize('causal', [True, False])
    def test_folded_forward_matches_reference(self, causal):
        """fold_heads=True (kept for other head counts/hardware — off by
        default after measuring negative on v5e): the head-batched forward
        must match the reference and the per-head kernel exactly, including
        per-row padding."""
        b, h, s, hd = 2, 4, 160, 32
        q, k, v = make_qkv(21, b, h, s, hd)
        tokens_total = 48
        meta = jnp.asarray([[40, 150], [48, s]], jnp.int32)
        out = flash_attention(q, k, v, meta, tokens_total, causal,
                              fold_heads=True)
        want = reference_attention(q, k, v, meta, tokens_total, causal)
        o, w = np.asarray(out), np.asarray(want)
        np.testing.assert_allclose(o[0, :, :150], w[0, :, :150], atol=2e-5)
        np.testing.assert_allclose(o[1], w[1], atol=2e-5)
        per_head = np.asarray(flash_attention(q, k, v, meta, tokens_total,
                                              causal, fold_heads=False))
        np.testing.assert_allclose(o[0, :, :150], per_head[0, :, :150],
                                   atol=2e-5)

    def test_folded_grads_match_unfolded(self):
        """The backward always runs the per-head blockwise kernels off the
        folded forward's lse — grads must match the unfolded path."""
        b, h, s, hd = 1, 4, 128, 32
        q, k, v = make_qkv(22, b, h, s, hd)
        meta = jnp.asarray([[32, s]], jnp.int32)

        def loss(fold):
            def f(q, k, v):
                return jnp.sum(flash_attention(q, k, v, meta, 32, True,
                                               fold_heads=fold) ** 2)
            return jax.grad(f, argnums=(0, 1, 2))(q, k, v)

        for g_fold, g_plain in zip(loss(True), loss(False)):
            np.testing.assert_allclose(np.asarray(g_fold),
                                       np.asarray(g_plain), atol=2e-5)

    def test_folded_honors_explicit_blocks(self):
        """Explicit block_q/block_k must reach the folded forward (they were
        silently ignored — a folded block-size A/B measured nothing)."""
        b, h, s, hd = 1, 2, 256, 32
        q, k, v = make_qkv(23, b, h, s, hd)
        meta = jnp.asarray([[48, s]], jnp.int32)
        want = reference_attention(q, k, v, meta, 48, True)
        for bq, bk in ((64, 64), (128, 64), (None, None)):
            out = flash_attention(q, k, v, meta, 48, True, block_q=bq,
                                  block_k=bk, fold_heads=True)
            np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                                       atol=2e-5)

    def test_non_multiple_seq_len(self):
        b, h, s, hd = 1, 2, 100, 32    # not a block multiple -> internal padding
        q, k, v = make_qkv(2, b, h, s, hd)
        meta = jnp.asarray([[30, s]], jnp.int32)
        out = flash_attention(q, k, v, meta, 30, True, block_q=64, block_k=64)
        want = reference_attention(q, k, v, meta, 30, True)
        assert out.shape == (b, h, s, hd)
        np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=2e-5)

    def test_unequal_blocks_not_dividing_seq(self):
        """block_q=96, block_k=128, s=128: padding must go to a COMMON multiple
        (384) or the grid floor-division silently drops trailing q rows."""
        b, h, s, hd = 1, 2, 128, 32
        q, k, v = make_qkv(9, b, h, s, hd)
        meta = jnp.asarray([[40, s]], jnp.int32)
        out = flash_attention(q, k, v, meta, 40, True, block_q=96, block_k=128)
        want = reference_attention(q, k, v, meta, 40, True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=2e-5)

        def loss(q, k, v):
            return jnp.sum(flash_attention(q, k, v, meta, 40, True,
                                           block_q=96, block_k=128) ** 2)

        def ref_loss(q, k, v):
            return jnp.sum(reference_attention(q, k, v, meta, 40, True) ** 2)

        g = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
        r = jax.grad(ref_loss, argnums=(0, 1, 2))(q, k, v)
        for a, b_ in zip(g, r):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-4)

    def test_gradients_flow(self):
        b, h, s, hd = 1, 2, 64, 16
        q, k, v = make_qkv(3, b, h, s, hd)
        meta = jnp.asarray([[16, s]], jnp.int32)

        def loss(q, k, v):
            return jnp.sum(flash_attention(q, k, v, meta, 16, True,
                                           block_q=64, block_k=64) ** 2)

        gq, gk, gv = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)

        def ref_loss(q, k, v):
            return jnp.sum(reference_attention(q, k, v, meta, 16, True) ** 2)

        rq, rk, rv = jax.grad(ref_loss, argnums=(0, 1, 2))(q, k, v)
        np.testing.assert_allclose(np.asarray(gq), np.asarray(rq), atol=1e-4)
        np.testing.assert_allclose(np.asarray(gk), np.asarray(rk), atol=1e-4)
        np.testing.assert_allclose(np.asarray(gv), np.asarray(rv), atol=1e-4)

    def test_gradients_flow_blockwise_bwd(self):
        """blocks < seq routes the two-kernel (dq, dk/dv) backward; the whole-row
        single-pass fused backward is covered by test_gradients_flow."""
        b, h, s, hd = 1, 2, 128, 16
        q, k, v = make_qkv(4, b, h, s, hd)
        meta = jnp.asarray([[32, s]], jnp.int32)

        def loss(q, k, v):
            return jnp.sum(flash_attention(q, k, v, meta, 32, True,
                                           block_q=64, block_k=64) ** 2)

        gq, gk, gv = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)

        def ref_loss(q, k, v):
            return jnp.sum(reference_attention(q, k, v, meta, 32, True) ** 2)

        rq, rk, rv = jax.grad(ref_loss, argnums=(0, 1, 2))(q, k, v)
        np.testing.assert_allclose(np.asarray(gq), np.asarray(rq), atol=1e-4)
        np.testing.assert_allclose(np.asarray(gk), np.asarray(rk), atol=1e-4)
        np.testing.assert_allclose(np.asarray(gv), np.asarray(rv), atol=1e-4)

    def test_bf16_inputs_fwd_and_grad(self):
        """bf16 q/k/v (the training dtype) run bf16-input dots with f32
        accumulation — outputs/grads must track the f32 reference within bf16
        resolution."""
        b, h, s, hd = 2, 2, 96, 32
        qf, kf, vf = make_qkv(5, b, h, s, hd)
        q, k, v = (a.astype(jnp.bfloat16) for a in (qf, kf, vf))
        meta = jnp.asarray([[24, s], [24, 80]], jnp.int32)
        out = flash_attention(q, k, v, meta, 24, True, block_q=96, block_k=96)
        assert out.dtype == jnp.bfloat16
        want = reference_attention(qf, kf, vf, meta, 24, True)
        np.testing.assert_allclose(np.asarray(out, np.float32), np.asarray(want),
                                   atol=0.04)

        def loss(q, k, v):
            return jnp.sum(flash_attention(q, k, v, meta, 24, True,
                                           block_q=96, block_k=96)
                           .astype(jnp.float32) ** 2)

        def ref_loss(q, k, v):
            return jnp.sum(reference_attention(q, k, v, meta, 24, True)
                           .astype(jnp.float32) ** 2)

        g = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
        r = jax.grad(ref_loss, argnums=(0, 1, 2))(qf, kf, vf)
        for a, b_ in zip(g, r):
            assert a.dtype == jnp.bfloat16
            np.testing.assert_allclose(np.asarray(a, np.float32), np.asarray(b_),
                                       atol=0.5, rtol=0.1)

    def test_model_loss_with_flash_matches_bias_path(self):
        """AR loss with use_flash_attention == the materialized-bias path."""
        from valle2_tpu.config import ConfigValle
        from valle2_tpu.models import ar as ar_mod
        import dataclasses
        cfg = ConfigValle(d_model=32, n_heads=2, dim_feedforward=64, num_layers=2,
                          dropout=0.0, norm='LayerNorm')
        params = ar_mod.init_params(jax.random.key(0), cfg)
        rs = np.random.RandomState(0)
        batch = {
            'tokens': jnp.asarray(rs.randint(0, 255, (2, 6))),
            'tokens_lens': jnp.asarray([6, 4]),
            'codes': jnp.asarray(rs.randint(0, 1024, (2, 10))),
            'codes_lens': jnp.asarray([10, 7]),
            'target': jnp.asarray(rs.randint(0, 1024, (2, 10))),
        }
        l_bias, _ = ar_mod.loss_fn(params, cfg, batch, None)
        cfg_f = dataclasses.replace(cfg, use_flash_attention=True)
        l_flash, _ = ar_mod.loss_fn(params, cfg_f, batch, None)
        np.testing.assert_allclose(float(l_bias), float(l_flash), atol=1e-5)

    def test_nar_loss_and_grads_with_flash_match_bias_path(self):
        """NAR training (bidirectional mask, causal=False, AdaLN) through the
        flash kernel: loss AND grads must match the materialized-bias path."""
        from valle2_tpu.config import ConfigValle
        from valle2_tpu.models import nar as nar_mod
        import dataclasses
        cfg = ConfigValle(d_model=32, n_heads=2, dim_feedforward=64, num_layers=2,
                          dropout=0.0)
        params = nar_mod.init_params(jax.random.key(0), cfg)
        rs = np.random.RandomState(3)
        batch = {
            'tokens': jnp.asarray(rs.randint(0, 255, (2, 5))),
            'tokens_lens': jnp.asarray([5, 3]),
            'codes': jnp.asarray(rs.randint(0, 1024, (2, 9, 8))),
            'codes_lens': jnp.asarray([9, 6]),
        }
        rng = jax.random.key(1)
        cfg_f = dataclasses.replace(cfg, use_flash_attention=True)

        def loss(p, c):
            return nar_mod.loss_fn(p, c, batch, rng)[0]

        l_bias, g_bias = jax.value_and_grad(loss)(params, cfg)
        l_flash, g_flash = jax.value_and_grad(loss)(params, cfg_f)
        np.testing.assert_allclose(float(l_bias), float(l_flash), atol=1e-5)
        for a, b in zip(jax.tree.leaves(g_bias), jax.tree.leaves(g_flash)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-4)

    def test_nar_generate_with_flash_matches_bias_path(self):
        """Greedy 7-stage NAR refinement with flash == bias path token IDs."""
        from valle2_tpu.config import ConfigValle
        from valle2_tpu.models.nar import ValleNAR
        import dataclasses
        cfg = ConfigValle(d_model=32, n_heads=2, dim_feedforward=64, num_layers=2,
                          dropout=0.0, temperature=0.0, matmul_precision='highest',
                          use_flash_attention=False)
        model = ValleNAR(cfg, seed=0)
        model_f = ValleNAR(dataclasses.replace(cfg, use_flash_attention=True),
                           params=model.params)
        rs = np.random.RandomState(4)
        tokens = rs.randint(0, 255, (6,))
        pcodes = rs.randint(0, 1024, (5, 8))
        first = rs.randint(0, 1024, (7,))
        rng = jax.random.key(2)
        tgt = rs.randint(0, 255, (3,))
        want = np.asarray(model.generate(tokens, pcodes, tgt, first, rng=rng))
        got = np.asarray(model_f.generate(tokens, pcodes, tgt, first, rng=rng))
        np.testing.assert_array_equal(got, want)

    def test_decode_with_flash_prefill_matches_bias_path(self):
        """Greedy AR decode with the flash-routed prefill (the TPU default) must be
        token-identical to the materialized-bias prefill path."""
        from valle2_tpu.config import ConfigValle
        from valle2_tpu.models.ar import ValleAR
        import dataclasses
        cfg = ConfigValle(d_model=32, n_heads=2, dim_feedforward=64, num_layers=2,
                          dropout=0.0, norm='LayerNorm', max_audio_len=12,
                          num_beams=2, temperature=0.0, use_flash_attention=False,
                          matmul_precision='highest')
        model = ValleAR(cfg, seed=0)
        model_f = ValleAR(dataclasses.replace(cfg, use_flash_attention=True),
                          params=model.params)
        rs = np.random.RandomState(7)
        tokens = rs.randint(0, 255, (9,))
        codes = rs.randint(0, 1024, (6, 8))
        rng = jax.random.key(3)
        got = np.asarray(model_f.generate(tokens, codes, rng=rng))
        want = np.asarray(model.generate(tokens, codes, rng=rng))
        np.testing.assert_array_equal(got, want)


class TestFusedDecode:
    def test_fused_step_matches_unfused(self):
        """Single fused whole-stack step == transformer_decode_step numerics."""
        from valle2_tpu.ops.transformer import KVCache, transformer_decode_step, \
            transformer_init
        from valle2_tpu.kernels.fused_decode import (fused_cache_layout,
                                                     fused_decode_step)
        L, rows, h, hd, dff, S = 2, 3, 2, 16, 64, 40
        d = h * hd
        ttm, pm = 6, 8
        p = transformer_init(jax.random.key(0), L, d, h, dff, adaptive_norm=False)
        cache = KVCache(jax.random.normal(jax.random.key(1), (L, rows, h, S, hd)),
                        jax.random.normal(jax.random.key(2), (L, rows, h, S, hd)))
        x = jax.random.normal(jax.random.key(3), (rows, 1, d))
        tl = jnp.asarray([6, 4, 5])
        plen = jnp.asarray([8, 6, 3])
        index = jnp.int32(ttm + pm + 5)

        got_y, got_cache = fused_decode_step(p, x, h, fused_cache_layout(cache),
                                             index, tl, plen, ttm, pm)

        slots = jnp.arange(S)[None, :]
        attend = ((slots < tl[:, None])
                  | ((slots >= ttm) & (slots < ttm + plen[:, None]))
                  | ((slots >= ttm + pm) & (slots <= index)))
        want_y, want_cache = transformer_decode_step(p, x, h, cache, index,
                                                     attend_mask=attend)
        want_cache = fused_cache_layout(want_cache)
        np.testing.assert_allclose(np.asarray(got_y), np.asarray(want_y),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(got_cache.k), np.asarray(want_cache.k),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(got_cache.v), np.asarray(want_cache.v),
                                   atol=1e-5)

    def test_fused_step_int8_weights_matches_unfused(self):
        """int8-weight mode (s8 dots + in-kernel activation quant) == the XLA
        int8 path (ops.nn.linear dispatch) on the same quantized params."""
        from valle2_tpu.ops.transformer import KVCache, transformer_decode_step, \
            transformer_init
        from valle2_tpu.quantize import quantize_transformer
        from valle2_tpu.kernels.fused_decode import (fused_cache_layout,
                                                     fused_decode_step)
        L, rows, h, hd, dff, S = 2, 3, 2, 16, 64, 40
        d = h * hd
        ttm, pm = 6, 8
        p = quantize_transformer(transformer_init(
            jax.random.key(0), L, d, h, dff, adaptive_norm=False))
        cache = KVCache(jax.random.normal(jax.random.key(1), (L, rows, h, S, hd)),
                        jax.random.normal(jax.random.key(2), (L, rows, h, S, hd)))
        x = jax.random.normal(jax.random.key(3), (rows, 1, d))
        tl = jnp.asarray([6, 4, 5])
        plen = jnp.asarray([8, 6, 3])
        index = jnp.int32(ttm + pm + 5)

        got_y, got_cache = fused_decode_step(p, x, h, fused_cache_layout(cache),
                                             index, tl, plen, ttm, pm)
        slots = jnp.arange(S)[None, :]
        attend = ((slots < tl[:, None])
                  | ((slots >= ttm) & (slots < ttm + plen[:, None]))
                  | ((slots >= ttm + pm) & (slots <= index)))
        want_y, want_cache = transformer_decode_step(p, x, h, cache, index,
                                                     attend_mask=attend)
        want_cache = fused_cache_layout(want_cache)
        np.testing.assert_allclose(np.asarray(got_y), np.asarray(want_y),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(got_cache.k),
                                   np.asarray(want_cache.k), atol=1e-5)
        np.testing.assert_allclose(np.asarray(got_cache.v),
                                   np.asarray(want_cache.v), atol=1e-5)

    def test_fused_step_int4_weights_matches_unfused(self):
        """int4 W4A16 mode (in-kernel nibble unpack + group dequant + fp dots)
        == the XLA int4 path (ops.nn.linear 'q4' dispatch) on the same packed
        params."""
        from valle2_tpu.ops.transformer import KVCache, transformer_decode_step, \
            transformer_init
        from valle2_tpu.quantize import quantize_transformer
        from valle2_tpu.kernels.fused_decode import (fused_cache_layout,
                                                     fused_decode_step)
        L, rows, h, hd, dff, S = 2, 3, 2, 16, 64, 40
        d = h * hd
        ttm, pm = 6, 8
        p = quantize_transformer(transformer_init(
            jax.random.key(0), L, d, h, dff, adaptive_norm=False), bits=4)
        assert 'q4' in p['attn']['qkv'] and 'scale4' in p['attn']['qkv']
        cache = KVCache(jax.random.normal(jax.random.key(1), (L, rows, h, S, hd)),
                        jax.random.normal(jax.random.key(2), (L, rows, h, S, hd)))
        x = jax.random.normal(jax.random.key(3), (rows, 1, d))
        tl = jnp.asarray([6, 4, 5])
        plen = jnp.asarray([8, 6, 3])
        index = jnp.int32(ttm + pm + 5)

        got_y, got_cache = fused_decode_step(p, x, h, fused_cache_layout(cache),
                                             index, tl, plen, ttm, pm)
        slots = jnp.arange(S)[None, :]
        attend = ((slots < tl[:, None])
                  | ((slots >= ttm) & (slots < ttm + plen[:, None]))
                  | ((slots >= ttm + pm) & (slots <= index)))
        want_y, want_cache = transformer_decode_step(p, x, h, cache, index,
                                                     attend_mask=attend)
        want_cache = fused_cache_layout(want_cache)
        np.testing.assert_allclose(np.asarray(got_y), np.asarray(want_y),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(got_cache.k),
                                   np.asarray(want_cache.k), atol=1e-5)
        np.testing.assert_allclose(np.asarray(got_cache.v),
                                   np.asarray(want_cache.v), atol=1e-5)

    def test_fused_step_chunked_matches_unfused(self, monkeypatch):
        """VALLE2_FUSED_CHUNK routes the chunked online-softmax path with the
        clamped chunk index map (prefix skip, opt-in — measured negative on the
        target runtime); results must match the unfused step for an index in
        the FIRST chunk (later chunks skipped) and in the last."""
        from valle2_tpu.ops.transformer import KVCache, transformer_decode_step, \
            transformer_init
        from valle2_tpu.kernels.fused_decode import (pick_chunk,
                                                     fused_cache_layout,
                                                     fused_decode_step)
        monkeypatch.setenv('VALLE2_FUSED_CHUNK', '128')
        L, rows, h, hd, dff, S = 2, 2, 2, 16, 64, 256
        assert pick_chunk(S, rows, h * 16, h, 4, False) == 128 and S // 128 == 2
        d = h * hd
        ttm, pm = 8, 16
        p = transformer_init(jax.random.key(0), L, d, h, dff, adaptive_norm=False)
        cache = KVCache(jax.random.normal(jax.random.key(1), (L, rows, h, S, hd)),
                        jax.random.normal(jax.random.key(2), (L, rows, h, S, hd)))
        x = jax.random.normal(jax.random.key(3), (rows, 1, d))
        tl = jnp.asarray([8, 5])
        plen = jnp.asarray([16, 11])
        slots = jnp.arange(S)[None, :]
        for index in (jnp.int32(ttm + pm + 3), jnp.int32(S - 2)):
            got_y, got_cache = fused_decode_step(p, x, h, fused_cache_layout(cache),
                                                 index, tl, plen, ttm, pm)
            attend = ((slots < tl[:, None])
                      | ((slots >= ttm) & (slots < ttm + plen[:, None]))
                      | ((slots >= ttm + pm) & (slots <= index)))
            want_y, want_cache = transformer_decode_step(p, x, h, cache, index,
                                                         attend_mask=attend)
            want_cache = fused_cache_layout(want_cache)
            np.testing.assert_allclose(np.asarray(got_y), np.asarray(want_y),
                                       rtol=1e-4, atol=1e-4)
            np.testing.assert_allclose(np.asarray(got_cache.k),
                                       np.asarray(want_cache.k), atol=1e-5)

    @pytest.mark.parametrize('rows,h,hd,S,ttm,pm,idx_off', [
        (1, 1, 32, 24, 4, 6, 0),       # single row/head, first generated step
        (2, 4, 16, 50, 7, 9, 10),      # odd S, many heads
        (5, 2, 32, 33, 3, 5, 24),      # odd everything, index near the end
    ])
    def test_fused_step_geometry_sweep(self, rows, h, hd, S, ttm, pm, idx_off):
        """The head-major kernel must match the unfused step across geometries
        (odd widths, single row/head, first and late indices)."""
        from valle2_tpu.ops.transformer import KVCache, transformer_decode_step, \
            transformer_init
        from valle2_tpu.kernels.fused_decode import (fused_cache_layout,
                                                     fused_decode_step)
        d = h * hd
        p = transformer_init(jax.random.key(41), 2, d, h, 2 * d,
                             adaptive_norm=False)
        cache = KVCache(jax.random.normal(jax.random.key(42), (2, rows, h, S, hd)),
                        jax.random.normal(jax.random.key(43), (2, rows, h, S, hd)))
        x = jax.random.normal(jax.random.key(44), (rows, 1, d))
        rs = np.random.RandomState(45)
        tl = jnp.asarray(rs.randint(1, ttm + 1, (rows,)))
        plen = jnp.asarray(rs.randint(1, pm + 1, (rows,)))
        index = jnp.int32(ttm + pm + idx_off)
        got_y, _ = fused_decode_step(p, x, h, fused_cache_layout(cache), index,
                                     tl, plen, ttm, pm)
        slots = jnp.arange(S)[None, :]
        attend = ((slots < tl[:, None])
                  | ((slots >= ttm) & (slots < ttm + plen[:, None]))
                  | ((slots >= ttm + pm) & (slots <= index)))
        want_y, _ = transformer_decode_step(p, x, h, cache, index,
                                            attend_mask=attend)
        np.testing.assert_allclose(np.asarray(got_y), np.asarray(want_y),
                                   rtol=1e-4, atol=1e-4)

    def test_fused_step_int8_matches_unfused_int8(self):
        """Fused step over an int8 cache (in-kernel dequant) ~= the unfused int8
        path (both see the same quantize→dequantize roundtrips)."""
        from valle2_tpu.ops.transformer import (KVCache, quantize_kv,
                                                transformer_decode_step,
                                                transformer_init)
        from valle2_tpu.kernels.fused_decode import (fused_cache_layout,
                                                     fused_decode_step)
        L, rows, h, hd, dff, S = 2, 2, 2, 16, 64, 32
        d = h * hd
        ttm, pm = 5, 6
        p = transformer_init(jax.random.key(0), L, d, h, dff, adaptive_norm=False)
        kf = jax.random.normal(jax.random.key(1), (L, rows, h, S, hd))
        vf = jax.random.normal(jax.random.key(2), (L, rows, h, S, hd))
        kq, ks = quantize_kv(kf)
        vq, vs = quantize_kv(vf)
        cache = KVCache(kq, vq, ks, vs)
        x = jax.random.normal(jax.random.key(3), (rows, 1, d))
        tl = jnp.asarray([5, 3])
        plen = jnp.asarray([6, 4])
        index = jnp.int32(ttm + pm + 3)

        got_y, got_cache = fused_decode_step(p, x, h, fused_cache_layout(cache),
                                             index, tl, plen, ttm, pm)
        slots = jnp.arange(S)[None, :]
        attend = ((slots < tl[:, None])
                  | ((slots >= ttm) & (slots < ttm + plen[:, None]))
                  | ((slots >= ttm + pm) & (slots <= index)))
        want_y, want_cache = transformer_decode_step(p, x, h, cache, index,
                                                     attend_mask=attend)
        want_cache = fused_cache_layout(want_cache)
        np.testing.assert_allclose(np.asarray(got_y), np.asarray(want_y),
                                   rtol=5e-3, atol=5e-3)
        # Quantized slots may differ by 1 int8 step where x/scale lands exactly
        # on a rounding boundary (f32 summation-order differences).
        for got, want in ((got_cache.k, want_cache.k), (got_cache.v, want_cache.v)):
            diff = np.abs(np.asarray(got, np.int32) - np.asarray(want, np.int32))
            assert diff.max() <= 1 and (diff > 0).mean() < 1e-3

    def test_fused_decode_greedy_token_parity(self):
        """Full greedy decode with use_fused_decode=True is token-identical to the
        unfused path."""
        from valle2_tpu.config import ConfigValle
        from valle2_tpu.models.ar import ValleAR
        import dataclasses
        cfg = ConfigValle(d_model=32, n_heads=2, dim_feedforward=64, num_layers=2,
                          dropout=0.0, norm='LayerNorm', max_audio_len=10,
                          num_beams=2, temperature=0.0, use_fused_decode=False,
                          matmul_precision='highest', bucket_sizes=(16,))
        model = ValleAR(cfg, seed=0)
        model_f = ValleAR(dataclasses.replace(cfg, use_fused_decode=True),
                          params=model.params)
        rs = np.random.RandomState(11)
        tokens = rs.randint(0, 255, (7,))
        codes = rs.randint(0, 1024, (5, 8))
        rng = jax.random.key(5)
        want = np.asarray(model.generate(tokens, codes, rng=rng))
        got = np.asarray(model_f.generate(tokens, codes, rng=rng))
        np.testing.assert_array_equal(got, want)


class TestFusedVerify:
    """Fused q-block verify kernel (speculative decoding): must match the XLA
    q-token ``transformer_decode_step`` under the speculative attend mask —
    per-row write indices, in-block causality (query i sees draft keys j <= i
    from REGISTERS, the cache slots being stale), int8 KV/weights, chunked
    caches with the block straddling a chunk boundary."""

    def _setup(self, K=3, S=48, seed=0):
        from valle2_tpu.ops.transformer import KVCache, transformer_init
        L, rows, h, hd, dff = 2, 3, 2, 16, 64
        d = h * hd
        ttm, pm = 6, 8
        p = transformer_init(jax.random.key(seed), L, d, h, dff,
                             adaptive_norm=False)
        cache = KVCache(
            jax.random.normal(jax.random.key(seed + 1), (L, rows, h, S, hd)),
            jax.random.normal(jax.random.key(seed + 2), (L, rows, h, S, hd)))
        x = jax.random.normal(jax.random.key(seed + 3), (rows, K, d))
        tl = jnp.asarray([6, 4, 5])
        plen = jnp.asarray([8, 6, 3])
        return p, cache, x, tl, plen, (h, ttm, pm, S, K)

    @staticmethod
    def _attend(tl, plen, index, ttm, pm, S, K):
        slots = jnp.arange(S)[None, None, :]
        qi = jnp.arange(K)[None, :, None]
        base = ((slots < tl[:, None, None])
                | ((slots >= ttm) & (slots < ttm + plen[:, None, None])))
        return base | ((slots >= ttm + pm)
                       & (slots <= index[:, None, None] + qi))

    def test_matches_xla_block_step(self):
        from valle2_tpu.ops.transformer import transformer_decode_step
        from valle2_tpu.kernels.fused_decode import (fused_cache_layout,
                                                     fused_verify_step)
        p, cache, x, tl, plen, (h, ttm, pm, S, K) = self._setup()
        index = jnp.asarray([ttm + pm + 5, ttm + pm + 2, ttm + pm + 9],
                            jnp.int32)
        got_y, got_cache = fused_verify_step(p, x, h, fused_cache_layout(cache),
                                             index, tl, plen, ttm, pm)
        want_y, want_cache = transformer_decode_step(
            p, x, h, cache, index,
            attend_mask=self._attend(tl, plen, index, ttm, pm, S, K))
        want_cache = fused_cache_layout(want_cache)
        np.testing.assert_allclose(np.asarray(got_y), np.asarray(want_y),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(got_cache.k),
                                   np.asarray(want_cache.k), atol=1e-5)
        np.testing.assert_allclose(np.asarray(got_cache.v),
                                   np.asarray(want_cache.v), atol=1e-5)

    def test_int8_cache_matches_xla(self):
        from valle2_tpu.ops.transformer import (KVCache, quantize_kv,
                                                transformer_decode_step)
        from valle2_tpu.kernels.fused_decode import (fused_cache_layout,
                                                     fused_verify_step)
        p, cache, x, tl, plen, (h, ttm, pm, S, K) = self._setup(seed=10)
        kq, ks = quantize_kv(cache.k)
        vq, vs = quantize_kv(cache.v)
        qcache = KVCache(kq, vq, ks, vs)
        index = jnp.asarray([ttm + pm + 5, ttm + pm + 2, ttm + pm + 9],
                            jnp.int32)
        got_y, got_cache = fused_verify_step(
            p, x, h, fused_cache_layout(qcache), index, tl, plen, ttm, pm)
        want_y, want_cache = transformer_decode_step(
            p, x, h, qcache, index,
            attend_mask=self._attend(tl, plen, index, ttm, pm, S, K))
        want_cache = fused_cache_layout(want_cache)
        np.testing.assert_allclose(np.asarray(got_y), np.asarray(want_y),
                                   rtol=5e-3, atol=5e-3)
        for g, w in ((got_cache.k, want_cache.k), (got_cache.v, want_cache.v)):
            diff = np.abs(np.asarray(g, np.int32) - np.asarray(w, np.int32))
            assert diff.max() <= 1 and (diff > 0).mean() < 1e-2

    def test_int8_weights_match_xla(self):
        from valle2_tpu.ops.transformer import transformer_decode_step
        from valle2_tpu.quantize import quantize_transformer
        from valle2_tpu.kernels.fused_decode import (fused_cache_layout,
                                                     fused_verify_step)
        p, cache, x, tl, plen, (h, ttm, pm, S, K) = self._setup(seed=20)
        p = quantize_transformer(p)
        index = jnp.asarray([ttm + pm + 5, ttm + pm + 2, ttm + pm + 9],
                            jnp.int32)
        got_y, _ = fused_verify_step(p, x, h, fused_cache_layout(cache),
                                     index, tl, plen, ttm, pm)
        want_y, _ = transformer_decode_step(
            p, x, h, cache, index,
            attend_mask=self._attend(tl, plen, index, ttm, pm, S, K))
        np.testing.assert_allclose(np.asarray(got_y), np.asarray(want_y),
                                   rtol=1e-4, atol=1e-4)

    def test_int4_weights_match_xla(self):
        """int4 W4A16 in the verify kernel: in-kernel _q4_dot group dequant
        == the XLA int4 dispatch on the same packed params."""
        from valle2_tpu.ops.transformer import transformer_decode_step
        from valle2_tpu.quantize import quantize_transformer
        from valle2_tpu.kernels.fused_decode import (fused_cache_layout,
                                                     fused_verify_step)
        p, cache, x, tl, plen, (h, ttm, pm, S, K) = self._setup(seed=30)
        p = quantize_transformer(p, bits=4)
        assert 'q4' in p['attn']['qkv']
        index = jnp.asarray([ttm + pm + 5, ttm + pm + 2, ttm + pm + 9],
                            jnp.int32)
        got_y, _ = fused_verify_step(p, x, h, fused_cache_layout(cache),
                                     index, tl, plen, ttm, pm)
        want_y, _ = transformer_decode_step(
            p, x, h, cache, index,
            attend_mask=self._attend(tl, plen, index, ttm, pm, S, K))
        np.testing.assert_allclose(np.asarray(got_y), np.asarray(want_y),
                                   rtol=1e-4, atol=1e-4)

    def test_chunked_block_straddles_boundary(self, monkeypatch):
        """Forced chunk 16 on S=48: row 0's block [14, 17) straddles the
        chunk-0/1 boundary — the in-register block contribution (applied at
        the LAST visited chunk) must still match the XLA step exactly."""
        from valle2_tpu.ops.transformer import transformer_decode_step
        from valle2_tpu.kernels.fused_decode import (fused_cache_layout,
                                                     fused_verify_step)
        monkeypatch.setenv('VALLE2_FUSED_CHUNK', '16')
        p, cache, x, tl, plen, (h, ttm, pm, S, K) = self._setup(seed=30)
        index = jnp.asarray([14, 30, 20], jnp.int32)
        got_y, got_cache = fused_verify_step(p, x, h, fused_cache_layout(cache),
                                             index, tl, plen, ttm, pm)
        want_y, want_cache = transformer_decode_step(
            p, x, h, cache, index,
            attend_mask=self._attend(tl, plen, index, ttm, pm, S, K))
        want_cache = fused_cache_layout(want_cache)
        np.testing.assert_allclose(np.asarray(got_y), np.asarray(want_y),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(got_cache.k),
                                   np.asarray(want_cache.k), atol=1e-5)

    def test_scalar_index_broadcasts(self):
        """A scalar index (all rows at the same depth — spec turn 0) must
        equal the explicit per-row vector call."""
        from valle2_tpu.kernels.fused_decode import (fused_cache_layout,
                                                     fused_verify_step)
        p, cache, x, tl, plen, (h, ttm, pm, S, K) = self._setup(seed=40)
        rows = x.shape[0]
        fcache = fused_cache_layout(cache)
        got_y, got_c = fused_verify_step(p, x, h, fcache, jnp.int32(ttm + pm),
                                         tl, plen, ttm, pm)
        want_y, want_c = fused_verify_step(
            p, x, h, fcache, jnp.full((rows,), ttm + pm, jnp.int32),
            tl, plen, ttm, pm)
        np.testing.assert_array_equal(np.asarray(got_y), np.asarray(want_y))
        np.testing.assert_array_equal(np.asarray(got_c.k), np.asarray(want_c.k))


class TestRVQKernel:
    def test_matches_jnp_rvq_exactly(self):
        from valle2_tpu.codec.rvq import rvq_encode, rvq_init
        from valle2_tpu.kernels.rvq import rvq_encode_fused
        p = rvq_init(jax.random.key(0), num_quantizers=8, codebook_size=1024, dim=128)
        latents = jax.random.normal(jax.random.key(1), (2, 300, 128))
        want = rvq_encode(p, latents, 8)
        got = rvq_encode_fused(p['codebooks'], latents, 8)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    def test_partial_quantizers_and_odd_lengths(self):
        from valle2_tpu.codec.rvq import rvq_encode, rvq_init
        from valle2_tpu.kernels.rvq import rvq_encode_fused
        p = rvq_init(jax.random.key(2), num_quantizers=8, codebook_size=1024, dim=128)
        latents = jax.random.normal(jax.random.key(3), (1, 77, 128))
        want = rvq_encode(p, latents, 4)
        got = rvq_encode_fused(p['codebooks'], latents, 4)
        assert got.shape == (1, 4, 77)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


class TestPickChunk:
    def test_whole_seq_when_block_fits(self, monkeypatch):
        from valle2_tpu.kernels.fused_decode import pick_chunk
        monkeypatch.delenv('VALLE2_FUSED_CHUNK', raising=False)
        # default scale: 4 rows x d=256 bf16 -> well under the 8 MB cap
        assert pick_chunk(728, 4, 256, 4, 2, False) == 728

    def test_auto_chunks_oversize_blocks(self, monkeypatch):
        from valle2_tpu.kernels.fused_decode import pick_chunk, BLOCK_BYTES_CAP
        monkeypatch.delenv('VALLE2_FUSED_CHUNK', raising=False)
        # 204M at 4 beams: per-slot = 4*(2*1024)*2 = 16 KiB -> chunk 512
        chunk = pick_chunk(1734, 4, 1024, 16, 2, False)
        assert chunk == 512
        assert chunk % 128 == 0
        assert 4 * (2 * 1024) * 2 * chunk <= BLOCK_BYTES_CAP

    def test_env_override_wins(self, monkeypatch):
        from valle2_tpu.kernels.fused_decode import pick_chunk
        monkeypatch.setenv('VALLE2_FUSED_CHUNK', '256')
        assert pick_chunk(1734, 4, 1024, 16, 2, False) == 256

    def test_pick_chunk_invariants(self, monkeypatch):
        """For any geometry: chunk divides into the cap (or is the 128 floor),
        is lane-aligned, and never exceeds seq."""
        from valle2_tpu.kernels.fused_decode import pick_chunk, BLOCK_BYTES_CAP
        monkeypatch.delenv('VALLE2_FUSED_CHUNK', raising=False)
        for rows in (1, 4, 8):
            for d in (256, 1024, 2048):
                for quant in (False, True):
                    item = 1 if quant else 2
                    seq = 4096
                    c = pick_chunk(seq, rows, d, d // 64, item, quant)
                    assert c <= seq and (c == seq or c % 128 == 0)
                    per_slot = (rows * 2 * d * item
                                + (rows * 4 * (d // 64) if quant else 0))
                    if c < seq and c > 128:
                        assert c * per_slot <= BLOCK_BYTES_CAP

    def test_unpadded_oversize_seq_raises(self, monkeypatch):
        """A cache length that needs chunking but isn't a chunk multiple must
        fail loudly (silent whole-S would re-create the Mosaic VMEM OOM)."""
        from valle2_tpu.ops.transformer import KVCache, transformer_init
        from valle2_tpu.kernels.fused_decode import (fused_cache_layout,
                                                     fused_decode_step,
                                                     pick_chunk)
        monkeypatch.delenv('VALLE2_FUSED_CHUNK', raising=False)
        L, rows, h, hd, dff = 1, 8, 16, 64, 128
        d = h * hd
        S = 4000                      # per_slot 32 KiB -> chunk 256; 4000 % 256 != 0
        assert pick_chunk(S, rows, d, h, 2, False) == 256
        p = transformer_init(jax.random.key(0), L, d, h, dff, adaptive_norm=False)
        cache = KVCache(jnp.zeros((L, rows, h, S, hd)),
                        jnp.zeros((L, rows, h, S, hd)))
        x = jnp.zeros((rows, 1, d))
        with pytest.raises(ValueError, match='multiple'):
            fused_decode_step(p, x, h, fused_cache_layout(cache), jnp.int32(10),
                              jnp.zeros((rows,), jnp.int32),
                              jnp.zeros((rows,), jnp.int32), 4, 4)

    def test_env_override_in_padding_window_converges(self, monkeypatch):
        """An env-forced chunk that only becomes applicable AFTER auto-padding
        (total < forced < padded) must reach a fixed point where the final
        length is a multiple of the final chunk (ar._decode_prefill's loop)."""
        import jax.numpy as jnp
        from valle2_tpu.kernels.fused_decode import chunk_for
        monkeypatch.setenv('VALLE2_FUSED_CHUNK', '1900')
        total = 1800                       # auto chunk 256 -> pad 2048 -> env
        for _ in range(3):                 # 1900 applies -> pad 3800 -> stable
            c = chunk_for(total, 8, 1024, 16, jnp.bfloat16)
            if c >= total or total % c == 0:
                break
            total = -(-total // c) * c
        assert total % chunk_for(total, 8, 1024, 16, jnp.bfloat16) == 0


class TestFlashV2:
    """Round-3 kernel upgrades: causal/padding block skip (exact — skipped
    blocks are fully masked) and the head-folded forward."""

    @pytest.mark.parametrize('causal', [True, False])
    def test_block_skip_matches_reference(self, causal):
        """Small blocks force many kv blocks; the dynamic bound must skip
        masked ones without changing a single output value."""
        b, h, s, hd = 2, 2, 256, 32
        q, k, v = make_qkv(11, b, h, s, hd)
        meta = jnp.asarray([[40, 180], [64, 256]], jnp.int32)
        out = flash_attention(q, k, v, meta, 64, causal, block_q=64, block_k=64)
        want = reference_attention(q, k, v, meta, 64, causal)
        o, w = np.asarray(out), np.asarray(want)
        np.testing.assert_allclose(o[0, :, :180], w[0, :, :180], atol=2e-5)
        np.testing.assert_allclose(o[1], w[1], atol=2e-5)

    def test_block_skip_gradients_match_full_visit(self):
        """dq/dk/dv with skip == the jnp reference gradients (the dkv lower
        bound and dq upper bound drop only zero-contribution blocks)."""
        b, h, s, hd = 1, 2, 256, 32
        q, k, v = make_qkv(12, b, h, s, hd)
        meta = jnp.asarray([[48, 200]], jnp.int32)

        def loss_flash(q, k, v):
            o = flash_attention(q, k, v, meta, 64, True, block_q=64, block_k=64)
            return jnp.sum(jnp.where(jnp.arange(s)[None, None, :, None] < 200,
                                     o, 0.0) ** 2)

        def loss_ref(q, k, v):
            o = reference_attention(q, k, v, meta, 64, True)
            return jnp.sum(jnp.where(jnp.arange(s)[None, None, :, None] < 200,
                                     o, 0.0) ** 2)

        g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
        g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for a, b_ in zip(g_flash, g_ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       atol=5e-4, rtol=1e-3)

    @pytest.mark.parametrize('causal', [True, False])
    def test_folded_forward_matches_reference(self, causal):
        b, h, s, hd = 2, 4, 192, 32
        q, k, v = make_qkv(13, b, h, s, hd)
        meta = jnp.asarray([[40, 150], [64, 192]], jnp.int32)
        out = flash_attention(q, k, v, meta, 64, causal, fold_heads=True)
        want = reference_attention(q, k, v, meta, 64, causal)
        o, w = np.asarray(out), np.asarray(want)
        np.testing.assert_allclose(o[0, :, :150], w[0, :, :150], atol=2e-5)
        np.testing.assert_allclose(o[1], w[1], atol=2e-5)

    def test_folded_forward_multiblock(self):
        """Folded kernel with an explicit small block_k exercises its online
        softmax across kv chunks + the skip bound."""
        b, h, s, hd = 1, 4, 256, 32
        q, k, v = make_qkv(14, b, h, s, hd)
        meta = jnp.asarray([[48, 256]], jnp.int32)
        out = flash_attention(q, k, v, meta, 48, True, block_q=128, block_k=64,
                              fold_heads=True)
        want = reference_attention(q, k, v, meta, 48, True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=2e-5)

    def test_folded_gradients_match(self):
        """fold_heads=True backward (shared blockwise kernels, folded-fwd lse)
        equals the reference grads."""
        b, h, s, hd = 1, 2, 128, 32
        q, k, v = make_qkv(15, b, h, s, hd)
        meta = jnp.asarray([[32, 128]], jnp.int32)
        g1 = jax.grad(lambda q: jnp.sum(flash_attention(
            q, k, v, meta, 32, True, fold_heads=True) ** 2))(q)
        g2 = jax.grad(lambda q: jnp.sum(reference_attention(
            q, k, v, meta, 32, True) ** 2))(q)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                                   atol=5e-4, rtol=1e-3)

    def test_env_override_controls_fold(self, monkeypatch):
        from valle2_tpu.kernels.flash_attention import _fold_default
        monkeypatch.setenv('VALLE2_FLASH_FOLD', '1')
        assert _fold_default(4, 512) is True
        monkeypatch.setenv('VALLE2_FLASH_FOLD', '0')
        assert _fold_default(4, 512) is False


class TestChunkOverridePrecedence:
    def test_env_wins_over_config_forced(self, monkeypatch):
        """VALLE2_FUSED_CHUNK is the operator escape hatch: it must beat
        config.decode_chunk (which streaming sets implicitly)."""
        from valle2_tpu.kernels.fused_decode import chunk_for
        monkeypatch.setenv('VALLE2_FUSED_CHUNK', '256')
        assert chunk_for(2048, 1, 256, 2, jnp.bfloat16, forced=512) == 256
        monkeypatch.delenv('VALLE2_FUSED_CHUNK')
        assert chunk_for(2048, 1, 256, 2, jnp.bfloat16, forced=512) == 512
        # forced >= seq falls back to auto (whole-S when it fits the cap).
        assert chunk_for(512, 1, 256, 2, jnp.bfloat16, forced=10**6) == 512

    def test_fold_env_accepts_falsey_spellings(self, monkeypatch):
        from valle2_tpu.kernels.flash_attention import _fold_default
        for v in ('0', 'false', 'False', 'FALSE', 'off', 'no', ''):
            monkeypatch.setenv('VALLE2_FLASH_FOLD', v)
            assert _fold_default(4, 512) is False, v
        monkeypatch.setenv('VALLE2_FLASH_FOLD', '1')
        assert _fold_default(4, 512) is True
