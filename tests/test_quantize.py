"""int8 weight-only quantization (quantize.py): numerics of the quantized
matmul, pytree plumbing, and the quantized AR decode path.

No reference counterpart (the reference is pure-f32 torch); the contracts are
internal: bounded quantization error, bitwise agreement with a host-side
simulation of the same integer computation, and a decode path that stays close
to the dense one."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from valle2_tpu.config import ConfigValle
from valle2_tpu.models import ar as ar_mod
from valle2_tpu.models.ar import ValleAR
from valle2_tpu.ops.nn import linear
from valle2_tpu.quantize import (dequantize_linear, int8_matmul, quantize_linear,
                                 quantize_decode_params)


def cfg(**kw):
    base = dict(d_model=48, n_heads=2, dim_feedforward=96, num_layers=2,
                num_audio_tokens=96, vocab_size=24, dropout=0.0, temperature=0.0,
                num_beams=2, max_audio_len=16, norm='LayerNorm',
                bucket_sizes=(16, 32), matmul_precision='highest')
    base.update(kw)
    return ConfigValle(**base)


class TestQuantizeLinear:
    def test_roundtrip_error_bounded(self):
        """|w - dequant(quant(w))| <= scale/2 per output channel."""
        w = jax.random.normal(jax.random.key(0), (64, 32), jnp.float32)
        qp = quantize_linear({'w': w})
        assert qp['q'].dtype == jnp.int8 and qp['scale'].shape == (32,)
        wd = dequantize_linear(qp)['w']
        err = np.abs(np.asarray(w - wd))
        bound = np.asarray(qp['scale'])[None, :] * 0.5 + 1e-7
        assert (err <= bound).all()

    def test_int8_matmul_matches_integer_simulation(self):
        """The device computation equals a host float32/int32 simulation of the
        same quantize→s8-dot→rescale pipeline."""
        kx, kw = jax.random.split(jax.random.key(1))
        x = jax.random.normal(kx, (5, 24), jnp.float32) * 3.0
        w = jax.random.normal(kw, (24, 16), jnp.float32)
        qp = quantize_linear({'w': w})
        got = np.asarray(int8_matmul(x, qp['q'], qp['scale']))

        xn = np.asarray(x, np.float32)
        sx = np.maximum(np.max(np.abs(xn), axis=-1, keepdims=True), 1e-8) / 127.0
        xq = np.clip(np.round(xn / sx), -127, 127).astype(np.int32)
        yq = xq @ np.asarray(qp['q'], np.int32)
        want = yq.astype(np.float32) * sx * np.asarray(qp['scale'], np.float32)
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)

    def test_quantized_matmul_close_to_dense(self):
        """End error stays within the analytic quant-noise envelope."""
        kx, kw = jax.random.split(jax.random.key(2))
        x = jax.random.normal(kx, (8, 128), jnp.float32)
        w = jax.random.normal(kw, (128, 64), jnp.float32)
        qp = quantize_linear({'w': w})
        got = np.asarray(int8_matmul(x, qp['q'], qp['scale']))
        want = np.asarray(x @ w)
        # Relative error ~ (1/127) * sqrt(2) on random gaussians; allow 4 sigma.
        denom = np.linalg.norm(want)
        assert np.linalg.norm(got - want) / denom < 0.05

    def test_linear_dispatches_on_quantized_layout(self):
        kx, kw, kb = jax.random.split(jax.random.key(3), 3)
        x = jax.random.normal(kx, (4, 32), jnp.float32)
        p = {'w': jax.random.normal(kw, (32, 8), jnp.float32),
             'b': jax.random.normal(kb, (8,), jnp.float32)}
        qp = quantize_linear(p)
        got = np.asarray(linear(qp, x))
        want = np.asarray(int8_matmul(x, qp['q'], qp['scale']) + p['b'])
        np.testing.assert_allclose(got, want, rtol=1e-6)

    def test_stacked_layers_slice_consistently(self):
        """quantize(stacked)[li] == quantize(stacked[li]) — the decode step
        slices per-layer params out of the scanned stack."""
        w = jax.random.normal(jax.random.key(4), (3, 16, 8), jnp.float32)
        q_all = quantize_linear({'w': w})
        for li in range(3):
            q_li = quantize_linear({'w': w[li]})
            np.testing.assert_array_equal(np.asarray(q_all['q'][li]),
                                          np.asarray(q_li['q']))
            np.testing.assert_allclose(np.asarray(q_all['scale'][li]),
                                       np.asarray(q_li['scale']), rtol=1e-7)


class TestQuantizedDecode:
    def test_config_validates_weight_dtype(self):
        import pytest
        with pytest.raises(ValueError):
            cfg(weight_dtype='int2')

    def test_fused_gate_honors_forced_int8(self):
        """int8 weights are fusable (s8 in-kernel dots): forcing the kernel on
        keeps it on, and the auto gate budgets int8 at half the weight bytes."""
        c = cfg(weight_dtype='int8', use_fused_decode=True)
        assert ar_mod._fused_gate(c, rows=2, total_max=64) is True

    def test_quantized_forward_close_to_dense(self):
        """Training-shape forward through quantized decode params tracks the
        dense logits (the same `linear` dispatch the decode loop uses)."""
        c = cfg()
        model = ValleAR(c, seed=0)
        qparams = quantize_decode_params(model.params)
        rs = np.random.RandomState(0)
        tokens = jnp.asarray(rs.randint(0, 24, (2, 7)), jnp.int32)
        codes = jnp.asarray(rs.randint(0, 96, (2, 9)), jnp.int32)
        dense = np.asarray(ar_mod.forward(model.params, c, tokens, codes,
                                          None, None))
        quant = np.asarray(ar_mod.forward(qparams, c, tokens, codes,
                                          None, None))
        corr = np.corrcoef(dense.ravel(), quant.ravel())[0, 1]
        assert corr > 0.98, f'quantized logits decorrelated: {corr}'

    def test_int8_decode_generates(self):
        """End-to-end greedy decode under weight_dtype='int8' produces a valid
        in-vocab sequence through the standard generate API."""
        c = cfg(weight_dtype='int8')
        model = ValleAR(c, seed=1)
        assert model.decode_params is model.decode_params   # cached view
        assert model.decode_params is not model.params
        rs = np.random.RandomState(1)
        out = np.asarray(model.generate(rs.randint(0, 24, (5,)),
                                        rs.randint(0, 96, (4, 8))))
        assert out.ndim == 1 and len(out) <= c.max_audio_len
        assert ((out >= 0) & (out < 96)).all()

    def test_decode_params_requantize_on_load(self, tmp_path):
        c = cfg(weight_dtype='int8')
        m1 = ValleAR(c, seed=2)
        q_before = m1.decode_params
        m2 = ValleAR(c, seed=3)
        m2.save(tmp_path / 'ckpt')
        m1.load(tmp_path / 'ckpt')
        q_after = m1.decode_params
        assert q_after is not q_before
        np.testing.assert_array_equal(
            np.asarray(q_after['transformer']['attn']['qkv']['q']),
            np.asarray(quantize_decode_params(m2.params)
                       ['transformer']['attn']['qkv']['q']))

    def test_dense_default_is_passthrough(self):
        model = ValleAR(cfg(), seed=4)
        assert model.decode_params is model.params

    def test_mesh_sharded_int8_matches_single_device(self):
        """int8 decode on a 4x2 (DPxTP) mesh: the quantized q/scale leaves
        shard by the Megatron rules and per-item outputs match the unmeshed
        int8 decode (int32 dot partial sums psum exactly)."""
        from valle2_tpu.parallel import make_mesh
        c = cfg(weight_dtype='int8')
        single = ValleAR(c, seed=6)
        meshed = ValleAR(c, params=single.params, mesh=make_mesh(data=4, model=2))
        rs = np.random.RandomState(6)
        items = [(rs.randint(0, 24, (4 + i,)), rs.randint(0, 96, (3 + i, 8)))
                 for i in range(3)]
        batched = meshed.generate_batch([t for t, _ in items],
                                        [pc for _, pc in items], bucket=False)
        for (t, pc), got in zip(items, batched):
            want = single.generate(jnp.asarray(t), jnp.asarray(pc), bucket=False)
            np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    def test_decode_stream_matches_generate_under_int8(self):
        """Segmented streaming decode uses the same quantized view as the
        one-shot decode — tokens identical at any segmentation."""
        from valle2_tpu.models.ar import DecodeStream
        c = cfg(weight_dtype='int8', num_beams=1)
        model = ValleAR(c, seed=7)
        rs = np.random.RandomState(7)
        tokens, pcodes = rs.randint(0, 24, (5,)), rs.randint(0, 96, (4, 8))
        rng = jax.random.key(3)
        want = np.asarray(model.generate(tokens, pcodes, rng=rng))
        stream = DecodeStream(model, tokens, pcodes, rng=rng)
        got = []
        while not stream.finished:
            got.extend(stream.advance(3))
        np.testing.assert_array_equal(np.asarray(got, np.int32), want)

    def test_tts_pipeline_with_int8_weights(self):
        """The fused TTS pipeline picks up the quantized AR view end-to-end."""
        from valle2_tpu.tts import ValleTTS
        c = ConfigValle(d_model=32, n_heads=2, dim_feedforward=64, num_layers=2,
                        max_audio_len=12, num_beams=2, dropout=0.0,
                        temperature=0.0, bucket_sizes=(32, 64),
                        weight_dtype='int8')
        tts = ValleTTS(c)
        rs = np.random.RandomState(6)
        res = tts.synthesize_fused('ok.', rs.randint(0, 70, (4,)),
                                   rs.randint(0, 1024, (5, 8)))
        assert res.waveform.ndim == 1 and len(res.waveform) % 320 == 0
        assert res.codes.shape[1] == 8


class TestInt4:
    """int4 W4A16 (quantize_linear_int4): group-wise scales, half-split nibble
    packing, fp activations.  Contracts: bounded group quant error, the packed
    matmul equals the explicit dequant matmul, and the decode/TTS paths run
    under weight_dtype='int4'."""

    def test_group4_for_alignment(self):
        from valle2_tpu.quantize import group4_for
        assert group4_for(1024) == 128          # 204M shapes
        assert group4_for(256) == 128
        assert group4_for(48) == 24             # clamps to in/2
        assert group4_for(6) == 3               # odd half still divides

    def test_roundtrip_error_bounded_per_group(self):
        """|w - dequant(quant4(w))| <= group_scale/2 element-wise."""
        from valle2_tpu.quantize import dequantize_linear_int4, quantize_linear_int4
        w = jax.random.normal(jax.random.key(0), (256, 32), jnp.float32)
        qp = quantize_linear_int4({'w': w})
        assert qp['q4'].dtype == jnp.int8 and qp['q4'].shape == (128, 32)
        assert qp['scale4'].shape == (2, 32)    # group4_for(256) = 128
        wd = dequantize_linear_int4(qp)['w']
        err = np.abs(np.asarray(w - wd)).reshape(2, 128, 32)
        bound = np.asarray(qp['scale4'])[:, None, :] * 0.5 + 1e-6
        assert (err <= bound).all()

    def test_packing_roundtrip_exact(self):
        """unpack(pack(q)) recovers every 4-bit value including negatives."""
        from valle2_tpu.quantize import dequantize_linear_int4, quantize_linear_int4
        # Integer-valued weights with max|.| = 7 in every (group, column) →
        # scale = 1 exactly, so dequant must reproduce w bit-for-bit.  The
        # random body sweeps all 15 nibble values through both planes.
        rs = np.random.RandomState(5)
        qi = rs.randint(-7, 8, (16, 16)).astype(np.float32)
        qi[0, :] = 7
        qi[8, :] = -7
        w = jnp.asarray(qi)
        qp = quantize_linear_int4({'w': w}, group=8)
        np.testing.assert_array_equal(np.asarray(qp['scale4']),
                                      np.ones((2, 16), np.float32))
        wd = dequantize_linear_int4(qp)['w']
        np.testing.assert_array_equal(np.asarray(wd), np.asarray(w))

    def test_int4_matmul_matches_dequant_matmul(self):
        """The packed two-plane matmul == x @ dequant(q4) explicitly."""
        from valle2_tpu.quantize import (dequantize_linear_int4, int4_matmul,
                                         quantize_linear_int4)
        kx, kw = jax.random.split(jax.random.key(1))
        x = jax.random.normal(kx, (5, 48), jnp.float32) * 3.0
        w = jax.random.normal(kw, (48, 16), jnp.float32)
        qp = quantize_linear_int4({'w': w})
        got = np.asarray(int4_matmul(x, qp['q4'], qp['scale4']))
        want = np.asarray(x @ dequantize_linear_int4(qp)['w'])
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_linear_dispatches_on_int4_layout(self):
        from valle2_tpu.quantize import quantize_linear_int4
        w = jax.random.normal(jax.random.key(2), (32, 24), jnp.float32)
        b = jax.random.normal(jax.random.key(3), (24,), jnp.float32)
        x = jax.random.normal(jax.random.key(4), (3, 32), jnp.float32)
        from valle2_tpu.quantize import dequantize_linear_int4
        qp = quantize_linear_int4({'w': w, 'b': b})
        got = np.asarray(linear(qp, x))
        # Dispatch correctness: the q4 layout must route through int4_matmul —
        # exact vs the explicitly dequantized weights (same arithmetic).
        wd = dequantize_linear_int4(qp)['w']
        want_exact = np.asarray(linear({'w': wd, 'b': b}, x))
        np.testing.assert_allclose(got, want_exact, rtol=1e-5, atol=1e-5)
        # ...and the 4-bit rounding noise keeps the output correlated to dense
        # (the worst-case envelope is sqrt(in) * scale/2 per element, so no
        # tight element-wise bound exists for random w; correlation is the
        # meaningful fidelity gate).
        want = np.asarray(linear({'w': w, 'b': b}, x))
        assert np.corrcoef(got.ravel(), want.ravel())[0, 1] > 0.99

    def test_int4_forward_close_to_dense(self):
        c = cfg()
        model = ValleAR(c, seed=0)
        qparams = quantize_decode_params(model.params, bits=4)
        assert 'q4' in qparams['transformer']['attn']['qkv']
        rs = np.random.RandomState(0)
        tokens = jnp.asarray(rs.randint(0, 24, (2, 7)), jnp.int32)
        codes = jnp.asarray(rs.randint(0, 96, (2, 9)), jnp.int32)
        dense = np.asarray(ar_mod.forward(model.params, c, tokens, codes,
                                          None, None))
        quant = np.asarray(ar_mod.forward(qparams, c, tokens, codes,
                                          None, None))
        corr = np.corrcoef(dense.ravel(), quant.ravel())[0, 1]
        assert corr > 0.98, f'int4 logits decorrelated: {corr}'

    def test_int4_decode_generates(self):
        c = cfg(weight_dtype='int4')
        model = ValleAR(c, seed=1)
        assert model.decode_params is not model.params
        assert 'q4' in model.decode_params['transformer']['attn']['qkv']
        rs = np.random.RandomState(1)
        out = np.asarray(model.generate(rs.randint(0, 24, (5,)),
                                        rs.randint(0, 96, (4, 8))))
        assert out.ndim == 1 and len(out) <= c.max_audio_len
        assert ((out >= 0) & (out < 96)).all()

    def test_fused_gate_accepts_int4(self):
        c = cfg(weight_dtype='int4', use_fused_decode=True)
        assert ar_mod._fused_gate(c, rows=2, total_max=64) is True
        # int4 ALSO rides manual TP (ranked per-rank packing, fp psums)...
        assert ar_mod._fused_gate(c, rows=2, total_max=64, tp_mp=2) is True
        # ...while int8 W8A8 stays excluded there (global activation scale).
        c8 = cfg(weight_dtype='int8', use_fused_decode=True)
        assert ar_mod._fused_gate(c8, rows=2, total_max=64, tp_mp=2) is False

    def test_ranked_packing_roundtrip_and_alignment(self):
        """Ranked per-rank int4: the dequant error obeys the same per-group
        bound as the global packing, and when the rank slice is a multiple of
        the group size the quantized VALUES equal the global quantization's
        (group boundaries align)."""
        from valle2_tpu.quantize import (dequantize_linear_int4,
                                         dequantize_linear_int4_ranked,
                                         quantize_linear_int4,
                                         quantize_linear_int4_ranked)
        w = jax.random.normal(jax.random.key(11), (64, 16), jnp.float32)
        mp = 2
        qr = quantize_linear_int4_ranked({'w': w}, mp, group=16)
        # Aligned case: 64/2 = 32 rows per rank, group 16 divides 32 → each
        # rank's groups are exactly the global groups over its rows.
        qg = quantize_linear_int4({'w': w}, group=16)
        wd_r = np.asarray(dequantize_linear_int4_ranked(qr, mp)['w'])
        wd_g = np.asarray(dequantize_linear_int4(qg)['w'])
        np.testing.assert_array_equal(wd_r, wd_g)
        # Layout: per-rank halves are self-contained — slicing rank r's packed
        # rows + scales yields a valid standalone layout over its row slice.
        half_r = qr['q4'].shape[0] // mp
        groups_r = qr['scale4'].shape[0] // mp
        for r in range(mp):
            part = dequantize_linear_int4(
                {'q4': qr['q4'][r * half_r:(r + 1) * half_r],
                 'scale4': qr['scale4'][r * groups_r:(r + 1) * groups_r]})['w']
            np.testing.assert_array_equal(np.asarray(part),
                                          wd_r[r * 32:(r + 1) * 32])

    def test_ranked_transformer_layout(self):
        """quantize_transformer(tp_mp=mp): row-parallel linears (out, lin2)
        pack per rank; column-parallel (qkv, lin1) keep the global packing."""
        from valle2_tpu.ops.transformer import transformer_init
        from valle2_tpu.quantize import (quantize_linear_int4,
                                         quantize_transformer)
        tp = transformer_init(jax.random.key(12), 2, 32, 4, 64,
                              adaptive_norm=False)
        q = quantize_transformer(tp, bits=4, tp_mp=2)
        qg = quantize_transformer(tp, bits=4)
        np.testing.assert_array_equal(np.asarray(q['attn']['qkv']['q4']),
                                      np.asarray(qg['attn']['qkv']['q4']))
        # lin2 (in=64, mp=2): per-rank 32-row slices quantized independently.
        want = np.concatenate([
            np.asarray(quantize_linear_int4(
                {'w': tp['ffn']['lin2']['w'][:, r * 32:(r + 1) * 32]})['q4'])
            for r in range(2)], axis=1)
        np.testing.assert_array_equal(np.asarray(q['ffn']['lin2']['q4']), want)

    def test_data_mesh_int4_matches_single_device(self):
        """int4 decode on a data-only mesh rides the per-shard shard_map path
        (replicated q4/scale4, independent rows) — greedy outputs bit-equal to
        the unmeshed int4 decode."""
        from valle2_tpu.parallel import make_mesh
        c = cfg(weight_dtype='int4')
        single = ValleAR(c, seed=8)
        meshed = ValleAR(c, params=single.params, mesh=make_mesh(data=8))
        rs = np.random.RandomState(8)
        items = [(rs.randint(0, 24, (4 + i,)), rs.randint(0, 96, (3 + i, 8)))
                 for i in range(3)]
        batched = meshed.generate_batch([t for t, _ in items],
                                        [pc for _, pc in items], bucket=False)
        for (t, pc), got in zip(items, batched):
            want = single.generate(jnp.asarray(t), jnp.asarray(pc), bucket=False)
            np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    def test_tp_mesh_int4_gspmd_on_odd_split(self):
        """int4 + a model axis the ranked packing cannot split evenly (odd
        per-rank input width) falls back to the GSPMD XLA path: the GLOBAL
        q4/scale4 leaves shard by the Megatron placement hints and decode
        still produces valid codes.  (Divisible splits take manual TP with
        ranked packing — tests/test_tp_decode.py.)"""
        from valle2_tpu.parallel import make_mesh
        c = cfg(weight_dtype='int4', d_model=38, dim_feedforward=76,
                num_audio_tokens=36)
        assert (c.d_model // 2) % 2 == 1      # odd per-rank rows → no ranked
        model = ValleAR(c, seed=9, mesh=make_mesh(data=4, model=2))
        assert model._decode_tp is None and not model._decode_data_sharded
        rs = np.random.RandomState(9)
        out = np.asarray(model.generate(rs.randint(0, 24, (5,)),
                                        rs.randint(0, 36, (4, 8))))
        assert out.ndim == 1 and ((out >= 0) & (out < 36)).all()

    def test_tts_pipeline_with_int4_weights(self):
        from valle2_tpu.tts import ValleTTS
        c = ConfigValle(d_model=32, n_heads=2, dim_feedforward=64, num_layers=2,
                        max_audio_len=12, num_beams=2, dropout=0.0,
                        temperature=0.0, bucket_sizes=(32, 64),
                        weight_dtype='int4')
        tts = ValleTTS(c)
        rs = np.random.RandomState(6)
        res = tts.synthesize_fused('ok.', rs.randint(0, 70, (4,)),
                                   rs.randint(0, 1024, (5, 8)))
        assert res.waveform.ndim == 1 and len(res.waveform) % 320 == 0
        assert res.codes.shape[1] == 8


class TestDecodeParamsCache:
    def test_invalidates_on_transformer_rebinding(self):
        """Replacing params['transformer'] in place (without rebinding the
        outer dict) must re-quantize — stale int8 views mean wrong audio."""
        c = cfg(weight_dtype='int8')
        m = ValleAR(c, seed=8)
        q1 = m.decode_params
        fresh = ValleAR(c, seed=9)
        m.params['transformer'] = fresh.params['transformer']
        q2 = m.decode_params
        assert q2 is not q1
        np.testing.assert_array_equal(
            np.asarray(q2['transformer']['attn']['qkv']['q']),
            np.asarray(quantize_decode_params(fresh.params)
                       ['transformer']['attn']['qkv']['q']))

    def test_streaming_shares_quantized_view(self):
        from valle2_tpu.tts import ValleTTS
        c = ConfigValle(d_model=32, n_heads=2, dim_feedforward=64, num_layers=2,
                        max_audio_len=12, num_beams=1, dropout=0.0,
                        temperature=0.0, bucket_sizes=(32, 64),
                        weight_dtype='int8')
        tts = ValleTTS(c)
        rs = np.random.RandomState(10)
        chunks = list(tts.synthesize_streaming(
            'hi.', rs.randint(0, 70, (4,)), rs.randint(0, 1024, (5, 8)),
            chunk_frames=6, lookahead_frames=3))
        assert len(chunks) >= 1
        assert tts._stream_ar._qdecode is tts.ar.decode_params

    def test_fused_gate_budgets_f32_weights(self, monkeypatch):
        """f32 configs budget 4 bytes/weight: a 204M-scale f32 config must be
        rejected by the auto gate where the bf16 twin passes."""
        monkeypatch.setattr(jax, 'default_backend', lambda: 'tpu')
        big = dict(d_model=1024, num_layers=16, n_heads=16,
                   dim_feedforward=4096, num_audio_tokens=1024,
                   max_audio_len=256, num_beams=1, dropout=0.0)
        assert ar_mod._fused_gate(ConfigValle(dtype='bfloat16', **big),
                                  rows=1, total_max=472) is True
        assert ar_mod._fused_gate(ConfigValle(dtype='float32', **big),
                                  rows=1, total_max=472) is False
