"""Batched AR decode: per-item equivalence with single-utterance decode, and
bucket-padding invariance (greedy)."""

import jax
import jax.numpy as jnp
import numpy as np

from valle2_tpu.config import ConfigValle
from valle2_tpu.models.ar import ValleAR


def cfg(**kw):
    base = dict(d_model=48, n_heads=2, dim_feedforward=96, num_layers=2,
                num_audio_tokens=96, vocab_size=24, dropout=0.0, temperature=0.0,
                num_beams=2, max_audio_len=16, norm='LayerNorm',
                bucket_sizes=(16, 32), matmul_precision='highest')
    base.update(kw)
    return ConfigValle(**base)


class TestBatchedDecode:
    def test_batch_matches_individual(self):
        model = ValleAR(cfg())
        rs = np.random.RandomState(0)
        items = [
            (rs.randint(0, 24, (5,)), rs.randint(0, 96, (4, 8))),
            (rs.randint(0, 24, (9,)), rs.randint(0, 96, (7, 8))),
            (rs.randint(0, 24, (3,)), rs.randint(0, 96, (2, 8))),
        ]
        batched = model.generate_batch([t for t, _ in items], [c for _, c in items],
                                       bucket=False)
        for (t, c), got in zip(items, batched):
            solo = model.generate(jnp.asarray(t), jnp.asarray(c))
            np.testing.assert_array_equal(np.asarray(got), np.asarray(solo))

    def test_bucket_padding_invariant(self):
        model = ValleAR(cfg())
        rs = np.random.RandomState(1)
        t = rs.randint(0, 24, (6,))
        c = rs.randint(0, 96, (5, 8))
        plain = model.generate(jnp.asarray(t), jnp.asarray(c), bucket=False)
        bucketed = model.generate(jnp.asarray(t), jnp.asarray(c), bucket=True)
        np.testing.assert_array_equal(np.asarray(plain), np.asarray(bucketed))

    def test_bucketed_calls_share_compilation(self):
        model = ValleAR(cfg())
        rs = np.random.RandomState(2)
        # Different raw lengths that fall into the same buckets.
        model.generate(jnp.asarray(rs.randint(0, 24, (5,))),
                       jnp.asarray(rs.randint(0, 96, (4, 8))), bucket=True)
        n0 = model._decode_jit._cache_size()
        model.generate(jnp.asarray(rs.randint(0, 24, (7,))),
                       jnp.asarray(rs.randint(0, 96, (6, 8))), bucket=True)
        assert model._decode_jit._cache_size() == n0


class TestShardedDecode:
    def test_mesh_sharded_batch_matches_single_device(self):
        """8-way data-parallel batched decode (rows sharded over 'data', params
        replicated) must be token-identical per item to the unmeshed solo decode —
        the multi-chip serving path (VERDICT r1 item 4)."""
        from valle2_tpu.parallel import make_mesh
        mesh = make_mesh(data=8, model=1)
        c = cfg()
        solo_model = ValleAR(c)
        mesh_model = ValleAR(c, params=solo_model.params, mesh=mesh)
        rs = np.random.RandomState(7)
        # 5 items: exercises the pad-to-axis-multiple path (5 -> 8 rows).
        items = [(rs.randint(0, 24, (3 + i,)), rs.randint(0, 96, (2 + i, 8)))
                 for i in range(5)]
        batched = mesh_model.generate_batch([t for t, _ in items],
                                            [c_ for _, c_ in items])
        assert len(batched) == 5
        for (t, c_), got in zip(items, batched):
            solo = solo_model.generate(jnp.asarray(t), jnp.asarray(c_))
            np.testing.assert_array_equal(np.asarray(got), np.asarray(solo))

    def test_tensor_parallel_decode_matches_single_device(self):
        """4x2 (data x model) mesh: params sharded by the Megatron TP rules,
        KV cache split over heads by GSPMD propagation — per-item tokens must
        equal the unmeshed solo decode (serving scales over ICI with TP too,
        not just DP)."""
        from valle2_tpu.parallel import make_mesh
        mesh = make_mesh(data=4, model=2)
        c = cfg()
        solo_model = ValleAR(c)
        mesh_model = ValleAR(c, params=solo_model.params, mesh=mesh)
        rs = np.random.RandomState(11)
        items = [(rs.randint(0, 24, (4,)), rs.randint(0, 96, (3, 8))),
                 (rs.randint(0, 24, (2,)), rs.randint(0, 96, (5, 8)))]
        batched = mesh_model.generate_batch([t for t, _ in items],
                                            [c_ for _, c_ in items])
        for (t, c_), got in zip(items, batched):
            solo = solo_model.generate(jnp.asarray(t), jnp.asarray(c_))
            np.testing.assert_array_equal(np.asarray(got), np.asarray(solo))

    def test_mesh_fused_tts_matches_unmeshed(self):
        """Fused TTS over the mesh == unmeshed fused TTS (same params, greedy)."""
        import dataclasses
        from valle2_tpu.parallel import make_mesh
        from valle2_tpu.tts import ValleTTS
        mesh = make_mesh(data=8, model=1)
        c = dataclasses.replace(cfg(), max_audio_len=8)
        plain = ValleTTS(c)
        meshed = ValleTTS(c, ar=ValleAR(c, params=plain.ar.params, mesh=mesh),
                          nar=plain.nar, codec=plain.codec, mesh=mesh)
        rs = np.random.RandomState(8)
        texts = ['ab', 'cd', 'efg']
        pts = [rs.randint(0, 24, (3,)) for _ in texts]
        pcs = [rs.randint(0, 96, (4, 8)) for _ in texts]
        want = plain.batch_synthesize(texts, pts, pcs)
        got = meshed.batch_synthesize(texts, pts, pcs)
        assert len(got) == len(want) == 3
        for w, g in zip(want, got):
            np.testing.assert_array_equal(g.codes, w.codes)
            np.testing.assert_allclose(g.waveform, w.waveform, atol=1e-5)


class TestChunkedDecode:
    def test_unroll_factors_identical_outputs(self):
        """decode_unroll ∈ {1, 3, 4, 8}: outputs bit-identical (greedy and sampled)."""
        import dataclasses
        rs = np.random.RandomState(3)
        t = rs.randint(0, 24, (5,))
        c = rs.randint(0, 96, (4, 8))
        outs = {}
        for temp in (0.0, 1.0):
            ref = None
            for unroll in (1, 3, 4, 8):
                model = ValleAR(cfg(temperature=temp, decode_unroll=unroll))
                out = np.asarray(model.generate(
                    jnp.asarray(t), jnp.asarray(c), rng=jax.random.key(42)))
                if ref is None:
                    ref = out
                else:
                    np.testing.assert_array_equal(out, ref,
                                                  err_msg=f'unroll={unroll} temp={temp}')


class TestInt8KVCache:
    def test_int8_decode_runs_and_mostly_agrees(self):
        """int8 KV decode: valid codes, high token agreement with the f32-cache
        greedy decode (quantization may flip occasional near-ties)."""
        rs = np.random.RandomState(4)
        t = rs.randint(0, 24, (6,))
        c = rs.randint(0, 96, (5, 8))
        ref_model = ValleAR(cfg())
        ref = np.asarray(ref_model.generate(jnp.asarray(t), jnp.asarray(c)))
        q_model = ValleAR(cfg(kv_cache_dtype='int8'), params=ref_model.params)
        out = np.asarray(q_model.generate(jnp.asarray(t), jnp.asarray(c)))
        assert ((out >= 0) & (out < 96)).all()
        n = min(len(out), len(ref))
        if n > 0:
            agree = float((out[:n] == ref[:n]).mean())
            assert agree > 0.5, (agree, out, ref)

    def test_int8_cache_dtypes(self):
        from valle2_tpu.ops import KVCache
        cache = KVCache.zeros(2, 1, 2, 16, 8, dtype=jnp.int8)
        assert cache.k.dtype == jnp.int8
        assert cache.k_scale is not None and cache.k_scale.dtype == jnp.bfloat16

    def test_quantize_kv_roundtrip(self):
        from valle2_tpu.ops.transformer import quantize_kv
        x = jax.random.normal(jax.random.key(0), (2, 2, 8, 16))
        q, s = quantize_kv(x)
        recon = q.astype(jnp.float32) * s.astype(jnp.float32)
        rel = float(jnp.max(jnp.abs(recon - x)) / jnp.max(jnp.abs(x)))
        assert rel < 0.02, rel


class TestBucketedAttention:
    def test_attn_buckets_identical_outputs(self):
        rs = np.random.RandomState(5)
        t = rs.randint(0, 24, (5,))
        c = rs.randint(0, 96, (4, 8))
        for temp in (0.0, 1.0):
            ref = np.asarray(ValleAR(cfg(temperature=temp)).generate(
                jnp.asarray(t), jnp.asarray(c), rng=jax.random.key(7)))
            for nb in (2, 4):
                out = np.asarray(ValleAR(cfg(temperature=temp,
                                             decode_attn_buckets=nb)).generate(
                    jnp.asarray(t), jnp.asarray(c), rng=jax.random.key(7)))
                np.testing.assert_array_equal(out, ref, err_msg=f'buckets={nb}')

    def test_attn_buckets_identical_outputs_int8_cache(self):
        """Bucketing now composes with int8 KV caches (the dequant happens
        inside the selected-prefix branch) — int8 exists for exactly the
        bandwidth-bound long caches where the prefix read pays."""
        rs = np.random.RandomState(6)
        t = rs.randint(0, 24, (5,))
        c = rs.randint(0, 96, (4, 8))
        ref = np.asarray(ValleAR(cfg(kv_cache_dtype='int8',
                                     decode_attn_buckets=1)).generate(
            jnp.asarray(t), jnp.asarray(c), rng=jax.random.key(7)))
        for nb in (2, 4):
            out = np.asarray(ValleAR(cfg(kv_cache_dtype='int8',
                                         decode_attn_buckets=nb)).generate(
                jnp.asarray(t), jnp.asarray(c), rng=jax.random.key(7)))
            np.testing.assert_array_equal(out, ref, err_msg=f'buckets={nb}')


class TestShardMapFusedDecode:
    """r2 VERDICT item 3: the fused Pallas decode kernel survives onto a mesh
    via jax.shard_map (data-only axis; per-shard the kernel sees local shapes).
    On CPU the kernel runs in interpret mode — same code path the dryrun
    compiles."""

    def test_fused_decode_on_mesh_matches_solo(self):
        from valle2_tpu.parallel import make_mesh
        c = cfg(use_fused_decode=True, matmul_precision='default',
                kv_cache_dtype='float32', dtype='float32')
        mesh = make_mesh(data=8, model=1)
        solo = ValleAR(c)
        meshed = ValleAR(c, params=solo.params, mesh=mesh)
        assert meshed._decode_data_sharded       # the shard_map path is live
        rs = np.random.RandomState(7)
        items = [(rs.randint(0, 24, (4 + i % 3,)), rs.randint(0, 96, (3 + i % 4, 8)))
                 for i in range(5)]               # 5 rows -> padded to 8
        batched = meshed.generate_batch([t for t, _ in items],
                                        [c_ for _, c_ in items])
        for (t, c_), got in zip(items, batched):
            want = solo.generate(jnp.asarray(t), jnp.asarray(c_))
            np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    def test_fused_tts_pipeline_on_mesh_matches_solo(self):
        from valle2_tpu.parallel import make_mesh
        from valle2_tpu.tts import ValleTTS
        c = cfg(use_fused_decode=True, matmul_precision='default',
                kv_cache_dtype='float32', dtype='float32', num_beams=1,
                max_audio_len=12)
        mesh = make_mesh(data=8, model=1)
        solo = ValleTTS(c)
        meshed = ValleTTS(c, ar=ValleAR(c, params=solo.ar.params),
                          nar=solo.nar, codec=solo.codec, mesh=mesh)
        rs = np.random.RandomState(8)
        reqs = [(f'sentence {i}.', rs.randint(0, 24, (3,)),
                 rs.randint(0, 96, (4, 8))) for i in range(3)]
        got = meshed.batch_synthesize([r[0] for r in reqs], [r[1] for r in reqs],
                                      [r[2] for r in reqs])
        for (text, pt, pc), g in zip(reqs, got):
            want = solo.synthesize_fused(text, pt, pc)
            np.testing.assert_array_equal(g.codes, want.codes)
            np.testing.assert_allclose(g.waveform, want.waveform, atol=2e-5)
