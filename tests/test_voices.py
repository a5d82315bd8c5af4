"""Multi-voice serving: per-voice weight overrides through one TTSServer.

No reference counterpart (the reference has no serving stack, SURVEY §1).
Contract: requests carrying a registered voice serve with THAT voice's merged
weights — grouped per dispatch, bit-identical (greedy) to running the voice's
params directly — while default-voice requests in the same collected batch
stay bit-identical to the voiceless server."""

import json
import urllib.error
import urllib.request

import jax
import numpy as np
import pytest

from valle2_tpu import lora
from valle2_tpu.config import ConfigValle
from valle2_tpu.serve import TTSServer, serve_http
from valle2_tpu.tts import ValleTTS


def tiny_cfg(**kw):
    base = dict(d_model=32, n_heads=2, dim_feedforward=64, num_layers=2,
                max_audio_len=12, num_beams=2, dropout=0.0, temperature=0.0,
                bucket_sizes=(32, 64, 128))
    base.update(kw)
    return ConfigValle(**base)


def make_requests(n, seed=0):
    rs = np.random.RandomState(seed)
    return [(f'request number {i}.',
             rs.randint(0, 70, (3 + i % 4,)),
             rs.randint(0, 1024, (4 + i % 3, 8))) for i in range(n)]


@pytest.fixture(scope='module')
def tts():
    return ValleTTS(tiny_cfg())


def perturbed(params, seed, eps=0.05):
    """A deterministically different weight tree (a stand-in 'voice')."""
    import jax.numpy as jnp
    rs = np.random.RandomState(seed)
    return jax.tree.map(
        lambda leaf: jnp.asarray(
            np.asarray(leaf) + eps * rs.standard_normal(np.shape(leaf)),
            np.asarray(leaf).dtype), params)


class TestVoices:
    def test_mixed_voice_batch_matches_solo(self, tts):
        voice_ar = perturbed(tts.ar.params, seed=1)
        server = TTSServer(tts, max_batch=8, max_wait_ms=200.0)
        server.register_voice('alt', ar_params=voice_ar)
        reqs = make_requests(4, seed=3)
        futs = [server.submit(*reqs[0]),
                server.submit(*reqs[1], voice='alt'),
                server.submit(*reqs[2]),
                server.submit(*reqs[3], voice='alt')]
        with server:
            results = [f.result(timeout=300) for f in futs]
        stats = server.stats()
        assert stats['requests'] == 4
        assert stats['batches'] == 2          # one collected batch, two groups
        assert stats['voices'] == 1
        # Default-voice rows: bit-identical to the voiceless pipeline.
        for i in (0, 2):
            want = tts.synthesize_fused(*reqs[i])
            np.testing.assert_array_equal(results[i].codes, want.codes)
            np.testing.assert_allclose(results[i].waveform, want.waveform,
                                       atol=2e-5)
        # Voice rows: identical to running the voice's params directly.
        want_alt = tts.batch_synthesize(
            [reqs[1][0], reqs[3][0]], [reqs[1][1], reqs[3][1]],
            [reqs[1][2], reqs[3][2]], override_params=(voice_ar, None))
        for got, want in zip((results[1], results[3]), want_alt):
            np.testing.assert_array_equal(got.codes, want.codes)
            np.testing.assert_allclose(got.waveform, want.waveform, atol=2e-5)
        # And the voice actually sounds different from the base weights.
        base_out = tts.synthesize_fused(*reqs[1])
        assert not np.array_equal(results[1].codes, base_out.codes)

    def test_unknown_voice_rejected_at_submit(self, tts):
        server = TTSServer(tts)
        with pytest.raises(ValueError, match='unknown voice'):
            server.submit(*make_requests(1)[0], voice='nope')
        with pytest.raises(ValueError):
            server.register_voice('empty')

    def test_load_voice_from_adapter_file(self, tts, tmp_path):
        adapters = lora.lora_init(jax.random.key(0), tts.ar.params, rank=2)
        adapters = jax.tree.map(lambda x: x + 0.1, adapters)
        lora.save_adapters(tmp_path / 'v.npz', {'ar': adapters}, scale=2.0)
        server = TTSServer(tts)
        server.load_voice('v', tmp_path / 'v.npz')
        want = lora.merge_lora(tts.ar.params, adapters, 2.0)
        got = server._voices['v'][0]      # dense passthrough (weight_dtype
        eq = jax.tree.map(                # 'compute' ⇒ decode view == params)
            lambda a, b: bool(np.array_equal(np.asarray(a), np.asarray(b))),
            got, want)
        assert all(jax.tree.leaves(eq))
        assert server._voices['v'][1] is None            # no NAR adapters

    def test_load_voice_without_scale_requires_config(self, tts, tmp_path):
        adapters = lora.lora_init(jax.random.key(0), tts.ar.params, rank=2)
        lora.save_adapters(tmp_path / 'noscale.npz', adapters)  # no scale
        server = TTSServer(tts)
        with pytest.raises(ValueError, match='scale'):
            server.load_voice('v', tmp_path / 'noscale.npz')

    def test_voice_override_on_data_mesh(self):
        """The mesh param cache keys by tree identity: alternating voices on a
        data mesh re-places each voice once and keeps outputs bit-identical to
        the unmeshed pipeline per voice."""
        from valle2_tpu.parallel import make_mesh
        cfg = tiny_cfg()
        mesh = make_mesh(data=2)
        solo = ValleTTS(cfg)
        meshed = ValleTTS(cfg, ar=None, nar=None, mesh=mesh)
        # Same weights in both pipelines.
        meshed.ar.params = solo.ar.params
        meshed.nar.params = solo.nar.params
        voice_ar = perturbed(solo.ar.params, seed=5)
        reqs = make_requests(2, seed=9)
        texts = [r[0] for r in reqs]
        pts = [r[1] for r in reqs]
        pcs = [r[2] for r in reqs]
        for override in (None, (voice_ar, None), None, (voice_ar, None)):
            want = solo.batch_synthesize(texts, pts, pcs,
                                         override_params=override)
            got = meshed.batch_synthesize(texts, pts, pcs,
                                          override_params=override)
            for w, g in zip(want, got):
                np.testing.assert_array_equal(g.codes, w.codes)
                np.testing.assert_allclose(g.waveform, w.waveform, atol=2e-5)
        # One placement per distinct (ar, nar, codec) identity triple.
        assert len(meshed._mesh_cache) == 2

    def test_http_voice_field(self, tts):
        voice_ar = perturbed(tts.ar.params, seed=2)
        server = TTSServer(tts, max_batch=2, max_wait_ms=0.0)
        server.register_voice('alt', ar_params=voice_ar)
        with server:
            httpd = serve_http(server, port=0, block=False)
            try:
                base = f'http://127.0.0.1:{httpd.server_address[1]}'
                text, pt, pc = make_requests(1, seed=7)[0]
                body = {'text': text, 'prompt_tokens': pt.tolist(),
                        'prompt_codes': pc.tolist(), 'voice': 'alt'}
                resp = urllib.request.urlopen(urllib.request.Request(
                    f'{base}/synthesize',
                    data=json.dumps(body).encode()), timeout=300)
                assert resp.status == 200
                assert len(resp.read()) > 44          # WAV header + samples
                # Unknown voice → 400, not 500.
                body['voice'] = 'ghost'
                with pytest.raises(urllib.error.HTTPError) as err:
                    urllib.request.urlopen(urllib.request.Request(
                        f'{base}/synthesize',
                        data=json.dumps(body).encode()), timeout=60)
                assert err.value.code == 400
            finally:
                httpd.shutdown()
