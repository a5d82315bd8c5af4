"""Dynamic-batching TTS server: per-request exactness under batching, batch
formation, lifecycle, and the stdlib HTTP front end.

The serving layer has no reference counterpart (the reference exposes only
model.generate — SURVEY §1); the contract tested here is the TPU-first one:
requests grouped into one fused dispatch must be bit-identical (greedy) to solo
synthesize_fused calls."""

import io
import json
import threading
import time
import urllib.request
import wave

import numpy as np
import pytest

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
    reqs = []
    for i in range(n):
        reqs.append((f'request number {i}.',
                     rs.randint(0, 70, (3 + i % 4,)),
                     rs.randint(0, 1024, (4 + i % 3, 8))))
    return reqs


@pytest.fixture(scope='module')
def tts():
    return ValleTTS(tiny_cfg())


class TestTTSServer:
    def test_batched_requests_match_direct(self, tts):
        """Requests served together in one padded batch reproduce solo
        synthesize_fused exactly (greedy; per-length masking)."""
        reqs = make_requests(3, seed=1)
        server = TTSServer(tts, max_batch=4, max_wait_ms=200.0)
        futs = [server.submit(*r) for r in reqs]       # queued before start
        with server:
            results = [f.result(timeout=300) for f in futs]
        stats = server.stats()
        assert stats['requests'] == 3
        assert stats['batches'] == 1                   # all pre-queued → one batch
        # AOT counters surface (zero with the cache disabled, never absent)
        assert stats['aot_compiles'] == 0
        assert stats['aot_disk_loads'] == 0
        assert stats['aot_fallbacks'] == 0
        for (text, pt, pc), got in zip(reqs, results):
            want = tts.synthesize_fused(text, pt, pc)
            np.testing.assert_array_equal(got.codes, want.codes)
            np.testing.assert_allclose(got.waveform, want.waveform, atol=2e-5)

    def test_padding_to_batch_bucket(self, tts):
        """3 requests pad to the 4-bucket; outputs and counters ignore pad rows."""
        server = TTSServer(tts, max_batch=8, max_wait_ms=100.0)
        assert server.batch_buckets == [1, 2, 4, 8]
        reqs = make_requests(3, seed=2)
        futs = [server.submit(*r) for r in reqs]
        with server:
            for f in futs:
                assert f.result(timeout=300).waveform.ndim == 1
        assert server.stats()['requests'] == 3

    def test_sequential_requests_solo_batches(self, tts):
        """max_wait_ms=0: each request that arrives alone serves alone."""
        server = TTSServer(tts, max_batch=4, max_wait_ms=0.0)
        with server:
            r = make_requests(1, seed=3)[0]
            a = server.synthesize(*r, timeout=300)
            b = server.synthesize(*r, timeout=300)
        np.testing.assert_array_equal(a.codes, b.codes)
        stats = server.stats()
        assert stats['batches'] == 2 and stats['requests'] == 2
        assert stats['latency_ms_p50'] > 0

    def test_stop_drains_pending(self, tts):
        server = TTSServer(tts, max_batch=2, max_wait_ms=0.0)
        futs = [server.submit(*r) for r in make_requests(3, seed=4)]
        server.start()
        server.stop(drain=True)
        for f in futs:
            assert f.result(timeout=1).waveform.ndim == 1

    def test_cancelled_future_does_not_kill_worker(self, tts):
        """A client cancel() racing the worker's set_result must not crash the
        worker thread — later requests still get served."""
        server = TTSServer(tts, max_batch=2, max_wait_ms=0.0)
        fut = server.submit(*make_requests(1, seed=8)[0])   # queued pre-start
        assert fut.cancel()
        with server:
            res = server.synthesize(*make_requests(1, seed=9)[0], timeout=300)
        assert res.waveform.ndim == 1

    def test_stop_without_drain_fails_pending(self, tts):
        """drain=False: queued-but-unserved requests get RuntimeError, never a
        stranded Future."""
        server = TTSServer(tts, max_batch=2, max_wait_ms=0.0)
        futs = [server.submit(*r) for r in make_requests(3, seed=14)]
        server.start()
        server.stop(drain=False)
        for f in futs:
            try:
                f.result(timeout=1)        # early ones may have been served
            except RuntimeError as exc:
                assert 'stopped' in str(exc)
        assert all(f.done() for f in futs)

    def test_stop_before_start_resolves_queued(self, tts):
        """stop() on a never-started server must not strand pre-queued
        futures (it used to early-return without even setting the flag)."""
        server = TTSServer(tts, max_batch=2, max_wait_ms=0.0)
        futs = [server.submit(*r) for r in make_requests(2, seed=15)]
        server.stop(drain=True)
        for f in futs:
            assert f.result(timeout=1).waveform.ndim == 1    # already served
        with pytest.raises(RuntimeError):
            server.submit(*make_requests(1, seed=16)[0])

    def test_submit_after_stop_raises(self, tts):
        server = TTSServer(tts, max_batch=2)
        server.start()
        server.stop()
        with pytest.raises(RuntimeError):
            server.submit(*make_requests(1, seed=5)[0])


class TestHTTPFrontend:
    def test_synthesize_health_stats(self, tts):
        text, pt, pc = make_requests(1, seed=6)[0]
        with TTSServer(tts, max_batch=2, max_wait_ms=0.0) as server:
            httpd = serve_http(server, port=0, block=False)
            port = httpd.server_address[1]
            base = f'http://127.0.0.1:{port}'
            try:
                assert urllib.request.urlopen(f'{base}/healthz').read() == b'ok'
                body = json.dumps({'text': text,
                                   'prompt_tokens': pt.tolist(),
                                   'prompt_codes': pc.tolist()}).encode()
                req = urllib.request.Request(f'{base}/synthesize', data=body)
                resp = urllib.request.urlopen(req, timeout=300)
                assert resp.headers['Content-Type'] == 'audio/wav'
                with wave.open(io.BytesIO(resp.read()), 'rb') as w:
                    assert w.getframerate() == tts.codec.sampling_rate
                    pcm = np.frombuffer(w.readframes(w.getnframes()), '<i2')
                want = tts.synthesize_fused(text, pt, pc).waveform
                np.testing.assert_allclose(pcm / 32767.0, want, atol=1e-4)
                stats = json.loads(
                    urllib.request.urlopen(f'{base}/stats').read())
                assert stats['requests'] == 1
                # Prometheus scrape mirrors the JSON counters.
                resp = urllib.request.urlopen(f'{base}/metrics')
                assert resp.headers['Content-Type'].startswith('text/plain')
                metrics = resp.read().decode()
                assert 'valle2_requests_total 1' in metrics
                assert '# TYPE valle2_queue_depth gauge' in metrics
                # malformed request → 400, not a server crash
                bad = urllib.request.Request(f'{base}/synthesize', data=b'{}')
                with pytest.raises(urllib.error.HTTPError) as ei:
                    urllib.request.urlopen(bad, timeout=30)
                assert ei.value.code == 400
            finally:
                httpd.shutdown()


class TestGracefulShutdown:
    def test_sigterm_returns_from_blocking_serve_and_drains(self, tts):
        """SIGTERM while ``serve_http(block=True)`` runs: the accept loop
        stops, serve_http RETURNS (instead of the default handler killing the
        process with queued work), an in-flight HTTP request still gets its
        200 (drain), handler threads are joinable for delivery, and the
        previous signal dispositions are restored.

        Sequencing is event-driven, not wall-clock: the client retries until
        the listener accepts, and SIGTERM fires only once the request has
        reached the server (a wrapped ``server.synthesize`` signals arrival)
        — no fixed timers to go flaky under CI load."""
        import signal

        from valle2_tpu.serve import join_handler_threads

        text, pt, pc = make_requests(1, seed=11)[0]
        # Pre-compile so the in-flight request finishes promptly during drain.
        tts.synthesize_fused(text, pt, pc)
        prev_term = signal.getsignal(signal.SIGTERM)
        prev_int = signal.getsignal(signal.SIGINT)
        with TTSServer(tts, max_batch=2, max_wait_ms=0.0) as server:
            # Grab a free port, then rebind it below (allow_reuse_address).
            probe = serve_http(server, port=0, block=False)
            port = probe.server_address[1]
            probe.shutdown()
            probe.server_close()

            arrived = threading.Event()
            orig_synthesize = server.synthesize

            def synthesize(*a, **kw):
                arrived.set()              # request reached the server
                return orig_synthesize(*a, **kw)

            server.synthesize = synthesize
            result: dict = {}

            def client():
                body = json.dumps({'text': text,
                                   'prompt_tokens': pt.tolist(),
                                   'prompt_codes': pc.tolist()}).encode()
                req = urllib.request.Request(
                    f'http://127.0.0.1:{port}/synthesize', data=body)
                deadline = time.monotonic() + 60
                while True:                # retry until the listener is up
                    try:
                        resp = urllib.request.urlopen(req, timeout=300)
                        result['code'] = resp.status
                        result['body'] = resp.read()
                        return
                    except urllib.error.URLError as exc:
                        if time.monotonic() > deadline:
                            result['error'] = exc
                            return
                        time.sleep(0.02)
                    except Exception as exc:   # noqa: BLE001 — for the assert
                        result['error'] = exc
                        return

            t = threading.Thread(target=client)
            t.start()

            def fire_when_arrived():
                # Python runs the handler on the main thread (inside
                # serve_forever's poll loop) wherever the signal is raised.
                if arrived.wait(timeout=60):
                    signal.raise_signal(signal.SIGTERM)

            w = threading.Thread(target=fire_when_arrived)
            w.start()
            httpd = serve_http(server, port=port, block=True)  # returns on TERM
            t.join(timeout=300)
            w.join(timeout=60)
            assert not t.is_alive()
        # Worker drained by the context exit; handlers finish delivering.
        assert join_handler_threads(httpd, timeout=60)
        assert signal.getsignal(signal.SIGTERM) == prev_term
        assert signal.getsignal(signal.SIGINT) == prev_int
        assert result.get('code') == 200, result.get('error')
        with wave.open(io.BytesIO(result['body']), 'rb') as w2:
            assert w2.getnframes() > 0


class TestPrometheusFormat:
    def test_counters_and_gauges(self):
        from valle2_tpu.serve import stats_to_prometheus
        text = stats_to_prometheus({'requests': 3, 'errors': 0,
                                    'latency_ms_p50': 12.5, 'queue_depth': 2})
        lines = text.splitlines()
        assert '# TYPE valle2_requests_total counter' in lines
        assert 'valle2_requests_total 3' in lines
        assert 'valle2_errors_total 0' in lines
        assert '# TYPE valle2_latency_ms_p50 gauge' in lines
        assert 'valle2_latency_ms_p50 12.5' in lines
        assert 'valle2_queue_depth 2' in lines
        assert text.endswith('\n')
        # every sample line is "name value" with a finite float value
        for ln in lines:
            if not ln.startswith('#'):
                name, val = ln.split(' ')
                float(val)


class TestHTTPStreaming:
    def test_stream_matches_direct_generator(self):
        """Chunked /stream PCM equals the direct synthesize_streaming output
        (greedy; same default rng)."""
        tts1 = ValleTTS(tiny_cfg(num_beams=1))
        text, pt, pc = make_requests(1, seed=10)[0]
        direct = np.concatenate(list(tts1.synthesize_streaming(
            text, pt, pc, chunk_frames=5, lookahead_frames=3)) or
            [np.zeros(0, np.float32)])
        with TTSServer(tts1, max_batch=2, max_wait_ms=0.0) as server:
            httpd = serve_http(server, port=0, block=False)
            try:
                base = f'http://127.0.0.1:{httpd.server_address[1]}'
                body = json.dumps({'text': text,
                                   'prompt_tokens': pt.tolist(),
                                   'prompt_codes': pc.tolist(),
                                   'chunk_frames': 5,
                                   'lookahead_frames': 3}).encode()
                req = urllib.request.Request(f'{base}/stream', data=body)
                resp = urllib.request.urlopen(req, timeout=300)
                assert resp.headers['Content-Type'].startswith('audio/L16')
                # audio/L16 is network (big-endian) byte order per RFC 3551.
                pcm = np.frombuffer(resp.read(), '>i2')  # urllib de-chunks
                assert len(pcm) == len(direct)
                np.testing.assert_allclose(pcm / 32767.0, direct, atol=1e-4)
            finally:
                httpd.shutdown()

    def test_stream_rejects_nonpositive_chunk_frames(self):
        """chunk_frames=0 would spin forever holding the stream lock — must be
        a call-time ValueError and an HTTP 400, never a hang."""
        tts1 = ValleTTS(tiny_cfg(num_beams=1))
        text, pt, pc = make_requests(1, seed=12)[0]
        with TTSServer(tts1, max_batch=2, max_wait_ms=0.0) as server:
            with pytest.raises(ValueError, match='chunk_frames'):
                server.stream(text, pt, pc, chunk_frames=0)   # eager validation
            httpd = serve_http(server, port=0, block=False)
            try:
                base = f'http://127.0.0.1:{httpd.server_address[1]}'
                body = json.dumps({'text': text, 'prompt_tokens': pt.tolist(),
                                   'prompt_codes': pc.tolist(),
                                   'chunk_frames': 0}).encode()
                req = urllib.request.Request(f'{base}/stream', data=body)
                with pytest.raises(urllib.error.HTTPError) as ei:
                    urllib.request.urlopen(req, timeout=30)
                assert ei.value.code == 400
            finally:
                httpd.shutdown()

    def test_stream_counts_in_stats(self):
        tts1 = ValleTTS(tiny_cfg(num_beams=1))
        text, pt, pc = make_requests(1, seed=13)[0]
        with TTSServer(tts1, max_batch=2, max_wait_ms=0.0) as server:
            chunks = list(server.stream(text, pt, pc, chunk_frames=5,
                                        lookahead_frames=3))
            stats = server.stats()
        # Streams count separately from batched requests (mean_batch_size
        # must not be polluted by traffic that never batches).
        assert stats['stream_requests'] == 1 and stats['requests'] == 0
        secs = sum(len(c) for c in chunks) / tts1.codec.sampling_rate
        assert abs(stats['audio_seconds'] - secs) < 1e-6
        assert stats['errors'] == 0

    def test_stream_rejected_with_beams(self, tts):
        """num_beams != 1 → 400, before any audio bytes."""
        text, pt, pc = make_requests(1, seed=11)[0]
        with TTSServer(tts, max_batch=2, max_wait_ms=0.0) as server:
            httpd = serve_http(server, port=0, block=False)
            try:
                base = f'http://127.0.0.1:{httpd.server_address[1]}'
                body = json.dumps({'text': text, 'prompt_tokens': pt.tolist(),
                                   'prompt_codes': pc.tolist()}).encode()
                req = urllib.request.Request(f'{base}/stream', data=body)
                with pytest.raises(urllib.error.HTTPError) as ei:
                    urllib.request.urlopen(req, timeout=30)
                assert ei.value.code == 400
            finally:
                httpd.shutdown()

    def test_stream_longform_matches_direct(self):
        """`"longform": true` over HTTP equals synthesize_longform directly
        (greedy), and an invalid carry is a 400."""
        tts1 = ValleTTS(tiny_cfg(num_beams=1))
        text = 'go on. stop now.'
        _, pt, pc = make_requests(1, seed=14)[0]
        direct = np.concatenate(list(tts1.synthesize_longform(
            text, pt, pc, carry='chain', chunk_frames=5,
            lookahead_frames=3)) or [np.zeros(0, np.float32)])
        with TTSServer(tts1, max_batch=2, max_wait_ms=0.0) as server:
            httpd = serve_http(server, port=0, block=False)
            try:
                base = f'http://127.0.0.1:{httpd.server_address[1]}'
                body = json.dumps({'text': text,
                                   'prompt_tokens': pt.tolist(),
                                   'prompt_codes': pc.tolist(),
                                   'chunk_frames': 5, 'lookahead_frames': 3,
                                   'longform': True,
                                   'carry': 'chain'}).encode()
                req = urllib.request.Request(f'{base}/stream', data=body)
                resp = urllib.request.urlopen(req, timeout=300)
                pcm = np.frombuffer(resp.read(), '>i2')
                assert len(pcm) == len(direct)
                np.testing.assert_allclose(pcm / 32767.0, direct, atol=1e-4)

                bad = json.dumps({'text': text,
                                  'prompt_tokens': pt.tolist(),
                                  'prompt_codes': pc.tolist(),
                                  'longform': True,
                                  'carry': 'sideways'}).encode()
                req = urllib.request.Request(f'{base}/stream', data=bad)
                with pytest.raises(urllib.error.HTTPError) as ei:
                    urllib.request.urlopen(req, timeout=30)
                assert ei.value.code == 400
            finally:
                httpd.shutdown()


class TestServeCLI:
    def test_cli_boots_and_serves(self, tmp_path):
        """`python -m valle2_tpu.serve` wiring: config → pipeline → HTTP."""
        import socket
        import time as _time

        from valle2_tpu.serve import main as serve_main

        cfg = dict(d_model=32, n_heads=2, dim_feedforward=64, num_layers=2,
                   max_audio_len=12, num_beams=2, dropout=0.0, temperature=0.0,
                   bucket_sizes=[32, 64])
        p = tmp_path / 'cfg.json'
        p.write_text(json.dumps(cfg))
        s = socket.socket()
        s.bind(('127.0.0.1', 0))
        port = s.getsockname()[1]
        s.close()
        threading.Thread(target=serve_main, daemon=True,
                         args=(['-c', str(p), '--port', str(port)],)).start()
        deadline = _time.time() + 30
        last = None
        while _time.time() < deadline:
            try:
                last = urllib.request.urlopen(
                    f'http://127.0.0.1:{port}/healthz', timeout=1).read()
                break
            except Exception:
                _time.sleep(0.1)
        assert last == b'ok', f'server did not come up on port {port}'


class TestConcurrentSubmitters:
    def test_many_threads_all_served_exactly(self, tts):
        """8 client threads × greedy: every response equals the solo result,
        whatever batching the server chose."""
        reqs = make_requests(8, seed=7)
        want = {r[0]: tts.synthesize_fused(*r) for r in reqs}
        out = {}
        lock = threading.Lock()
        with TTSServer(tts, max_batch=4, max_wait_ms=20.0) as server:
            def client(r):
                res = server.synthesize(*r, timeout=300)
                with lock:
                    out[r[0]] = res
            threads = [threading.Thread(target=client, args=(r,)) for r in reqs]
            for t in threads:
                t.start()
            for t in threads:
                t.join()
        assert set(out) == set(want)
        for text in want:
            np.testing.assert_array_equal(out[text].codes, want[text].codes)
        stats = server.stats()
        assert stats['requests'] == 8
        assert stats['batches'] <= 8


class TestLoadShedding:
    """Bounded queue + stream slots: overload is rejected at the door (429),
    never accepted into unbounded latency growth."""

    def test_queue_full_rejects(self, tts):
        from valle2_tpu.serve import ServerOverloaded
        server = TTSServer(tts, max_batch=4, max_queue=2)   # worker NOT started
        reqs = make_requests(3, seed=20)
        f0 = server.submit(*reqs[0])
        f1 = server.submit(*reqs[1])
        with pytest.raises(ServerOverloaded, match='queue full'):
            server.submit(*reqs[2])
        stats = server.stats()
        assert stats['rejected'] == 1
        assert stats['queue_depth'] == 2
        assert stats['queue_oldest_age_s'] > 0.0
        assert stats['max_queue'] == 2
        # Accepted work still completes once the worker runs.
        with server:
            assert f0.result(timeout=300).waveform.ndim == 1
            assert f1.result(timeout=300).waveform.ndim == 1
        assert server.stats()['queue_depth'] == 0

    def test_http_429_and_504_when_worker_stalled(self, tts):
        """Worker never started = a stalled device: the first request times out
        (504), the second is shed (429) — no handler thread hangs forever."""
        import urllib.error
        server = TTSServer(tts, max_batch=4, max_queue=1)   # never started
        httpd = serve_http(server, port=0, block=False, request_timeout_s=1.0)
        try:
            base = f'http://127.0.0.1:{httpd.server_address[1]}'
            text, pt, pc = make_requests(1, seed=21)[0]
            body = json.dumps({'text': text, 'prompt_tokens': pt.tolist(),
                               'prompt_codes': pc.tolist()}).encode()
            codes = {}

            def hit(tag):
                try:
                    urllib.request.urlopen(
                        urllib.request.Request(f'{base}/synthesize', data=body),
                        timeout=30)
                    codes[tag] = 200
                except urllib.error.HTTPError as e:
                    codes[tag] = e.code
            t1 = threading.Thread(target=hit, args=('first',))
            t1.start()
            deadline = __import__('time').time() + 5
            while server.stats()['queue_depth'] < 1:
                assert __import__('time').time() < deadline, 'request never queued'
            hit('second')                      # queue full → shed
            t1.join(timeout=30)
            assert codes['second'] == 429
            assert codes['first'] == 504       # bounded wait, not a hang
        finally:
            httpd.shutdown()
            server.stop(drain=False)

    def test_concurrent_streams_and_overflow(self):
        """max_streams=2: two sessions interleave; a third is rejected with
        ServerOverloaded while they hold the slots, then succeeds after."""
        from valle2_tpu.serve import ServerOverloaded
        tts1 = ValleTTS(tiny_cfg(num_beams=1))
        text, pt, pc = make_requests(1, seed=22)[0]
        want = np.concatenate(list(tts1.synthesize_streaming(
            text, pt, pc, chunk_frames=4, lookahead_frames=2)) or
            [np.zeros(0, np.float32)])
        with TTSServer(tts1, max_batch=2, max_streams=2) as server:
            g1 = server.stream(text, pt, pc, chunk_frames=4, lookahead_frames=2)
            g2 = server.stream(text, pt, pc, chunk_frames=4, lookahead_frames=2)
            c1 = [next(g1)]                    # both sessions now hold a slot
            c2 = [next(g2)]
            g3 = server.stream(text, pt, pc, chunk_frames=4, lookahead_frames=2)
            with pytest.raises(ServerOverloaded, match='stream slots'):
                next(g3)
            assert server.stats()['rejected'] == 1
            c1 += list(g1)                     # drain: slots free up
            c2 += list(g2)
            c3 = list(server.stream(text, pt, pc, chunk_frames=4,
                                    lookahead_frames=2))
        for chunks in (c1, c2, c3):            # interleaving is bit-invisible
            np.testing.assert_array_equal(np.concatenate(chunks), want)
        assert server.stats()['stream_requests'] == 3

    def test_warmup_precompiles_batch_buckets(self, tts):
        """After warmup, serving any batch size hits a warm jit cache."""
        server = TTSServer(tts, max_batch=4)
        dt = server.warmup()
        assert dt >= 0.0
        # Every batch bucket (1, 2, 4) is compiled at the smallest length
        # bucket: serving afterwards must not trigger a single new compile.
        size_after_warm = tts._fused_jit._cache_size()
        assert size_after_warm >= len(server.batch_buckets)
        with server:
            r = make_requests(1, seed=23)[0]
            server.synthesize(*r, timeout=300)
        assert tts._fused_jit._cache_size() == size_after_warm   # no new compile


class TestStreamWarmup:
    def test_warmup_streams_compiles_streaming_path(self):
        tts1 = ValleTTS(tiny_cfg(num_beams=1))
        server = TTSServer(tts1, max_batch=2)
        dt = server.warmup(streams=True)
        assert dt >= 0.0
        # Streaming now runs against warm caches; a stream still works.
        text, pt, pc = make_requests(1, seed=30)[0]
        with server:
            chunks = list(server.stream(text, pt, pc, chunk_frames=5,
                                        lookahead_frames=3))
        assert sum(len(c) for c in chunks) > 0

    def test_warmup_streams_requires_single_beam(self, tts):
        server = TTSServer(tts, max_batch=2)     # module cfg has num_beams=2
        with pytest.raises(ValueError, match='num_beams'):
            server.warmup(streams=True)


class TestASREndpoint:
    def test_transcribe_http_roundtrip(self):
        """POST /transcribe with WAV bytes (and with JSON audio) returns the
        same text the pipeline produces directly; stats count it."""
        from valle2_tpu.tts import ValleASRPipeline
        from valle2_tpu.utils import wav_pcm16_bytes
        cfg = tiny_cfg(num_beams=1, vocab_size=70)
        asr = ValleASRPipeline(cfg)
        tts1 = ValleTTS(tiny_cfg(num_beams=1), codec=asr.codec)
        rs = np.random.RandomState(31)
        wav = (rs.randn(4800) * 0.1).astype(np.float32)
        want = asr.transcribe(wav, 24000)
        with TTSServer(tts1, max_batch=2, asr=asr) as server:
            assert server.transcribe(wav, 24000) == want
            httpd = serve_http(server, port=0, block=False)
            try:
                base = f'http://127.0.0.1:{httpd.server_address[1]}'
                req = urllib.request.Request(
                    f'{base}/transcribe', data=wav_pcm16_bytes(wav, 24000))
                resp = urllib.request.urlopen(req, timeout=300)
                out = json.loads(resp.read())
                assert isinstance(out['text'], str)
                # PCM16 quantization perturbs the audio slightly; the codec
                # ids can shift, so compare the JSON float path exactly.
                body = json.dumps({'audio': wav.tolist(), 'sr': 24000}).encode()
                req2 = urllib.request.Request(f'{base}/transcribe', data=body)
                out2 = json.loads(urllib.request.urlopen(req2, timeout=300).read())
                assert out2['text'] == want
            finally:
                httpd.shutdown()
        stats = server.stats()
        assert stats['asr_requests'] == 3 and stats['errors'] == 0

    def test_transcribe_unconfigured_is_501(self, tts):
        import urllib.error
        with TTSServer(tts, max_batch=2) as server:
            with pytest.raises(ValueError, match='ASR'):
                server.transcribe(np.zeros(2400, np.float32), 24000)
            httpd = serve_http(server, port=0, block=False)
            try:
                base = f'http://127.0.0.1:{httpd.server_address[1]}'
                req = urllib.request.Request(f'{base}/transcribe', data=b'RIFFxxxx')
                with pytest.raises(urllib.error.HTTPError) as ei:
                    urllib.request.urlopen(req, timeout=30)
                assert ei.value.code == 501
            finally:
                httpd.shutdown()


class TestWarmupAllLengths:
    def test_diagonal_length_buckets_covered(self):
        """warmup(all_lengths=True) pre-compiles every batch bucket at every
        DIAGONAL length bucket (ttm == pm == L) — a later long-text +
        long-prompt request must not trigger a new compile."""
        tts1 = ValleTTS(tiny_cfg(num_beams=1, bucket_sizes=(32, 64)))
        server = TTSServer(tts1, max_batch=2)
        server.warmup(all_lengths=True)
        size = tts1._fused_jit._cache_size()
        assert size >= len(server.batch_buckets) * 2   # 2 length buckets
        rs = np.random.RandomState(33)
        long_text = 'the quick brown fox jumps over the lazy dog again. '
        with server:
            # Long prompt (~40 frames -> pm bucket 64) + long text
            # (~50 phonemes -> ttm bucket 64): the all_lengths diagonal.
            server.synthesize(long_text, rs.randint(0, 70, (8,)),
                              rs.randint(0, 1024, (40, 8)), timeout=300)
        assert tts1._fused_jit._cache_size() == size   # no new compile
