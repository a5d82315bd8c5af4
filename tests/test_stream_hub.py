"""StreamHub (stream_hub.py): continuous-batched streaming serving.

Parity surface: a hub session's greedy AR tokens and NAR codes must be
bit-identical to the solo ``synthesize_streaming`` path.  With the default
batched NAR refinement the waveform is equal to float32 round-off (the
joint-batch codec decode reassociates reductions; measured max |Δ| ≤ 5e-8);
with ``batched_nar=False`` (per-session ``_ChunkEmitter``) the waveform is
bit-identical.
"""

import threading
import time

import jax
import numpy as np
import pytest

from valle2_tpu.config import ConfigValle
from valle2_tpu.serve import ServerOverloaded, TTSServer
from valle2_tpu.stream_hub import HubFull, StreamHub
from valle2_tpu.tts import ValleTTS


def tiny_cfg(**kw):
    base = dict(d_model=32, n_heads=2, dim_feedforward=64, num_layers=2,
                max_audio_len=12, num_beams=1, dropout=0.0, temperature=0.0,
                bucket_sizes=(32, 64, 128))
    base.update(kw)
    return ConfigValle(**base)


def collect(gen):
    out = [np.asarray(c) for c in gen]
    return np.concatenate(out) if out else np.zeros((0,), np.float32)


class TestStreamHub:
    @pytest.fixture(scope='class')
    def tts(self):
        return ValleTTS(tiny_cfg())

    def _prompts(self, n, seed=0):
        rs = np.random.RandomState(seed)
        return [(rs.randint(0, 70, (5,)), rs.randint(0, 1024, (6, 8)))
                for _ in range(n)]

    @pytest.mark.parametrize('batched', [True, False])
    def test_hub_waveform_equals_solo_streaming(self, tts, batched):
        prompts = self._prompts(2)
        texts = ['hello there.', 'go on now.']
        want = [collect(tts.synthesize_streaming(
            tx, pt, pc, chunk_frames=4, rng=jax.random.key(7)))
            for tx, (pt, pc) in zip(texts, prompts)]
        hub = StreamHub(tts, n_slots=2, chunk_frames=4, batched_nar=batched)
        try:
            got = [None, None]
            errs = []

            def run(i):
                try:
                    tx, (pt, pc) = texts[i], prompts[i]
                    got[i] = collect(hub.open(tx, pt, pc,
                                              rng=jax.random.key(7)))
                except Exception as e:      # noqa: BLE001
                    errs.append(e)

            threads = [threading.Thread(target=run, args=(i,))
                       for i in range(2)]
            for t in threads:
                t.start()
            for t in threads:
                t.join(timeout=120)
            assert not errs, errs
            for w, g in zip(want, got):
                if batched:
                    # Identical refined codes; the joint-batch codec decode
                    # reassociates float32 reductions (measured ≤ 5e-8).
                    assert g.shape == w.shape
                    np.testing.assert_allclose(g, w, rtol=1e-5, atol=1e-6)
                else:
                    np.testing.assert_array_equal(g, w)
            assert hub.live_sessions() == 0
        finally:
            hub.stop()

    def test_speculative_hub_waveform_equals_solo(self):
        """speculative=True: the hub decodes via n-gram verify turns — tokens
        are bit-identical (greedy speculation == plain greedy) and emission is
        token-count-based, so waveforms match the solo streaming path (which
        keeps the plain loop) to batched-NAR float round-off, even though
        chunks arrive at turn granularity."""
        tts = ValleTTS(tiny_cfg(speculative_k=4))
        prompts = self._prompts(2, seed=9)
        texts = ['hello there.', 'go on now.']
        want = [collect(tts.synthesize_streaming(
            tx, pt, pc, chunk_frames=4, rng=jax.random.key(7)))
            for tx, (pt, pc) in zip(texts, prompts)]
        hub = StreamHub(tts, n_slots=2, chunk_frames=4, speculative=True)
        try:
            got = [None, None]
            errs = []

            def run(i):
                try:
                    tx, (pt, pc) = texts[i], prompts[i]
                    got[i] = collect(hub.open(tx, pt, pc,
                                              rng=jax.random.key(7)))
                except Exception as e:      # noqa: BLE001
                    errs.append(e)

            threads = [threading.Thread(target=run, args=(i,))
                       for i in range(2)]
            for t in threads:
                t.start()
            for t in threads:
                t.join(timeout=120)
            assert not errs, errs
            for w, g in zip(want, got):
                assert g.shape == w.shape
                np.testing.assert_allclose(g, w, rtol=1e-5, atol=1e-6)
            assert hub.live_sessions() == 0
        finally:
            hub.stop()

    def test_speculative_hub_requires_k(self, tts):
        with pytest.raises(ValueError, match='speculative_k'):
            StreamHub(tts, n_slots=2, speculative=True)

    def test_hub_full_raises(self, tts):
        hub = StreamHub(tts, n_slots=1)
        try:
            pt, pc = self._prompts(1)[0]
            # Occupy the single row WITHOUT a hub session (the driver never
            # advances it, so it stays busy deterministically).
            hub.cb.join(pt, pc)
            with pytest.raises(HubFull):
                hub.open('hi.', pt, pc)
        finally:
            hub.stop()

    def test_close_frees_row(self, tts):
        hub = StreamHub(tts, n_slots=1, chunk_frames=2)
        try:
            pt, pc = self._prompts(1, seed=3)[0]
            gen = hub.open('one two.', pt, pc)
            next(gen)
            gen.close()                     # client disconnect
            deadline = time.time() + 10
            while hub.live_sessions() and time.time() < deadline:
                time.sleep(0.05)
            assert hub.live_sessions() == 0
            # The freed row serves a new session end to end.
            wav = collect(hub.open('one two.', pt, pc))
            assert len(wav) > 0
        finally:
            hub.stop()

    def test_lifecycle_stress_staggered_cycles(self):
        """Repeated cycles of staggered concurrent sessions on ONE hub: every
        session must produce its solo-streaming waveform (staggered joins put
        rows at different depths, so the batched NAR sees mixed gen_lens and
        reused slots every cycle) — catches slot-reuse races (dropped tokens,
        lost done-signals, stale emission state, driver death) that
        single-cycle tests cannot."""
        tts = ValleTTS(tiny_cfg(max_audio_len=10, ignore_eos=True))
        rs = np.random.RandomState(0)
        n = 3
        hub = StreamHub(tts, n_slots=n, chunk_frames=3)
        try:
            for cycle in range(3):
                prompts = [(rs.randint(0, 70, (5,)), rs.randint(0, 1024, (6, 8)))
                           for _ in range(n)]
                want = [collect(tts.synthesize_streaming(
                    'hello there.', pt, pc, chunk_frames=3, lookahead_frames=2))
                    for pt, pc in prompts]
                errs, got = [], [None] * n

                def worker(i, errs=errs, got=got, cycle=cycle, prompts=prompts):
                    try:
                        time.sleep(0.01 * i)        # staggered joins
                        pt, pc = prompts[i]
                        got[i] = collect(hub.open('hello there.', pt, pc,
                                                  lookahead_frames=2))
                    except Exception as e:          # noqa: BLE001
                        errs.append(f'cycle{cycle} s{i}: {e!r}')

                threads = [threading.Thread(target=worker, args=(i,))
                           for i in range(n)]
                for t in threads:
                    t.start()
                for t in threads:
                    t.join(timeout=180)
                assert not [t for t in threads if t.is_alive()], \
                    f'cycle {cycle}: sessions hung'
                assert not errs, errs
                for i, (w, g) in enumerate(zip(want, got)):
                    assert g is not None and g.shape == w.shape, \
                        (cycle, i, None if g is None else g.shape, w.shape)
                    np.testing.assert_allclose(
                        g, w, rtol=1e-5, atol=1e-6,
                        err_msg=f'cycle {cycle} session {i}')
            assert hub.live_sessions() == 0
        finally:
            hub.stop()

    def test_randomized_lifecycle_fuzz(self):
        """Seeded random schedule of overlapping joins, mid-stream ABORTS
        (generator close at a random chunk), and full consumptions on one
        hub: every completed session must equal its solo waveform, aborted
        sessions must free their rows, and the hub must end idle and still
        serve — randomized interleavings the staggered-cycle stress cannot
        reach (abort-while-cotenant-decodes, rejoin after abort, etc.)."""
        tts = ValleTTS(tiny_cfg(max_audio_len=10, ignore_eos=True))
        rs = np.random.RandomState(42)
        texts = ['hello there.', 'go on now.', 'stop that.']
        n_slots = 2
        hub = StreamHub(tts, n_slots=n_slots, chunk_frames=3)
        try:
            jobs = []
            for j in range(8):
                pt, pc = (rs.randint(0, 70, (5,)),
                          rs.randint(0, 1024, (6, 8)))
                abort_after = int(rs.randint(0, 3)) if rs.rand() < 0.4 else None
                jobs.append((texts[j % 3], pt, pc, abort_after))
            want = {i: collect(tts.synthesize_streaming(
                        tx, pt, pc, chunk_frames=3, lookahead_frames=2))
                    for i, (tx, pt, pc, ab) in enumerate(jobs) if ab is None}
            want0 = collect(tts.synthesize_streaming(
                jobs[0][0], jobs[0][1], jobs[0][2],
                chunk_frames=3, lookahead_frames=2))
            errs: list = []
            got: dict = {}
            sem = threading.Semaphore(n_slots)   # bound concurrent opens

            def worker(i):
                tx, pt, pc, abort_after = jobs[i]
                try:
                    with sem:
                        time.sleep(0.005 * (i % 4))
                        gen = hub.open(tx, pt, pc, lookahead_frames=2)
                        if abort_after is None:
                            got[i] = collect(gen)
                        else:
                            for k, _ch in enumerate(gen):
                                if k >= abort_after:
                                    break
                            gen.close()          # abort mid-stream
                except Exception as e:           # noqa: BLE001
                    errs.append(f'job{i}: {e!r}')

            threads = [threading.Thread(target=worker, args=(i,))
                       for i in range(len(jobs))]
            for t in threads:
                t.start()
            for t in threads:
                t.join(timeout=300)
            assert not [t for t in threads if t.is_alive()], 'sessions hung'
            assert not errs, errs
            for i, w in want.items():
                assert got[i].shape == w.shape, (i, got[i].shape, w.shape)
                np.testing.assert_allclose(got[i], w, rtol=1e-5, atol=1e-6,
                                           err_msg=f'job {i}')
            assert hub.live_sessions() == 0
            assert hub.cb.free_slots() == n_slots, 'aborts leaked rows'
            # The hub still serves cleanly after the churn.
            wav = collect(hub.open(jobs[0][0], jobs[0][1], jobs[0][2],
                                   lookahead_frames=2))
            np.testing.assert_allclose(wav, want0, rtol=1e-5, atol=1e-6)
        finally:
            hub.stop()

    def test_sampled_hub_stream_equals_solo(self):
        """temperature > 0 with per-session rng: hub AR sampling draws the
        solo stream's exact chain, so with per-session NAR refinement
        (batched_nar=False) the waveform is bit-identical to solo streaming.
        (The batched-NAR default refines sampled NAR stages from the hub
        chain — AR tokens still solo-exact, NAR draws differ; documented.)"""
        tts = ValleTTS(tiny_cfg(temperature=1.0, top_k=50))
        rs = np.random.RandomState(5)
        prompts = [(rs.randint(0, 70, (5,)), rs.randint(0, 1024, (6, 8)))
                   for _ in range(2)]
        keys = [jax.random.key(40 + i) for i in range(2)]
        want = [collect(tts.synthesize_streaming(
            'hello there.', pt, pc, chunk_frames=4, rng=k))
            for (pt, pc), k in zip(prompts, keys)]
        hub = StreamHub(tts, n_slots=2, chunk_frames=4, batched_nar=False)
        try:
            got = [None, None]
            errs = []

            def run(i):
                try:
                    pt, pc = prompts[i]
                    got[i] = collect(hub.open('hello there.', pt, pc,
                                              rng=keys[i]))
                except Exception as e:      # noqa: BLE001
                    errs.append(e)

            threads = [threading.Thread(target=run, args=(i,))
                       for i in range(2)]
            for t in threads:
                t.start()
            for t in threads:
                t.join(timeout=120)
            assert not errs, errs
            for w, g in zip(want, got):
                np.testing.assert_array_equal(g, w)
        finally:
            hub.stop()

    def test_refine_failure_frees_rows(self):
        """A failing batched NAR dispatch must END the live sessions AND
        release their batcher rows — otherwise one transient device error
        leaves every slot occupied and the hub returns HubFull forever."""
        tts = ValleTTS(tiny_cfg(max_audio_len=8, ignore_eos=True))
        hub = StreamHub(tts, n_slots=2, chunk_frames=3)
        try:
            rs = np.random.RandomState(11)
            pt, pc = rs.randint(0, 70, (5,)), rs.randint(0, 1024, (6, 8))
            orig = tts._nar_wav_jit
            calls = {'n': 0}

            def boom(*args):
                calls['n'] += 1
                raise RuntimeError('injected device failure')

            tts._nar_wav_jit = boom
            gen = hub.open('hello there.', pt, pc, lookahead_frames=0)
            chunks = list(gen)              # ends (empty) instead of hanging
            assert chunks == [] or all(len(c) == 0 for c in chunks)
            assert calls['n'] >= 1
            deadline = time.time() + 10
            while hub.live_sessions() and time.time() < deadline:
                time.sleep(0.05)
            assert hub.live_sessions() == 0
            assert hub.cb.free_slots() == 2, 'failure leaked batcher rows'
            # The hub serves again once the device "recovers".
            tts._nar_wav_jit = orig
            wav = collect(hub.open('hello there.', pt, pc))
            assert len(wav) > 0
        finally:
            hub.stop()

    def test_oversized_prompt_rejected(self, tts):
        hub = StreamHub(tts, n_slots=1, ttm=8, pm=8)
        try:
            with pytest.raises(ValueError, match='exceed'):
                hub.open('word ' * 40, np.zeros((4,), np.int32),
                         np.zeros((4, 8), np.int32))
        finally:
            hub.stop()


class TestHubDrain:
    """stop(drain=True): live sessions finish their FULL decode (never cut
    mid-stream), new opens are refused, and in-flight long-form streams
    truncate cleanly at a sentence boundary."""

    @pytest.fixture(scope='class')
    def tts(self):
        return ValleTTS(tiny_cfg())

    def test_drain_finishes_live_session(self, tts):
        rs = np.random.RandomState(3)
        pt, pc = rs.randint(0, 70, (5,)), rs.randint(0, 1024, (6, 8))
        want = collect(tts.synthesize_streaming(
            'hello there.', pt, pc, chunk_frames=4, rng=jax.random.key(7)))
        hub = StreamHub(tts, n_slots=2, chunk_frames=4)
        try:
            got = {}

            def run():
                got['w'] = collect(hub.open('hello there.', pt, pc,
                                            rng=jax.random.key(7)))

            t = threading.Thread(target=run)
            t.start()
            for _ in range(1200):      # overlap drain with the LIVE session
                if hub.live_sessions():
                    break
                time.sleep(0.05)
            hub.stop(drain=True)       # returns only once the row finished
            t.join(timeout=120)
            assert not t.is_alive()
            assert hub.live_sessions() == 0
            # The complete waveform, not a truncated one (fail_all would have
            # ended the session with whatever had streamed so far).
            assert got['w'].shape == want.shape
            np.testing.assert_allclose(got['w'], want, rtol=1e-5, atol=1e-6)
            with pytest.raises(RuntimeError, match='stopped'):
                hub.open('more.', pt, pc)
        finally:
            hub.stop()

    def test_open_refused_while_draining(self, tts):
        from valle2_tpu.stream_hub import HubDraining
        hub = StreamHub(tts, n_slots=1)
        try:
            hub._draining = True
            with pytest.raises(HubDraining, match='draining'):
                hub.open('hi there.', np.zeros(2, np.int32),
                         np.zeros((2, 8), np.int32))
            with pytest.raises(HubDraining, match='draining'):
                collect(hub.open_longform('hi there. and more.',
                                          np.zeros(2, np.int32),
                                          np.zeros((2, 8), np.int32)))
        finally:
            hub._draining = False
            hub.stop()

    def test_longform_truncates_at_sentence_boundary(self, tts):
        rs = np.random.RandomState(4)
        pt, pc = rs.randint(0, 70, (5,)), rs.randint(0, 1024, (6, 8))
        rng = jax.random.key(5)
        want0 = collect(tts.synthesize_streaming(
            'hello there.', pt, pc, chunk_frames=4,
            rng=jax.random.fold_in(rng, 0)))
        # n_slots=1: sentence 1 cannot prefetch while sentence 0 streams, so
        # its open happens after the drain flag is set → clean truncation.
        hub = StreamHub(tts, n_slots=1, chunk_frames=4)
        try:
            gen = hub.open_longform('hello there. go on now.', pt, pc, rng=rng)
            hub._draining = True       # drain starts before sentence 1 opens
            got = collect(gen)         # no exception — truncates, not errors
            assert got.shape == want0.shape
            np.testing.assert_allclose(got, want0, rtol=1e-5, atol=1e-6)
        finally:
            hub._draining = False
            hub.stop()

    def test_server_stop_passes_drain_to_hub(self, tts):
        server = TTSServer(tts, cb_streams=2)
        rec = {}
        orig = server._hub.stop

        def spy(drain=False, timeout=600.0):
            rec['drain'] = drain
            orig(drain=drain, timeout=timeout)

        server._hub.stop = spy
        with server:
            pass                       # __exit__ → stop(drain=True) default
        assert rec.get('drain') is True


class TestAdaptiveVerifyTurns:
    """Pure-logic gates on the speculative hub's per-cycle turn budget
    (stream_hub._turns_for_cycle / _observe_acceptance): the cycle should
    deliver ~chunk_frames tokens per session at any observed acceptance,
    clamped to [1, chunk_frames]."""

    @staticmethod
    def bare_hub(chunk_frames=24, spec=True, ema=4.0):
        hub = StreamHub.__new__(StreamHub)     # logic-only: skip device setup
        hub.chunk_frames = chunk_frames
        hub._spec = spec
        hub._accept_ema = ema
        return hub

    def test_plain_hub_uses_chunk_frames(self):
        assert self.bare_hub(spec=False)._turns_for_cycle() == 24

    def test_turns_track_acceptance(self):
        # Perfect acceptance (K=4): a quarter of the turns; floor acceptance
        # (1 token/turn): the full chunk; EMA below 1 clamps the divisor.
        assert self.bare_hub(ema=4.0)._turns_for_cycle() == 6
        assert self.bare_hub(ema=1.0)._turns_for_cycle() == 24
        assert self.bare_hub(ema=0.25)._turns_for_cycle() == 24
        assert self.bare_hub(ema=100.0)._turns_for_cycle() == 1

    def test_never_exceeds_plain_token_budget(self):
        # turns * 1-token-minimum <= chunk_frames AND turns >= 1, all EMAs.
        for ema in (0.0, 0.5, 1.0, 1.5, 2.0, 3.9, 4.0, 7.0, 1e6):
            t = self.bare_hub(ema=ema)._turns_for_cycle()
            assert 1 <= t <= 24

    def test_ema_converges_to_observed_rate(self):
        hub = self.bare_hub(ema=4.0)
        # Two rows, each committing 3 tokens over 6 turns → 0.5/turn/row.
        out = {0: (object(), np.zeros(3, np.int32), False),
               1: (object(), np.zeros(3, np.int32), False)}
        for _ in range(30):
            hub._observe_acceptance(out, turns=6)
        assert abs(hub._accept_ema - 0.5) < 1e-6
        # Low acceptance drives the next cycle back to the full chunk budget.
        assert hub._turns_for_cycle() == 24

    def test_ema_tracks_fastest_row(self):
        """Mixed hub: the EMA follows the MAX per-row rate, so the fastest
        session's per-cycle delivery stays bounded at ~chunk_frames (the
        burst-free choice); the mean would let it burst 1.6x indefinitely."""
        hub = self.bare_hub(ema=1.0, chunk_frames=24)
        out = {0: (object(), np.zeros(24, np.int32), False),   # 4 tok/turn
               1: (object(), np.zeros(6, np.int32), False)}    # 1 tok/turn
        for _ in range(30):
            hub._observe_acceptance(out, turns=6)
        assert abs(hub._accept_ema - 4.0) < 1e-6
        assert hub._turns_for_cycle() == 6   # 6 turns x 4/turn = one chunk

    def test_mid_advance_finishers_do_not_poison_ema(self):
        """A row that finished mid-advance ran an unknown number of turns
        (the joint loop exits early when all rows finish) — its tokens/turns
        ratio would understate acceptance and pin the EMA at the floor under
        short-utterance traffic.  Done rows are skipped; a cycle where EVERY
        producing row finished leaves the EMA untouched."""
        hub = self.bare_hub(ema=4.0)
        # Perfect-acceptance session EOSes after 8 tokens of a 24-turn cycle.
        hub._observe_acceptance({0: (object(), np.zeros(8, np.int32), True)},
                                turns=24)
        assert hub._accept_ema == 4.0
        # Live rows still update; the co-tenant that finished is ignored.
        hub._observe_acceptance(
            {0: (object(), np.zeros(2, np.int32), True),
             1: (object(), np.zeros(24, np.int32), False)}, turns=6)
        assert abs(hub._accept_ema - 4.0) < 1e-6

    def test_empty_cycle_keeps_ema(self):
        hub = self.bare_hub(ema=2.5)
        hub._observe_acceptance({}, turns=10)
        assert hub._accept_ema == 2.5
        hub._spec = False
        hub._observe_acceptance({0: (object(), np.zeros(9), False)}, turns=3)
        assert hub._accept_ema == 2.5      # plain hub never adapts


class TestServerIntegration:
    def test_server_stream_routes_through_hub(self):
        tts = ValleTTS(tiny_cfg())
        rs = np.random.RandomState(1)
        pt, pc = rs.randint(0, 70, (5,)), rs.randint(0, 1024, (6, 8))
        want = collect(tts.synthesize_streaming(
            'server test.', pt, pc, chunk_frames=25,
            rng=jax.random.key(tts.config.seed)))
        server = TTSServer(tts, cb_streams=2)
        try:
            got = collect(server.stream('server test.', pt, pc))
            # Hub default = batched NAR: float32 round-off vs solo (see
            # TestStreamHub parity test).
            assert got.shape == want.shape
            np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
            st = server.stats()
            assert st['stream_requests'] == 1
            assert st['stream_hub_slots'] == 2
            assert st['stream_hub_live'] == 0
        finally:
            server.stop()

    def test_server_oversized_prompt_falls_back_to_solo(self):
        tts = ValleTTS(tiny_cfg())
        server = TTSServer(tts, cb_streams=1, cb_geometry=(8, 8))
        try:
            rs = np.random.RandomState(2)
            pt, pc = rs.randint(0, 70, (5,)), rs.randint(0, 1024, (20, 8))
            wav = collect(server.stream('a much longer sentence here.',
                                        pt, pc))
            assert len(wav) > 0             # served by the solo path
            assert server.stats()['stream_hub_live'] == 0
        finally:
            server.stop()

    def test_server_hub_full_maps_to_429(self):
        tts = ValleTTS(tiny_cfg())
        server = TTSServer(tts, cb_streams=1)
        try:
            rs = np.random.RandomState(3)
            pt, pc = rs.randint(0, 70, (5,)), rs.randint(0, 1024, (6, 8))
            server._hub.cb.join(pt, pc)     # pin the single row
            with pytest.raises(ServerOverloaded):
                server.stream('hi.', pt, pc)
            assert server.stats()['rejected'] == 1
        finally:
            server.stop()

    def test_server_longform_prompt_mode_rides_the_hub(self):
        """longform + carry='prompt' under --cb-streams goes through
        StreamHub.open_longform (pipelined); carry='chain' stays solo."""
        tts = ValleTTS(tiny_cfg())
        rs = np.random.RandomState(4)
        pt, pc = rs.randint(0, 70, (5,)), rs.randint(0, 1024, (6, 8))
        text = 'go on. stop now. once more.'
        want = collect(tts.synthesize_longform(text, pt, pc, carry='prompt',
                                               chunk_frames=25))
        server = TTSServer(tts, cb_streams=3)
        try:
            got = collect(server.stream(text, pt, pc, longform=True))
            assert got.shape == want.shape
            np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
            st = server.stats()
            assert st['longform_prefetched'] >= 1      # pipelining happened
            assert st['stream_hub_live'] == 0

            # chain mode: solo path (bit-exact vs direct synthesize_longform).
            want_chain = collect(tts.synthesize_longform(
                text, pt, pc, carry='chain', chunk_frames=25))
            got_chain = collect(server.stream(text, pt, pc, longform=True,
                                              carry='chain'))
            np.testing.assert_array_equal(got_chain, want_chain)
            assert server.stats()['longform_prefetched'] == \
                st['longform_prefetched']              # hub untouched
        finally:
            server.stop()
