"""StreamHub — continuous-batching driver for concurrent streaming TTS.

Today's serving path gives each ``/stream`` session its own batch-1
``DecodeStream``; N concurrent sessions serialize N small decode programs on
the device and each pays the full per-dispatch cost.  The hub instead runs
ONE shared ``models.continuous.ContinuousDecoder`` loop (rows = ``n_slots``)
on a background driver thread: sessions join a free row mid-flight, every
``advance`` moves ALL live sessions one chunk for about the cost of one, and
rows free on EOS/disconnect.  Measured on the target TPU (BENCHMARKS.md
"continuous batching"): aggregate AR throughput 3.1x at 4 sessions and 5.0x
at 8 over the round-robin solo-stream arm (which is flat in N — each
session's advance pays its own ~90 ms dispatch round trip), with the
per-row fused kernel adding +29% over the XLA step.

**Batched NAR refinement** (default): the per-chunk NAR→wav pass is also one
joint dispatch for every session that crossed its lookahead threshold this
cycle, instead of one batch-1 dispatch per session from its handler thread —
at N sessions that is 1 refine per chunk instead of N, and each solo dispatch
costs a full tunnel round trip on the target runtime.  Exactness:
``nar._generate_fn`` masks every position past each row's true lengths
(padding-invariance is its stated invariant, models/nar.py), rows are
independent, and sessions insert device-frozen until activation so chunk
cadence/refinement depths match solo exactly — greedy AR tokens and NAR
codes are bit-identical to the solo streaming path, and the waveform matches
to float32 round-off (measured max |Δ| ≤ 6e-8: the joint-batch codec decode
reassociates reductions; tests/test_stream_hub.py pins both).  Sampled
(temperature>0) sessions keep their OWN AR sampling chains (per-row rng in
models/continuous.py), so AR tokens stay solo-exact even when sampling; with
``batched_nar=False`` the sampled WAVEFORM is bit-identical to solo streaming
too (tested), while the batched-NAR default draws the NAR stage samples from
the hub's chain (greedy NAR is unaffected — argmax).

No reference counterpart: the reference has no serving or streaming at all
(SURVEY §1; its inference is a host-driven batch-1 loop,
/root/reference/valle/models/valle_ar.py:141-171).
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator

import jax
import numpy as np

from .models.continuous import BatcherFull, ContinuousDecoder
from .tts import HOP, finalize_frames
from .utils import log_warning

__all__ = ['StreamHub', 'HubFull', 'HubDraining', 'HubStopped']

HubFull = BatcherFull       # serving-layer alias (maps to HTTP 429)


class HubDraining(RuntimeError):
    """Raised by ``open``/``open_longform`` during ``stop(drain=True)``: the
    hub is finishing its live sessions and accepts no new ones."""


class HubStopped(RuntimeError):
    """Raised by ``open``/``open_longform`` once the hub has stopped (maps to
    a retryable 503 in serve.py, like HubDraining)."""


class _Session:
    __slots__ = ('slot', 'q', 'done', 'lookahead', 'buf', 'n', 'emitted',
                 'sink')

    def __init__(self, slot: int, lookahead: int, max_new: int,
                 sink: list | None = None):
        self.slot = slot
        self.q: queue.Queue = queue.Queue()
        self.done = False
        self.lookahead = lookahead
        # Batched-NAR emission state (unused when batched_nar=False).
        self.buf = np.zeros((max_new,), np.int32)   # first-codebook tokens
        self.n = 0                                  # tokens received
        self.emitted = 0                            # frames already emitted
        self.sink = sink                            # optional codes collector


class StreamHub:
    """Owns one ContinuousDecoder + the driver thread that advances it.

    ``open()`` joins a session and returns a waveform-chunk generator with
    ``synthesize_streaming`` semantics; raises ``HubFull`` when all rows are
    busy (serve.py maps it to 429).  ``chunk_frames`` is the hub-wide advance
    granularity — every live session receives audio each chunk.  ``ttm``/
    ``pm`` bound the shared prompt geometry (see ContinuousDecoder; prompts
    that do not fit raise ValueError — route those to the solo path).
    ``batched_nar``: refine all due sessions' prefixes in ONE joint NAR→wav
    dispatch per chunk (default; see module docstring).
    ``speculative``: run the joint loop as n-gram verify turns (requires
    ``config.speculative_k >= 2``; see ContinuousDecoder).  Waveforms are
    unchanged (greedy speculation commits bit-identical tokens and emission
    is token-count-based) — only the arrival cadence coarsens to turn
    granularity.  The turn count per cycle adapts to the observed acceptance
    rate (EMA of the max per-row rate), so a cycle delivers ~chunk_frames
    tokens for the fastest session and never more — slower sessions in a
    mixed hub get finer-than-chunk cadence rather than anyone getting a
    multi-chunk burst.
    """

    def __init__(self, tts, n_slots: int = 4, chunk_frames: int = 25,
                 ttm: int | None = None, pm: int | None = None,
                 batched_nar: bool = True, speculative: bool = False):
        if int(chunk_frames) < 1:
            raise ValueError(f'chunk_frames must be >= 1, got {chunk_frames}')
        if tts.config.num_beams != 1:
            raise ValueError('streaming requires num_beams=1')
        tts._ensure_stream_models()
        self.tts = tts
        self.chunk_frames = int(chunk_frames)
        self.cb = ContinuousDecoder(tts._stream_ar, n_slots=n_slots,
                                    ttm=ttm, pm=pm,
                                    speculative=bool(speculative))
        # advance() is token-bounded on the plain loop, TURN-bounded (1..K
        # tokens each) on the speculative loop.  Turn count per cycle adapts
        # to the OBSERVED acceptance rate so a cycle keeps delivering roughly
        # chunk_frames tokens per session: a static chunk/K at low-acceptance
        # content quarters the tokens per host round trip, which measured
        # 4.3x slower than the plain hub on the dispatch-bound runtime (the
        # turn count is a traced operand of the jitted advance — adapting it
        # never recompiles).
        self._spec = bool(speculative)
        self._accept_ema = float(tts.config.speculative_k or 1)
        self.batched_nar = bool(batched_nar)
        self._by_slot: dict[int, _Session] = {}
        self._emitters: dict[int, object] = {}      # batched_nar=False only
        self._lock = threading.Lock()
        self._wake = threading.Condition(self._lock)
        self._stopped = False
        self._draining = False
        #: Sentences opened CONCURRENTLY with an earlier one still streaming
        #: (open_longform pipelining gauge; exported in serve.py /stats).
        self.longform_prefetched = 0

        if self.batched_nar:
            import jax.numpy as jnp
            from .tts import stream_widths
            config = tts.config
            # Same width grid as the solo emitter — the parity surface.
            self._widths = stream_widths(config)
            n = self.cb.n_slots
            # Pad prompts to the same bucket grid the solo _ChunkEmitter uses:
            # when a session's own buckets coincide with the hub geometry (the
            # common case — the hub geometry IS a bucket size), its refinement
            # runs through the exact program shapes of the solo path, keeping
            # greedy NAR codes bit-stable even at untrained-model tie margins.
            from .config import bucket_len
            self._nar_ttm = bucket_len(config.bucket_sizes, self.cb.ttm)
            self._nar_pm = bucket_len(config.bucket_sizes,
                                      max(1, self.cb.pm - 1))
            nq = config.num_quantizers
            # Device-resident per-slot prompts, rewritten only on join — the
            # per-cycle dispatch ships just (first_layer, gen_lens).  Dummy
            # rows keep tl=1 / gen_len=1 so no row is ever fully masked (a
            # fully-masked softmax row is NaN; harmless but trips debug-nans).
            self._nar_tokens = jnp.zeros((n, self._nar_ttm), jnp.int32)
            self._nar_tl = jnp.ones((n,), jnp.int32)
            self._nar_pcodes = jnp.zeros((n, self._nar_pm, nq), jnp.int32)
            self._nar_pl = jnp.zeros((n,), jnp.int32)
            self._nar_rng = jax.random.key(config.seed)

        self._driver = threading.Thread(target=self._drive, daemon=True,
                                        name='valle2-stream-hub')
        self._driver.start()

    # -- public ------------------------------------------------------------

    def open(self, text: str, prompt_tokens, prompt_codes,
             lookahead_frames: int = 38, rng=None,
             bucket: bool = True,
             codes_sink: list | None = None) -> Iterator[np.ndarray]:
        """Join the shared loop and return a generator of 24 kHz float32
        waveform chunks.  Validation, prefill and row insertion happen at
        CALL time (bad args / HubFull raise immediately, before any chunked
        HTTP response starts).

        ``codes_sink``: optional list the session's generated FIRST-CODEBOOK
        token arrays are appended to as they arrive (np.int32 segments;
        concatenate for the full stream).  Lets quality harnesses score the
        decoded codes of a hub session (tools/hub_bench --trained) without
        inverting the waveform."""
        if int(lookahead_frames) < 0:
            raise ValueError(
                f'lookahead_frames must be >= 0, got {lookahead_frames}')
        if self._stopped:
            raise HubStopped('hub is stopped')
        if self._draining:
            raise HubDraining('hub is draining — not accepting new sessions')
        if rng is None:
            rng = jax.random.key(self.tts.config.seed)
        import jax.numpy as jnp
        rng_ar, rng_nar = jax.random.split(jnp.asarray(rng))

        tokens = np.concatenate([np.asarray(prompt_tokens, np.int32),
                                 self.tts.tokenizer(text)])
        pcodes = np.asarray(prompt_codes, np.int32).reshape(
            -1, self.tts.config.num_quantizers)
        emitter = None
        if not self.batched_nar:
            from .tts import _ChunkEmitter
            emitter = _ChunkEmitter(self.tts, tokens, pcodes,
                                    lookahead_frames, rng_nar, bucket=bucket)
        # join(start=False) keeps the row invisible to the driver's advance
        # until the session is registered in _by_slot — otherwise a concurrent
        # advance can read the previous occupant's finished device row as this
        # session's state (spurious instant done) or deliver tokens nobody is
        # routing yet (dropped chunks / lost done signal; caught by
        # tests/test_stream_hub.py::test_lifecycle_stress_staggered_cycles).
        # The session object rides along as the advance tag (see _drive).
        sess = _Session(-1, int(lookahead_frames),
                        self.tts.config.max_audio_len, sink=codes_sink)
        sess.slot = slot = self.cb.join(tokens, pcodes, start=False,
                                        rng=rng_ar, tag=sess)
        with self._wake:
            # Re-check under the lock: a stop()/stop(drain=True) that landed
            # while this open was prefilling must not register a session the
            # (possibly already exited) driver will never advance — the
            # consumer would hang until the stall timeout.
            if self._stopped or self._draining:
                self.cb.release(slot)
                if self._draining and not self._stopped:
                    raise HubDraining(
                        'hub is draining — not accepting new sessions')
                raise HubStopped('hub is stopped')
            self._by_slot[slot] = sess
            if emitter is not None:
                self._emitters[slot] = emitter
            else:
                self._write_nar_prompt(slot, tokens, pcodes)
            self._wake.notify_all()
        try:
            self.cb.activate(slot)
        except KeyError:
            # stop() landed between registration and activation: _fail_all
            # already delivered this session's done marker and released the
            # row — fail fast with the retryable error instead of handing the
            # caller a dead generator (or a KeyError the HTTP layer would
            # map to a non-retryable 400).
            raise HubStopped('hub is stopped') from None

        if emitter is not None:
            def chunks():
                try:
                    while True:
                        toks, done = self._next(sess)
                        for wav in emitter.push(toks, done):
                            yield wav
                        if done:
                            return
                finally:
                    self._abort(sess)
        else:
            def chunks():
                try:
                    while True:
                        wav, done = self._next(sess)
                        if wav is not None and len(wav):
                            yield wav
                        if done:
                            return
                finally:
                    self._abort(sess)

        return chunks()

    def open_longform(self, text: str, prompt_tokens, prompt_codes,
                      lookahead_frames: int = 38, rng=None,
                      max_inflight: int = 2) -> Iterator[np.ndarray]:
        """PIPELINED long-form synthesis through the shared loop.

        ``ValleTTS.synthesize_longform(carry='prompt')`` conditions every
        sentence on the original speaker prompt, which makes sentences
        independent — so instead of decoding them back to back, the hub
        decodes up to ``max_inflight`` sentences CONCURRENTLY in the joint
        loop: while sentence *i*'s audio streams to the client, sentences
        *i+1..* are already decoding, their chunks buffering in their session
        queues (a finished prefetch frees its row immediately — rows are not
        held while buffered audio waits).  Greedy output is bit-identical to
        ``synthesize_longform(carry='prompt')`` (per-sentence rng is the same
        ``fold_in(rng, i)``; each hub session is solo-exact by the hub's own
        parity surface).

        Degradation is graceful and never blocks: a sentence whose combined
        prompt exceeds the hub geometry streams solo
        (``synthesize_streaming`` — identical waveform), and a sentence whose
        turn arrives while every row is busy with other traffic falls back to
        solo as well.  Only the FIRST sentence propagates ``HubFull`` (the
        serve-layer 429 contract: reject at call time, before any chunked
        response starts).  ``carry='chain'`` cannot ride the hub — sentence
        *i+1* needs sentence *i*'s refined codes before its prefill — and
        stays on the solo path (serve.py routes it there).
        """
        if int(lookahead_frames) < 0:
            raise ValueError(
                f'lookahead_frames must be >= 0, got {lookahead_frames}')
        if int(max_inflight) < 1:
            raise ValueError(f'max_inflight must be >= 1, got {max_inflight}')
        if self._stopped:
            raise HubStopped('hub is stopped')
        if self._draining:
            raise HubDraining('hub is draining — not accepting new sessions')
        from .data.frontend import split_sentences
        import jax.numpy as jnp
        if rng is None:
            rng = jax.random.key(self.tts.config.seed)
        rng = jnp.asarray(rng)
        pt = np.asarray(prompt_tokens, np.int32)
        pc = np.asarray(prompt_codes, np.int32).reshape(
            -1, self.tts.config.num_quantizers)
        sentences = split_sentences(text)
        if not sentences:
            return iter(())

        def solo(i):
            # Identical to what synthesize_longform(carry='prompt') runs for
            # sentence i: same rng fold, same chunk cadence.  Pull-driven, so
            # "prefetching" one costs nothing until it is consumed.
            return self.tts.synthesize_streaming(
                sentences[i], pt, pc, chunk_frames=self.chunk_frames,
                lookahead_frames=int(lookahead_frames),
                rng=jax.random.fold_in(rng, i))

        _DRAIN = object()           # sentinel: hub draining — truncate here

        def try_open(i):
            """Prefetch sentence i onto the hub; None = no row free right now
            (retried at the next sentence boundary); ``_DRAIN`` = the hub is
            shutting down gracefully — stop opening sentences."""
            try:
                return self.open(sentences[i], pt, pc,
                                 lookahead_frames=int(lookahead_frames),
                                 rng=jax.random.fold_in(rng, i))
            except HubDraining:
                return _DRAIN
            except HubFull:
                return None
            except ValueError as exc:
                if 'exceed' not in str(exc):
                    raise
                return solo(i)      # prompt too big for the hub geometry

        # Sentence 0 opens NOW so HubFull raises to the caller (→ 429); an
        # oversized first sentence still streams solo.  A drain that starts
        # before the first sentence rejects the whole request (same contract
        # as open()).
        first = try_open(0)
        if first is _DRAIN:
            raise HubDraining('hub is draining — not accepting new sessions')
        if first is None:
            raise HubFull(f'all {self.cb.n_slots} hub rows busy')
        gens: dict[int, Iterator] = {0: first}

        def chunks():
            nxt = 1
            try:
                for i in range(len(sentences)):
                    gen_i = gens.pop(i, None)
                    if gen_i is None:
                        gen_i = try_open(i)
                        if gen_i is _DRAIN:
                            # Graceful shutdown mid-longform: everything up to
                            # the previous sentence has streamed; truncate at
                            # this sentence boundary instead of erroring the
                            # client.  (Already-open prefetched sentences
                            # cannot exist past a failed open — prefetch is
                            # strictly sequential.)
                            log_warning('long-form stream truncated at '
                                        'sentence %d/%d: hub draining',
                                        i, len(sentences))
                            return
                        gen_i = gen_i or solo(i)
                        gens[i] = gen_i     # visible to the finally-cleanup
                    else:
                        gens[i] = gen_i
                    while nxt < len(sentences) and nxt - i < max_inflight:
                        g = try_open(nxt)
                        if g is None or g is _DRAIN:
                            break           # no row free — retry next sentence
                        gens[nxt] = g
                        self.longform_prefetched += 1
                        nxt += 1
                    for wav in gen_i:
                        yield wav
                    gens.pop(i, None)
            finally:
                for g in gens.values():     # client gone: free every row
                    g.close()
                gens.clear()

        return chunks()

    def live_sessions(self) -> int:
        with self._lock:
            return len(self._by_slot)

    def stop(self, drain: bool = False, timeout: float = 600.0) -> None:
        """Stop the driver thread.

        ``drain=False`` (default): live sessions end with their next chunk.
        ``drain=True``: new ``open``s are refused (``HubDraining``) while the
        driver keeps advancing until every live row finishes — each is
        bounded by its own decode budget (EOS or ``max_audio_len``), so drain
        is bounded too (plus ``timeout`` as the hard stop for a wedged
        device).  In-flight long-form streams truncate cleanly at their
        current sentence boundary (no mid-sentence cut, no error to the
        client).  Idempotent either way."""
        import time as _time
        if drain:
            with self._wake:
                self._draining = True
                # The routing paths notify when the last session leaves
                # (_route_* / _fail_all) — no polling; ``timeout`` is the
                # hard stop for a wedged device.
                deadline = _time.monotonic() + timeout
                while self._by_slot and not self._stopped:
                    remaining = deadline - _time.monotonic()
                    if remaining <= 0:
                        break
                    self._wake.wait(remaining)
        with self._wake:
            self._stopped = True
            self._wake.notify_all()
        self._driver.join(timeout=30)

    # -- internals ---------------------------------------------------------

    @staticmethod
    def _next(sess: _Session):
        # The driver feeds every live session each advance; a long silence
        # means the driver died — fail the stream rather than hang the
        # handler thread forever.
        try:
            return sess.q.get(timeout=600.0)
        except queue.Empty:
            raise RuntimeError('stream hub driver stalled '
                               '(no tokens for 600 s)') from None

    def _write_nar_prompt(self, slot: int, tokens: np.ndarray,
                          pcodes: np.ndarray) -> None:
        """Rewrite device-resident prompt row ``slot`` (called under _lock).
        Lengths were validated by cb.join against the same geometry."""
        import jax.numpy as jnp
        tok = np.zeros((self._nar_ttm,), np.int32)
        tok[:len(tokens)] = tokens
        pc = np.zeros((self._nar_pm, self._nar_pcodes.shape[2]), np.int32)
        pc[:len(pcodes)] = pcodes
        self._nar_tokens = self._nar_tokens.at[slot].set(jnp.asarray(tok))
        self._nar_tl = self._nar_tl.at[slot].set(max(1, len(tokens)))
        self._nar_pcodes = self._nar_pcodes.at[slot].set(jnp.asarray(pc))
        self._nar_pl = self._nar_pl.at[slot].set(len(pcodes))

    def _fail_all(self) -> None:
        """End every live session (driver stop or device failure).  Rows are
        RELEASED back to the batcher: the generators' _abort is a no-op once
        _by_slot is cleared, so skipping release here would leave every slot
        occupied forever — one transient dispatch failure would brick the hub
        into permanent HubFull/429."""
        for slot, sess in self._by_slot.items():
            sess.done = True
            sess.q.put((None, True) if self.batched_nar
                       else (np.zeros(0, np.int32), True))
            try:
                self.cb.release(slot)
            except Exception as e:          # noqa: BLE001
                log_warning('releasing slot %d after failure failed (%s: %s)',
                            slot, type(e).__name__, e)
        self._by_slot.clear()
        self._emitters.clear()
        self._wake.notify_all()             # wake a drain waiter (lock held)

    def _drive(self) -> None:
        while True:
            with self._wake:
                while not self._by_slot and not self._stopped:
                    self._wake.wait()
                if self._stopped:
                    self._fail_all()
                    return
            turns = self._turns_for_cycle()
            try:
                # tags=True: output rows carry the _Session that owned them
                # DURING the advance (join-time tag) plus doneness captured
                # under the batcher lock — routing by slot id alone could hand
                # a released/re-joined slot's tokens to the wrong session.
                out = self.cb.advance(turns, tags=True)
            except Exception as e:          # device failure: fail all sessions
                log_warning('stream hub advance failed (%s: %s) — ending '
                            'live sessions', type(e).__name__, e)
                with self._lock:
                    self._fail_all()
                continue
            self._observe_acceptance(out, turns)
            if self.batched_nar:
                self._route_batched(out)
            else:
                self._route_tokens(out)

    def _turns_for_cycle(self) -> int:
        """Advance budget for the next cycle.  Plain loop: chunk_frames token
        steps.  Speculative loop: verify TURNS, chosen from the acceptance
        EMA so the cycle delivers ~chunk_frames tokens for the FASTEST row —
        the EMA tracks the max per-row rate (see _observe_acceptance), which
        bounds any session's per-cycle burst at ~chunk_frames; slower rows
        receive fewer tokens per cycle (finer-than-chunk cadence, more host
        round trips in a mixed hub — the burst-free direction).  Clamped to
        [1, chunk_frames]."""
        if not self._spec:
            return self.chunk_frames
        return max(1, min(self.chunk_frames,
                          round(self.chunk_frames / max(self._accept_ema, 1.0))))

    def _observe_acceptance(self, out: dict, turns: int) -> None:
        """Fold one advance cycle's observed per-row commit rate into the
        acceptance EMA.  Uses the MAX over rows (the burst-bounding choice —
        see _turns_for_cycle) and only rows that stayed live through the
        whole advance: a row that finished mid-cycle ran an unknown number of
        turns (the joint while_loop also exits early when all rows finish),
        so tokens/turns would understate its true acceptance and pin the EMA
        at the floor under short-utterance traffic."""
        if not self._spec or not out:
            return
        rates = [len(t) / turns for (_s, t, done) in out.values() if not done]
        if not rates:
            return
        self._accept_ema = 0.5 * self._accept_ema + 0.5 * max(rates)

    def _route_tokens(self, out: dict) -> None:
        """batched_nar=False: deliver raw tokens; handler threads refine."""
        with self._lock:
            for slot, (sess, toks, done) in out.items():
                if self._by_slot.get(slot) is not sess:
                    continue                # aborted between advance and here
                if sess.sink is not None and len(toks):
                    sess.sink.append(np.asarray(toks, np.int32))
                sess.done = done
                sess.q.put((toks, done))
                if done:
                    # Free the row now — the generator only consumes the
                    # queue from here on.  (Its _abort is a no-op after this.)
                    del self._by_slot[slot]
                    self._emitters.pop(slot, None)
                    self.cb.release(slot)
            if not self._by_slot:
                self._wake.notify_all()     # wake a drain waiter

    def _route_batched(self, out: dict) -> None:
        """Refine every due session's prefix in ONE joint NAR→wav dispatch,
        then deliver the newly finalized waveform slices.

        Three phases so the device round trip never holds the hub lock
        (open() and _abort() contend on it every request): (1) under the
        lock, fold tokens into session buffers and snapshot the dispatch
        inputs; (2) dispatch + host sync unlocked — session buffers are
        driver-thread-only, prompt tensors are immutable snapshots; (3)
        under the lock again, route slices with identity guards (a session
        aborted during the refine is simply skipped)."""
        import jax.numpy as jnp
        n = self.cb.n_slots
        emits: list[tuple[_Session, int, bool]] = []
        finish_only: list[_Session] = []
        with self._lock:
            for slot, (sess, toks, done) in out.items():
                if self._by_slot.get(slot) is not sess:
                    continue                # aborted between advance and here
                if sess.sink is not None and len(toks):
                    sess.sink.append(np.asarray(toks, np.int32))
                sess.buf[sess.n:sess.n + len(toks)] = toks
                sess.n += len(toks)
                finalize = finalize_frames(sess.n, done, sess.lookahead)
                if finalize > sess.emitted:
                    emits.append((sess, finalize, done))
                elif done:
                    finish_only.append(sess)
            nar_prompts = (self._nar_tokens, self._nar_tl,
                           self._nar_pcodes, self._nar_pl)

        wav = None
        if emits:
            width = next(b for b in self._widths
                         if b >= max(s.n for s, _, _ in emits))
            first = np.zeros((n, width), np.int32)
            gen = np.ones((n,), np.int32)       # dummy rows: 1 valid slot
            for sess, _, _ in emits:
                first[sess.slot, :sess.n] = sess.buf[:sess.n]
                gen[sess.slot] = sess.n
            self._nar_rng, r = jax.random.split(self._nar_rng)
            try:
                wav, _codes = self.tts._nar_wav_jit(
                    self.tts.nar.params, self.tts.codec.dec_params,
                    *nar_prompts, jnp.asarray(first), jnp.asarray(gen), r)
                wav = np.asarray(wav)
            except Exception as e:          # device failure: fail all sessions
                log_warning('stream hub batched refine failed (%s: %s) — '
                            'ending live sessions', type(e).__name__, e)
                with self._lock:
                    self._fail_all()
                return

        with self._lock:
            for sess, finalize, done in emits:
                if self._by_slot.get(sess.slot) is not sess:
                    continue                # aborted during the refine
                chunk = wav[sess.slot, sess.emitted * HOP:finalize * HOP]
                sess.emitted = finalize
                sess.done = done
                sess.q.put((chunk, done))
            for sess in finish_only:
                if self._by_slot.get(sess.slot) is not sess:
                    continue
                sess.done = True
                sess.q.put((None, True))
            for sess in finish_only + [s for s, _, d in emits if d]:
                if self._by_slot.get(sess.slot) is sess:
                    del self._by_slot[sess.slot]
                    self.cb.release(sess.slot)
            if not self._by_slot:
                self._wake.notify_all()     # wake a drain waiter

    def _abort(self, sess: _Session) -> None:
        """Generator closed (client gone or stream drained): free the row.
        Idempotent, and guarded against the slot having been re-assigned."""
        with self._lock:
            if self._by_slot.get(sess.slot) is sess:
                del self._by_slot[sess.slot]
                self._emitters.pop(sess.slot, None)
                self.cb.release(sess.slot)
            if not self._by_slot:
                self._wake.notify_all()     # wake a drain waiter
