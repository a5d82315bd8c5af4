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

Per-session semantics match ``ValleTTS.synthesize_streaming`` by
construction: the same ``_ChunkEmitter`` runs the lookahead/NAR-refine/emit
logic, so greedy (temperature=0) output waveforms are bit-identical to the
solo streaming path (tested, tests/test_stream_hub.py).  Sampled decodes
draw from the batcher's shared rng chain, so samples depend on join timing —
the standard dynamic-batching trade, documented in models/continuous.py.

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
from .utils import log_warning

__all__ = ['StreamHub', 'HubFull']

HubFull = BatcherFull       # serving-layer alias (maps to HTTP 429)


class _Session:
    __slots__ = ('slot', 'q', 'done')

    def __init__(self, slot: int):
        self.slot = slot
        self.q: queue.Queue = queue.Queue()
        self.done = False


class StreamHub:
    """Owns one ContinuousDecoder + the driver thread that advances it.

    ``open()`` joins a session and returns a waveform-chunk generator with
    ``synthesize_streaming`` semantics; raises ``HubFull`` when all rows are
    busy (serve.py maps it to 429).  ``chunk_frames`` is the hub-wide advance
    granularity — every live session receives tokens each chunk.  ``ttm``/
    ``pm`` bound the shared prompt geometry (see ContinuousDecoder; prompts
    that do not fit raise ValueError — route those to the solo path).
    """

    def __init__(self, tts, n_slots: int = 4, chunk_frames: int = 25,
                 ttm: int | None = None, pm: int | None = None):
        if int(chunk_frames) < 1:
            raise ValueError(f'chunk_frames must be >= 1, got {chunk_frames}')
        if tts.config.num_beams != 1:
            raise ValueError('streaming requires num_beams=1')
        tts._ensure_stream_models()
        self.tts = tts
        self.chunk_frames = int(chunk_frames)
        self.cb = ContinuousDecoder(tts._stream_ar, n_slots=n_slots,
                                    ttm=ttm, pm=pm)
        self._by_slot: dict[int, _Session] = {}
        self._lock = threading.Lock()
        self._wake = threading.Condition(self._lock)
        self._stopped = False
        self._driver = threading.Thread(target=self._drive, daemon=True,
                                        name='valle2-stream-hub')
        self._driver.start()

    # -- public ------------------------------------------------------------

    def open(self, text: str, prompt_tokens, prompt_codes,
             lookahead_frames: int = 38, rng=None,
             bucket: bool = True) -> Iterator[np.ndarray]:
        """Join the shared loop and return a generator of 24 kHz float32
        waveform chunks.  Validation, prefill and row insertion happen at
        CALL time (bad args / HubFull raise immediately, before any chunked
        HTTP response starts)."""
        if int(lookahead_frames) < 0:
            raise ValueError(
                f'lookahead_frames must be >= 0, got {lookahead_frames}')
        if self._stopped:
            raise RuntimeError('hub is stopped')
        if rng is None:
            rng = jax.random.key(self.tts.config.seed)
        import jax.numpy as jnp
        _rng_ar, rng_nar = jax.random.split(jnp.asarray(rng))

        from .tts import _ChunkEmitter
        tokens = np.concatenate([np.asarray(prompt_tokens, np.int32),
                                 self.tts.tokenizer(text)])
        pcodes = np.asarray(prompt_codes, np.int32).reshape(
            -1, self.tts.config.num_quantizers)
        emitter = _ChunkEmitter(self.tts, tokens, pcodes, lookahead_frames,
                                rng_nar, bucket=bucket)
        # join(start=False) keeps the row invisible to the driver's advance
        # until the session is registered in _by_slot — otherwise a concurrent
        # advance can read the previous occupant's finished device row as this
        # session's state (spurious instant done) or deliver tokens nobody is
        # routing yet (dropped chunks / lost done signal; caught by
        # tests/test_stream_hub.py::test_lifecycle_stress_staggered_cycles).
        slot = self.cb.join(tokens, pcodes, start=False)
        sess = _Session(slot)
        with self._wake:
            self._by_slot[slot] = sess
            self._wake.notify()
        self.cb.activate(slot)

        def chunks():
            try:
                while True:
                    # The driver feeds every live session each advance; a long
                    # silence means the driver died — fail the stream rather
                    # than hang the handler thread forever.
                    try:
                        toks, done = sess.q.get(timeout=600.0)
                    except queue.Empty:
                        raise RuntimeError('stream hub driver stalled '
                                           '(no tokens for 600 s)') from None
                    for wav in emitter.push(toks, done):
                        yield wav
                    if done:
                        return
            finally:
                self._abort(sess)

        return chunks()

    def live_sessions(self) -> int:
        with self._lock:
            return len(self._by_slot)

    def stop(self) -> None:
        """Stop the driver thread; live sessions end with their next chunk."""
        with self._wake:
            self._stopped = True
            self._wake.notify()
        self._driver.join(timeout=30)

    # -- internals ---------------------------------------------------------

    def _abort(self, sess: _Session) -> None:
        """Generator closed (client gone or stream drained): free the row.
        Idempotent, and guarded against the slot having been re-assigned."""
        with self._lock:
            if self._by_slot.get(sess.slot) is sess:
                del self._by_slot[sess.slot]
                self.cb.release(sess.slot)

    def _drive(self) -> None:
        while True:
            with self._wake:
                while not self._by_slot and not self._stopped:
                    self._wake.wait()
                if self._stopped:
                    for sess in self._by_slot.values():
                        sess.done = True
                        sess.q.put((np.zeros(0, np.int32), True))
                    self._by_slot.clear()
                    return
            try:
                out = self.cb.advance(self.chunk_frames)
            except Exception as e:          # device failure: fail all sessions
                log_warning('stream hub advance failed (%s: %s) — ending '
                            'live sessions', type(e).__name__, e)
                with self._lock:
                    for sess in self._by_slot.values():
                        sess.done = True
                        sess.q.put((np.zeros(0, np.int32), True))
                    self._by_slot.clear()
                continue
            with self._lock:
                for slot, toks in out.items():
                    sess = self._by_slot.get(slot)
                    if sess is None:        # aborted between advance and here
                        continue
                    done = self.cb.finished(slot)
                    sess.done = done
                    sess.q.put((toks, done))
                    if done:
                        # Free the row now — the generator only consumes the
                        # queue from here on.  (Its _abort is a no-op after
                        # this del.)
                        del self._by_slot[slot]
                        self.cb.release(slot)
