"""Background-thread device prefetch for the training input pipeline.

The reference hides its input cost in DataLoader worker processes but still
runs EnCodec encode per item on CPU inside them — its real input bottleneck
(SURVEY §3.1, /root/reference/valle/data.py:30-43).  Here the device work is
dispatched asynchronously by JAX, so the remaining serialization is host-side:
dataset iteration + collate + the host→device transfer all happen on the train
loop's thread, between steps.  ``DevicePrefetcher`` moves that work to a
background thread that stays ``size`` batches ahead, so the accelerator never
waits on the host as long as host time/batch < device time/batch.

Works for any placement: pass ``place`` mapping a host batch to device arrays
(``jax.tree.map(jnp.asarray, ...)`` single-device, ``parallel.shard_batch``
on a mesh — device_put is thread-safe in JAX).  ``place`` may return None to
drop a batch (e.g. a trailing partial batch that cannot shard over the data
axis); dropped batches never reach the consumer.
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Callable, Iterable

_SENTINEL = object()


class DevicePrefetcher:
    """Iterate ``loader`` on a background thread, ``size`` placed batches ahead.

    Re-iterable: each ``iter()`` starts a fresh pass (and thread) over the
    underlying loader — matches epoch-style ``for batch in loader`` usage.
    If the loader raises, the exception is re-raised in the consumer.
    Break-safe: abandoning the iterator mid-pass unblocks and stops the
    producer thread (no leaked threads across epochs).
    """

    def __init__(self, loader: Iterable, size: int = 2,
                 place: Callable[[Any], Any] | None = None):
        assert size >= 1
        self.loader = loader
        self.size = size
        self.place = place

    def __iter__(self):
        q: queue.Queue = queue.Queue(self.size)
        stop = threading.Event()

        def put_stoppable(item) -> bool:
            """Blocking put that gives up when the consumer abandoned the pass —
            EVERY producer put must go through this (a bare q.put on the final
            sentinel would block forever on a full queue after a late break,
            leaking the thread and its queued device batches)."""
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            try:
                for batch in self.loader:
                    if self.place is not None:
                        batch = self.place(batch)
                        if batch is None:
                            continue
                    if not put_stoppable((batch, None)):
                        return
            except BaseException as exc:  # noqa: BLE001 — re-raise in consumer
                put_stoppable((None, exc))
                return
            put_stoppable((_SENTINEL, None))

        thread = threading.Thread(target=producer, daemon=True,
                                  name='valle-prefetch')
        thread.start()
        try:
            while True:
                item, exc = q.get()
                if exc is not None:
                    raise exc
                if item is _SENTINEL:
                    return
                yield item
        finally:
            stop.set()          # unblock + stop the producer on break/close
