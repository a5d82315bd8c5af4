"""Background-thread device prefetcher (data/prefetch.py): ordering,
drop-filtering, epoch re-iteration, break safety, error propagation."""

import threading
import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from valle2_tpu.data.prefetch import DevicePrefetcher


def make_loader(n, base=0):
    return [{'x': np.full((2, 3), i + base, np.int32)} for i in range(n)]


def place(batch):
    return jax.tree.map(jnp.asarray, batch)


class TestDevicePrefetcher:
    def test_preserves_order_and_contents(self):
        loader = make_loader(7)
        got = list(DevicePrefetcher(loader, size=3, place=place))
        assert len(got) == 7
        for i, b in enumerate(got):
            assert isinstance(b['x'], jax.Array)
            np.testing.assert_array_equal(np.asarray(b['x']), loader[i]['x'])

    def test_place_none_drops_batch(self):
        loader = make_loader(6)
        drop_odd = lambda b: None if int(b['x'][0, 0]) % 2 else place(b)
        got = list(DevicePrefetcher(loader, size=2, place=drop_odd))
        assert [int(b['x'][0, 0]) for b in got] == [0, 2, 4]

    def test_reiterable_per_epoch(self):
        pf = DevicePrefetcher(make_loader(4), size=2, place=place)
        a = [int(b['x'][0, 0]) for b in pf]
        b = [int(b['x'][0, 0]) for b in pf]
        assert a == b == [0, 1, 2, 3]

    def test_break_stops_producer(self):
        """Abandoning the iterator mid-pass must unblock the producer thread
        (small queue, long loader) rather than leak it."""
        n_before = threading.active_count()
        pf = DevicePrefetcher(make_loader(1000), size=1, place=place)
        for i, _ in enumerate(pf):
            if i == 2:
                break
        deadline = time.time() + 5.0
        while threading.active_count() > n_before and time.time() < deadline:
            time.sleep(0.01)
        assert threading.active_count() <= n_before

    def test_loader_exception_reraises_in_consumer(self):
        def bad_loader():
            yield {'x': np.zeros((1,), np.int32)}
            raise RuntimeError('boom')
        pf = DevicePrefetcher(bad_loader(), size=2, place=place)
        it = iter(pf)
        next(it)
        with pytest.raises(RuntimeError, match='boom'):
            next(it)

    def test_producer_runs_ahead(self):
        """With a fast consumer stall, the producer stages `size` batches."""
        consumed = []

        def slow_loader():
            for i in range(5):
                consumed.append(i)
                yield {'x': np.full((1,), i, np.int32)}

        pf = DevicePrefetcher(slow_loader(), size=3, place=place)
        it = iter(pf)
        first = next(it)
        deadline = time.time() + 5.0
        # Producer should pull ahead without further consumption: the queue
        # holds 3 and one more is blocked on put → >= 4 loader pulls.
        while len(consumed) < 4 and time.time() < deadline:
            time.sleep(0.01)
        assert len(consumed) >= 4
        rest = [int(b['x'][0]) for b in it]
        assert [int(first['x'][0])] + rest == [0, 1, 2, 3, 4]
