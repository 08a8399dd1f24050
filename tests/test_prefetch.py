"""Prefetcher / prefetch_iter unit tests (fastgen_tpu/data/prefetch.py)."""

import time

import pytest

from fastgen_tpu.data.prefetch import Prefetcher, prefetch_iter


def test_prefetcher_order_and_end():
    p = Prefetcher(iter(range(10)), depth=3)
    got = []
    with pytest.raises(StopIteration):
        while True:
            got.append(p.get())
    assert got == list(range(10))
    p.stop()


def test_prefetcher_reraises_producer_exception():
    def gen():
        yield 1
        raise ValueError("decode failed")

    p = Prefetcher(gen(), depth=2)
    assert p.get() == 1
    with pytest.raises(ValueError, match="decode failed"):
        p.get()
    p.stop()


def test_prefetcher_stop_unblocks_producer():
    def gen():
        for i in range(10_000):
            yield i

    p = Prefetcher(gen(), depth=1)
    assert p.get() == 0
    t0 = time.perf_counter()
    p.stop()  # producer is blocked on a full queue; must join promptly
    assert time.perf_counter() - t0 < 5.0
    assert not p._thread.is_alive()


def test_prefetch_iter_matches_sequential():
    assert list(prefetch_iter(range(7), prefetch=2)) == list(range(7))
    assert list(prefetch_iter(range(7), prefetch=0)) == list(range(7))


def test_prefetch_iter_reraises():
    def gen():
        yield 1
        raise RuntimeError("boom")

    it = prefetch_iter(gen(), prefetch=2)
    assert next(it) == 1
    with pytest.raises(RuntimeError, match="boom"):
        next(it)
