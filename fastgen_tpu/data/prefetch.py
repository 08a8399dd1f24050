"""Background batch prefetcher for the training loop.

The reference hides its input pipeline inside torch DataLoader workers
(``fastgen/datasets/class_cond_dataloader.py:10-49``); here the fetch →
preprocess → H2D chain runs in one producer thread a fixed number of batches
ahead of the step loop, so loader decode (native C++, GIL-free), augment, and
the device_put through the TPU tunnel all overlap device compute instead of
sitting serially between steps. Ordering — and therefore RNG/resume
determinism — is exactly the sequential loop's: the producer consumes the
same generator the loop would have.
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Iterator

_DONE = object()


class _End:
    pass


def prefetch_iter(iterable, prefetch: int = 2):
    """Iterate ``iterable`` on a daemon thread, ``prefetch`` items ahead
    (the WDS loaders' decode-overlap path). Worker exceptions re-raise in
    the consumer; ``prefetch<=0`` is a no-op. Unlike ``Prefetcher`` this has
    no stop() — use it for streams that are consumed to exhaustion."""
    if prefetch <= 0:
        yield from iterable
        return

    q: "queue.Queue" = queue.Queue(maxsize=prefetch)

    def producer():
        try:
            for item in iterable:
                q.put(item)
            q.put(_End)
        except BaseException as e:  # surface worker errors to the consumer
            q.put(e)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _End:
            return
        if isinstance(item, BaseException):
            raise item
        yield item


class _Raised:
    def __init__(self, exc: BaseException):
        self.exc = exc


class Prefetcher:
    """Pull items from ``gen`` in a daemon thread, ``depth`` ahead.

    ``get()`` returns items in order, re-raising any producer exception at
    the consumption point (so loader errors surface on the main thread with
    the iteration that would have consumed them). ``stop()`` ends the
    producer promptly (it never blocks forever on a full queue).
    """

    def __init__(self, gen: Iterator[Any], depth: int = 2):
        self._q: "queue.Queue[Any]" = queue.Queue(maxsize=max(1, depth))
        self._stop = threading.Event()
        self._thread = threading.Thread(
            target=self._run, args=(gen,), daemon=True, name="fg-prefetch")
        self._thread.start()

    def _run(self, gen):
        try:
            for item in gen:
                while not self._stop.is_set():
                    try:
                        self._q.put(item, timeout=0.25)
                        break
                    except queue.Full:
                        continue
                if self._stop.is_set():
                    return
            self._put(_DONE)
        except BaseException as e:  # noqa: BLE001 - re-raised on the consumer
            self._put(_Raised(e))

    def _put(self, item):
        while not self._stop.is_set():
            try:
                self._q.put(item, timeout=0.25)
                return
            except queue.Full:
                continue

    def get(self):
        """Next item; raises StopIteration at end-of-stream."""
        item = self._q.get()
        if item is _DONE:
            raise StopIteration
        if isinstance(item, _Raised):
            raise item.exc
        return item

    def stop(self):
        self._stop.set()
        self._thread.join(timeout=5.0)
