"""Background batch prefetching.

The reference overlaps host decode with device compute through torch
DataLoader worker processes (``datasets/class_cond_dataloader.py``,
``wds_dataloaders.py`` num_workers). Here a single daemon thread fills a
bounded queue: the GIL is released during TPU execution and numpy/PIL decode,
so one thread is enough to hide tar/image decode behind the training step on
this machine's host budget.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterable, Iterator


class _End:
    pass


def prefetch_iter(iterable: Iterable, prefetch: int = 2) -> Iterator:
    """Iterate ``iterable`` on a daemon thread, ``prefetch`` items ahead.
    Worker exceptions re-raise in the consumer; ``prefetch<=0`` is a no-op."""
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
