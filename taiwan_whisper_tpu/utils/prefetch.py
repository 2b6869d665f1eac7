"""Background-thread batch prefetcher.

The reference feeds its trainer through HF streaming datasets + a torchdata
prefetching DataLoader (flax/run_distillation.py:556-612). Here a single
daemon thread keeps a small queue of host batches warm so FLAC decode +
tokenisation overlap with device steps (the host has few cores; one thread
of lookahead is usually enough to hide IO behind a TPU train step).
"""

from __future__ import annotations

import queue
import threading
from typing import Iterable, Iterator, TypeVar

T = TypeVar("T")

_STOP = object()


def prefetch(iterable: Iterable[T], buffer_size: int = 2) -> Iterator[T]:
    """Iterate `iterable` on a background thread with a bounded buffer."""
    q: "queue.Queue" = queue.Queue(maxsize=buffer_size)
    err: list = []

    def worker():
        try:
            for item in iterable:
                q.put(item)
        except BaseException as e:  # propagate into the consumer
            err.append(e)
        finally:
            q.put(_STOP)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _STOP:
            if err:
                raise err[0]
            return
        yield item
