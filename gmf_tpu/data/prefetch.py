"""Background-thread batch prefetch for training/eval input pipelines.

The reference feeds its trainers from multi-worker torch DataLoaders
(GMF_PointDSC/train_3dmatch.py num_workers=16); the JAX loop equivalent
is a bounded producer thread: host-side batch construction (sampling,
matching, collation — NumPy releases the GIL) overlaps the previous
step's device execution.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterable, Iterator, TypeVar

T = TypeVar("T")

_END = object()


def prefetch_iter(iterable: Iterable[T], depth: int = 2) -> Iterator[T]:
    """Iterate ``iterable`` on a daemon thread, ``depth`` items ahead.

    Order-preserving; exceptions from the producer re-raise at the
    consumer. ``depth <= 0`` returns the iterable unchanged.
    """
    if depth <= 0:
        yield from iterable
        return

    q: "queue.Queue" = queue.Queue(maxsize=depth)
    err = []

    def worker():
        try:
            for item in iterable:
                q.put(item)
        except BaseException as e:  # propagate to the consumer
            err.append(e)
        finally:
            q.put(_END)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _END:
            if err:
                raise err[0]
            return
        yield item
