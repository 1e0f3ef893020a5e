"""Background-prefetching batch loader.

Replaces torch DataLoader worker pools (reference train_retriever.py:186,
num_workers=8) with a thread that tokenizes/collates ahead of the device:
host work overlaps TPU steps, batches are handed over as numpy (device_put
happens inside the jitted step via donated buffers).
"""
from __future__ import annotations

import queue
import threading
from typing import Iterable, Iterator

_SENTINEL = object()


class BatchLoader:
    def __init__(self, batch_iter: Iterable, prefetch: int = 4):
        self._iter = batch_iter
        self._q: queue.Queue = queue.Queue(maxsize=prefetch)
        self._err: BaseException | None = None
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def _run(self):
        try:
            for item in self._iter:
                self._q.put(item)
        except BaseException as e:  # surfaced on the consumer side
            self._err = e
        finally:
            self._q.put(_SENTINEL)

    def __iter__(self) -> Iterator:
        while True:
            item = self._q.get()
            if item is _SENTINEL:
                if self._err is not None:
                    raise self._err
                return
            yield item
