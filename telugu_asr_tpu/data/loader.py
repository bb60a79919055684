"""Background-prefetching loader: overlap host I/O with device compute.

Replaces the reference's ``tf.data`` AUTOTUNE pipeline + prefetch
(moonshine/dataset.py:216-241) with a thread that stays ``num_prefetch``
batches ahead of the training loop (audio decode and padding happen off the
critical path; the device step consumes ready NumPy arrays).  A C++ decode
backend can be swapped into ``ASRDataset._load_audio`` without touching this.
"""
from __future__ import annotations

import queue
import threading
from typing import Iterator, Optional

__all__ = ["PrefetchLoader"]

_SENTINEL = object()


class PrefetchLoader:
    def __init__(self, iterator: Iterator, num_prefetch: int = 2,
                 transform: Optional[callable] = None):
        """``transform`` runs in the worker thread on each item before it is
        queued — pass the pad/shard/``jax.device_put`` closure here so the
        host→device upload of batch N+1 overlaps the device's step N instead
        of serializing inside the training loop (on a tunnelled TPU the
        upload, not the step, is the critical path)."""
        self._source = iterator
        self._transform = transform
        self._queue: queue.Queue = queue.Queue(maxsize=max(num_prefetch, 1))
        self._error: Optional[BaseException] = None
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    def _worker(self):
        try:
            for item in self._source:
                if self._stop.is_set():
                    return
                if self._transform is not None:
                    item = self._transform(item)
                self._queue.put(item)
        except BaseException as exc:  # surfaced on the consumer side
            self._error = exc
        finally:
            self._queue.put(_SENTINEL)

    def __iter__(self):
        return self

    def __next__(self):
        item = self._queue.get()
        if item is _SENTINEL:
            if self._error is not None:
                raise self._error
            raise StopIteration
        return item

    def close(self):
        self._stop.set()
        # Drain so the worker unblocks if it is waiting on a full queue.
        try:
            while True:
                self._queue.get_nowait()
        except queue.Empty:
            pass
