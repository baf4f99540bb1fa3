"""Prefetching data pipeline.

Reference: `BasePrefetchingDataLayer` — a background `InternalThread` filling a
free/full `BlockingQueue<Batch*>` pair for double buffering
(`include/caffe/layers/base_data_layer.hpp:52-78`,
`src/caffe/util/blocking_queue.cpp`). Here: a daemon thread per loader running
the (numpy) sample source + transformer, a bounded queue of ready batches, and
async device transfer via `jax.device_put` so host->HBM copy overlaps compute.

The native C++ record reader (csrc/) plugs in as a `source` callable; the
Python synthetic sources serve tests/benchmarks.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Dict, Iterator, Optional

import jax
import numpy as np


class PrefetchLoader:
    """Background-thread prefetching iterator over batches.

    ``source()`` -> dict of numpy arrays (one batch). ``transform`` is applied
    on the loader thread (crop/mirror/mean — CPU work off the main thread,
    like DataTransformer running inside the prefetch thread).
    """

    PREFETCH_COUNT = 4  # reference uses 4 per data layer (base_data_layer.hpp)

    def __init__(self, source: Callable[[], Dict[str, np.ndarray]],
                 *, transform: Optional[Callable] = None,
                 prefetch: int = PREFETCH_COUNT, device_put: bool = True):
        self._source = source
        self._transform = transform
        self._queue: "queue.Queue" = queue.Queue(maxsize=prefetch)
        self._stop = threading.Event()
        self._device_put = device_put
        self._error = None
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    def _worker(self):
        try:
            while not self._stop.is_set():
                batch = self._source()
                if self._transform is not None:
                    batch = self._transform(batch)
                if self._device_put:
                    batch = {k: jax.device_put(v) for k, v in batch.items()}
                while not self._stop.is_set():
                    try:
                        self._queue.put(batch, timeout=0.1)
                        break
                    except queue.Full:
                        continue
        except Exception as e:  # surfaced on next __next__
            self._error = e

    def __iter__(self) -> Iterator[Dict]:
        return self

    def __next__(self) -> Dict:
        while True:
            if self._error is not None:
                raise self._error
            try:
                return self._queue.get(timeout=1.0)
            except queue.Empty:
                if not self._thread.is_alive() and self._error is None:
                    raise StopIteration
                continue

    def close(self):
        self._stop.set()
        self._thread.join(timeout=2.0)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
