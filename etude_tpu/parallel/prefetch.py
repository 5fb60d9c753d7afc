"""Asynchronous host→device input pipeline.

The reference feeds training with synchronous DataLoader workers
(train.py:70-74); here a background thread assembles numpy batches and
device_puts them (sharded over the mesh) ahead of consumption, so host
batch-building and H2D transfer overlap the previous step's device compute —
the double-buffered loader pattern from BASELINE.json's north star.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Dict, Iterator, Optional

import jax
import numpy as np

from ..utils.logger import logger


class DevicePrefetcher:
    """Wrap a host batch iterator; yields device-resident (sharded) batches.

    buffer_size=2 gives classic double buffering: while the consumer runs
    step t, batch t+1 is already on device and t+2 is being built on host.
    """

    def __init__(
        self,
        batch_iter: Iterator[Dict[str, np.ndarray]],
        place: Optional[Callable] = None,
        buffer_size: int = 2,
    ):
        self._iter = batch_iter
        self._place = place or (lambda b: jax.tree.map(jax.device_put, b))
        self._queue: queue.Queue = queue.Queue(maxsize=buffer_size)
        self._done = object()
        self._error: Optional[BaseException] = None
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    def _worker(self):
        try:
            for batch in self._iter:
                self._queue.put(self._place(batch))
        except BaseException as exc:  # propagated to the consumer
            self._error = exc
        finally:
            self._queue.put(self._done)

    def __iter__(self):
        return self

    def __next__(self):
        item = self._queue.get()
        if item is self._done:
            if self._error is not None:
                raise self._error
            raise StopIteration
        return item


def prefetch_to_mesh(batch_iter, mesh, accum_steps: int, data_axis: str = "data"):
    """Prefetcher that reshapes [B, T] host batches into [accum, B/accum, T]
    and places them with the train step's expected sharding.

    Multi-host: each process's iterator yields its PROCESS-LOCAL rows
    (global_batch / process_count); the global sharded Array is assembled
    without cross-host data movement (parallel.mesh.make_global_batch)."""
    from .mesh import make_global_batch
    from .train_step import reshape_for_accum

    def place(batch):
        batch = reshape_for_accum(batch, accum_steps)
        n_proc = jax.process_count()
        if n_proc > 1:
            # Every process iterates the dataset in the same (seeded) order;
            # each keeps only its slice of the micro-batch rows.
            pid = jax.process_index()
            per = next(iter(batch.values())).shape[1] // n_proc
            batch = {k: v[:, pid * per:(pid + 1) * per] for k, v in batch.items()}
        return make_global_batch(batch, mesh, data_axis, accum=True)

    return DevicePrefetcher(batch_iter, place=place)
