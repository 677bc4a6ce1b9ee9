"""Host -> device prefetching input pipeline.

The reference's data path is synchronous per-image JPEG decode inside the
training loop (dataset.lua:148-151, train.lua:214-216, a hot host loop,
SURVEY.md §3.1). Here, a background thread decodes the *next* epoch's batch
while the device trains on the current one, and ``jax.device_put`` overlaps
the transfer — the TPU never waits on the host for synthetic pipelines and
rarely for disk ones.
"""
from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator, Optional

import jax


def prefetch_to_device(batch_fn: Callable[[int], object], n_batches: int,
                       *, sharding=None, depth: int = 2) -> Iterator:
    """Yield ``n_batches`` device arrays, producing ``batch_fn(i)`` on a
    background thread ``depth`` steps ahead. ``n_batches < 0`` = infinite.

    ``sharding``: optional jax.sharding.Sharding for device placement
    (e.g. batch sharded over the 'data' mesh axis).
    """
    q: queue.Queue = queue.Queue(maxsize=depth)
    stop = threading.Event()

    def worker():
        i = 0
        while not stop.is_set() and (n_batches < 0 or i < n_batches):
            host = batch_fn(i)
            dev = jax.device_put(host, sharding)
            q.put(dev)
            i += 1
        q.put(None)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is None:
                break
            yield item
    finally:
        stop.set()
        # drain so the worker can exit
        while not q.empty():
            q.get_nowait()
