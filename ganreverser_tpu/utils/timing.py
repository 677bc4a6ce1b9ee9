"""Benchmark timing helpers, shared by bench.py / benchmarks/*.

These encode the axon-tunnel synchronization subtleties in ONE place:
``jax.block_until_ready`` does NOT cover pending compilation over the
tunnel — only a real device->host fetch synchronizes — so every warm-up
ends with a scalar fetch; and big-array fetches are never done (the tunnel
moves ~1MB/s).
"""
from __future__ import annotations

import time

import jax
import numpy as np


def force(x):
    """Synchronize via a real host fetch of one on-device-indexed scalar."""
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(jax.device_get(leaf[(0,) * leaf.ndim]))


def time_best(fn, *args, repeats: int = 5) -> float:
    """Best-of-N wall time of ``fn(*args)``, fetch-synchronized warm-up."""
    force(fn(*args))  # warmup: compile + first run
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    force(out)  # drain the queue before the next section
    return best
