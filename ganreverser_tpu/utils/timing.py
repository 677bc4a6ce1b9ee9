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


def time_amortized(fn, *args, iters: int = 20, repeats: int = 3) -> float:
    """Per-call time of ``fn(*args)`` amortized over ``iters`` in-program
    runs — the only honest way to time sub-RTT ops over the axon tunnel
    (~28 ms dispatch latency swamps single-dispatch timings).

    The first (inexact-dtype) argument is perturbed by ``i * eps`` with a
    RUNTIME zero ``eps``, so XLA cannot hoist the call out of the loop or
    CSE the iterations, while the computed values are bit-identical.
    """
    import jax.numpy as jnp
    from jax import lax

    @jax.jit
    def loop(eps, *a):
        def perturb(t, i):
            if hasattr(t, "dtype") and jnp.issubdtype(t.dtype, jnp.inexact):
                return t + eps.astype(t.dtype) * i.astype(t.dtype)
            return t

        def body(i, acc):
            first = jax.tree_util.tree_map(lambda t: perturb(t, i), a[0])
            out = fn(first, *a[1:])
            leaf = jax.tree_util.tree_leaves(out)[0]
            return acc + leaf[(0,) * leaf.ndim].astype(jnp.float32)

        return lax.fori_loop(0, iters, body, jnp.float32(0.0))

    eps = jnp.float32(0.0)
    return time_best(loop, eps, *args, repeats=repeats) / iters
