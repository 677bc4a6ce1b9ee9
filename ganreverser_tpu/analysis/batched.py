"""Batched device-side model application — NN_UTILS.forwardBatched
(nn_utils.lua:5-33) rebuilt for TPU.

The reference chunks on the host, round-tripping every batch through the
nn.Copy device shim. Here the whole N-array stays in HBM and the chunk loop
is a ``lax.map`` inside one jitted program; N is padded to a full multiple so
shapes stay static.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def forward_batched(apply_fn: Callable, x: jax.Array,
                    batch_size: int) -> jax.Array:
    """Apply ``apply_fn`` (batch -> batch) over x in device-side chunks.

    apply_fn must be shape-polymorphic only in the leading axis values, not
    the axis size (it sees (batch_size, ...) blocks).
    """
    n = x.shape[0]
    if n <= batch_size:
        return apply_fn(x)
    n_chunks = -(-n // batch_size)
    pad = n_chunks * batch_size - n
    if pad:
        x = jnp.concatenate([x, jnp.tile(x[-1:], (pad,) + (1,) * (x.ndim - 1))])
    chunks = x.reshape((n_chunks, batch_size) + x.shape[1:])
    out = jax.lax.map(apply_fn, chunks)
    # apply_fn may return a pytree (e.g. the fused e2e scan emitting both
    # embeddings and flattened pixels per chunk) — unchunk every leaf
    return jax.tree_util.tree_map(
        lambda o: o.reshape((n_chunks * batch_size,) + o.shape[2:])[:n], out)
