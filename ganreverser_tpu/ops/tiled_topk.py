"""Two-pass tiled top-k — the wide-D pixel-similarity selection candidate.

The pixel-similarity search (apply_r.lua:307-314: cosine over flattened
64x64x3 pixels, D=12288) is the one shape where selection can rival the
scoring matmul: ``lax.top_k`` over a (Q, 10240) score row implies a full
per-row sort. This is the classic exact reduction:

  pass 1: split N into tiles, top-k WITHIN each tile     (N log tile)
  pass 2: top-k over the T*k surviving candidates        (Tk log Tk)

The global top-k is a subset of the union of per-tile top-ks, so the
result is exact (same argument as parallel/comm.py's sharded_topk_merge —
this is the single-chip analogue of that cross-chip trick).

MEASURED VERDICT (v5e, round 3 — benchmarks/logs/tpu_r03_pixel_topk.log):
XLA wins; NOT adopted. At the flagship shape (N=10240, D=12288, q=256,
k=100) the full lax path runs 9.8 ms of which scoring alone is 7.9 ms —
lax.top_k lowers to an optimized partial-sort on TPU, costing only ~2 ms
(20%), so the theoretical selection win was <=1.25x to begin with; the
two-pass ran 12.1-13.2 ms (0.75-0.81x) across tiles 512/1024/2048 because
the extra pass over the (q, N) score matrix costs more than the sort it
saves. This closes the last plausibly-kernel-winnable shape (VERDICT r2
item 8): production keeps analysis/similarity.py's lax path. Kept as a
parity-tested building block (tests/test_ops.py).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnums=(1, 2))
def tiled_topk(scores: jax.Array, k: int, tile: int = 2048):
    """Exact top-k along the last axis of (Q, N) via the two-pass scheme.

    N is padded up to a tile multiple with -inf (never selected while
    k <= N). Returns (values, indices) sorted descending like lax.top_k.
    """
    q, n = scores.shape
    assert k <= n, (k, n)
    tile = min(tile, n)
    pad = (-n) % tile
    if pad:
        scores = jnp.concatenate(
            [scores, jnp.full((q, pad), -jnp.inf, scores.dtype)], axis=1)
    t = (n + pad) // tile
    kk = min(k, tile)
    v, i = jax.lax.top_k(scores.reshape(q, t, tile), kk)   # (q, t, kk)
    i = i + (jnp.arange(t, dtype=i.dtype) * tile)[None, :, None]
    fv, fi = jax.lax.top_k(v.reshape(q, t * kk), k)
    return fv, jnp.take_along_axis(i.reshape(q, t * kk), fi, axis=1)


def pixel_cosine_topk_tiled(images: jax.Array, needle_idx: jax.Array,
                            k: int, tile: int = 2048):
    """apply_r.lua:307-314's pixel-space search with two-pass selection:
    normalize+score stays the one-matmul lax path (the Pallas scoring
    kernel's 128-row floor is marginal at D=12288 — RESULTS.md), the
    selection swaps the full sort for tiled_topk."""
    from ..analysis.similarity import cosine_scores
    flat = images.reshape(images.shape[0], -1)
    return tiled_topk(cosine_scores(flat, needle_idx), k, tile)
