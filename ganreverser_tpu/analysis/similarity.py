"""Cosine-similarity search — apply_r.lua:265-318, on-device.

The reference instantiates an nn.CosineDistance module *per pair* and loops
needles x 10k on the host (apply_r.lua:270-276, 396-400). Here: one
normalize, one matmul on the MXU, one top-k — the whole search for all
needles is a single fused XLA program over HBM-resident embeddings
(BASELINE.json north-star item). A Pallas-fused variant lives in
ops/topk_kernel.py; this is the lax reference implementation.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# torch nn.CosineDistance guards the denominator with 1e-8
_EPS = 1e-8


def normalize_rows(x: jax.Array) -> jax.Array:
    x = x.astype(jnp.float32)
    norm = jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True))
    return x / jnp.maximum(norm, _EPS)


def cosine_scores(embeddings: jax.Array, needle_idx: jax.Array) -> jax.Array:
    """(needles, N) cosine similarity of each needle against every row."""
    normed = normalize_rows(embeddings)
    needles = jnp.take(normed, needle_idx, axis=0)
    return jnp.dot(needles, normed.T, preferred_element_type=jnp.float32)


def _select_topk(scores: jax.Array, k: int, approx: bool,
                 recall_target: float):
    """Exact lax.top_k, or TPU's dedicated approximate k-selection op
    (jax.lax.approx_max_k — hardware-lowered partial reduction with a
    recall guarantee, the op XLA grew precisely because full sorts are
    the expensive part of TPU retrieval). aggregate_to_topk is left True,
    so the returned k are exactly ranked within the candidate set and the
    output contract (descending scores + indices) is unchanged."""
    if approx:
        # barrier: without it, fusing an upstream NHWC->flat reshape into
        # the score producer makes the TPU backend fail with "Wasn't able
        # to find a valid iteration window for ApproxTopK" (probed live on
        # v5e, round 3 — the pixel-similarity chain; plain 2D inputs
        # compile fine). The op is a custom call and never fuses with its
        # producer anyway, so the barrier costs nothing.
        scores = jax.lax.optimization_barrier(scores)
        return jax.lax.approx_max_k(scores, k, recall_target=recall_target)
    return jax.lax.top_k(scores, k)


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def cosine_topk(embeddings: jax.Array, needle_idx: jax.Array,
                k: int, approx: bool = False, recall_target: float = 0.95):
    """Top-k most-similar rows per needle.

    Returns (scores (needles, k), indices (needles, k)), sorted descending —
    matching the reference's full descending sort truncated to nbShowMax
    (apply_r.lua:275-278). ``approx=True`` swaps in the TPU-native
    approximate selection (recall >= ``recall_target`` per row, measured
    on hardware in benchmarks/tpu_kernel_check.py approx_topk); the exact
    path stays the default because the reference's rankings are exact.
    """
    scores = cosine_scores(embeddings, needle_idx)
    return _select_topk(scores, k, approx, recall_target)


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def pixel_cosine_topk(images: jax.Array, needle_idx: jax.Array, k: int,
                      approx: bool = False, recall_target: float = 0.95):
    """The reference's second measure: cosine over flattened pixels
    (apply_r.lua:307-314). ``approx`` as in cosine_topk (the NHWC->flat
    reshape feeding approx_max_k is exactly the chain that needs
    _select_topk's optimization_barrier)."""
    flat = images.reshape(images.shape[0], -1)
    return cosine_topk(flat, needle_idx, k, approx, recall_target)


def topk_recall(exact_idx, test_idx) -> float:
    """Mean per-needle recall of ``test_idx`` against ``exact_idx``
    (both (needles, k) index arrays): |exact ∩ test| / k, averaged.

    The accuracy guard for the --approx path — the reference's rankings
    are exact (apply_r.lua:275), so any approximate mode ships with its
    recall measured against the exact result (tests/test_analysis.py pins
    it on the CPU backend; benchmarks/tpu_kernel_check.py measures the
    real hardware figure, 0.986 at recall_target=0.95 on the flagship
    shape, RESULTS.md round 3)."""
    import numpy as np
    exact_idx = np.asarray(exact_idx)
    test_idx = np.asarray(test_idx)
    hits = 0
    for row_exact, row_test in zip(exact_idx, test_idx):
        hits += len(np.intersect1d(row_exact, row_test))
    return hits / exact_idx.size


# module-level jitted query programs: shared across SimilarityIndex
# instances, so rebuilding the index (corpus refresh) never recompiles
_normalize_jit = jax.jit(normalize_rows)


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def _index_query(normed, queries, k, approx=False, recall_target=0.95):
    qn = normalize_rows(queries)
    scores = jnp.dot(qn, normed.T, preferred_element_type=jnp.float32)
    return _select_topk(scores, k, approx, recall_target)


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def _index_query_by_idx(normed, idx, k, approx=False, recall_target=0.95):
    qn = jnp.take(normed, idx, axis=0)  # rows already normalized
    scores = jnp.dot(qn, normed.T, preferred_element_type=jnp.float32)
    return _select_topk(scores, k, approx, recall_target)


class SimilarityIndex:
    """Serving-oriented cosine search: normalize the corpus ONCE, keep it
    HBM-resident, answer top-k queries with a single matmul+top_k program.

    ``cosine_topk`` renormalizes the whole corpus per call — right for the
    one-shot apply_r pipeline, wasteful for repeated queries. This is the
    production-QPS path behind the BASELINE.json 'top-k search QPS over 10k
    embeddings' metric.
    """

    def __init__(self, embeddings: jax.Array):
        self._normed = _normalize_jit(embeddings)

    @property
    def size(self) -> int:
        return self._normed.shape[0]

    def topk(self, queries: jax.Array, k: int, *, approx: bool = False,
             recall_target: float = 0.95):
        """(Q, D) query vectors -> (scores (Q, k), indices (Q, k)).
        ``approx=True``: TPU-native approximate selection (serving-scale
        option; recall measured in benchmarks)."""
        return _index_query(self._normed, queries, k, approx, recall_target)

    def topk_by_index(self, needle_idx: jax.Array, k: int, *,
                      approx: bool = False, recall_target: float = 0.95):
        """Corpus-row needles (the apply_r pattern, apply_r.lua:270-276)."""
        return _index_query_by_idx(self._normed, needle_idx, k, approx,
                                   recall_target)
