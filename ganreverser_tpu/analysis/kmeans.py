"""On-device kmeans — replaces unsup.kmeans + the host assignment loop
(apply_r.lua:197-218).

Lloyd iterations run entirely on device: the distance matrix is one MXU
matmul, assignment is an argmin, and the centroid update is a mask-matmul
(segment mean) — no host O(N*K) loops.

The reference's cluster-membership step has a quirk preserved behind its own
function: after unsup.kmeans it assigns every image to the centroid with the
MINIMUM cosine similarity and sorts members by descending similarity
(apply_r.lua:206-224; SURVEY.md §3.3 flags this). ``assign_euclidean`` is
the sane variant; ``assign_min_cosine`` reproduces the reference outputs.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .similarity import normalize_rows


def _pairwise_sq_dists(x: jax.Array, c: jax.Array) -> jax.Array:
    """(N, K) squared euclidean distances via the matmul expansion."""
    x2 = jnp.sum(x * x, axis=1, keepdims=True)
    c2 = jnp.sum(c * c, axis=1)[None, :]
    xc = jnp.dot(x, c.T, preferred_element_type=jnp.float32)
    return x2 - 2.0 * xc + c2


@functools.partial(jax.jit, static_argnums=(2, 3))
def kmeans(key: jax.Array, x: jax.Array, k: int, iters: int):
    """Lloyd's algorithm; centroids initialized from random data points
    (unsup.kmeans's init). Returns (centroids (K, D), counts (K,))."""
    x = x.astype(jnp.float32)
    n = x.shape[0]
    init_idx = jax.random.choice(key, n, (k,), replace=False)
    centroids = jnp.take(x, init_idx, axis=0)

    def body(_, carry):
        centroids, _ = carry
        d = _pairwise_sq_dists(x, centroids)
        assign = jnp.argmin(d, axis=1)                      # (N,)
        onehot = jax.nn.one_hot(assign, k, dtype=jnp.float32)  # (N, K)
        counts = jnp.sum(onehot, axis=0)                    # (K,)
        sums = jnp.dot(onehot.T, x, preferred_element_type=jnp.float32)
        new_centroids = sums / jnp.maximum(counts, 1.0)[:, None]
        # keep the old centroid for empty clusters
        new_centroids = jnp.where(counts[:, None] > 0, new_centroids,
                                  centroids)
        return new_centroids, counts

    centroids, counts = jax.lax.fori_loop(
        0, iters, body, (centroids, jnp.zeros((k,), jnp.float32)))
    return centroids, counts


@jax.jit
def assign_euclidean(x: jax.Array, centroids: jax.Array):
    """Nearest centroid by euclidean distance. Returns (assignment (N,),
    distance (N,))."""
    d = _pairwise_sq_dists(x.astype(jnp.float32), centroids)
    assign = jnp.argmin(d, axis=1)
    return assign, jnp.sqrt(jnp.take_along_axis(
        d, assign[:, None], axis=1))[:, 0]


@jax.jit
def assign_min_cosine(x: jax.Array, centroids: jax.Array):
    """Reference-quirk assignment: the 'best' cluster is the one with the
    MINIMUM cosine similarity (apply_r.lua:206-218). Returns
    (assignment (N,), similarity (N,))."""
    xn = normalize_rows(x)
    cn = normalize_rows(centroids)
    sims = jnp.dot(xn, cn.T, preferred_element_type=jnp.float32)  # (N, K)
    assign = jnp.argmin(sims, axis=1)
    return assign, jnp.take_along_axis(sims, assign[:, None], axis=1)[:, 0]


def cluster_members(assign, score, cluster: int, max_per_cluster: int):
    """Host-side: member indices of one cluster sorted by DESCENDING score,
    truncated (apply_r.lua:222-230)."""
    import numpy as np
    assign = np.asarray(assign)
    score = np.asarray(score)
    members = np.nonzero(assign == cluster)[0]
    order = members[np.argsort(-score[members], kind="stable")]
    return order[:max_per_cluster]
