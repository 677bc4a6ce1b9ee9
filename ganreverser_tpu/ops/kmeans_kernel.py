"""Pallas TPU kernel: fused kmeans assignment + partial centroid update.

One Lloyd iteration reads X once from HBM: per (TILE_N, D) tile the kernel
computes squared distances to all K centroids on the MXU, takes the argmin,
and accumulates one-hot-weighted partial sums and counts into VMEM
accumulators (revision pattern: grid-carried accumulation with @pl.when
zero-init on the first tile). The host-side wrapper finishes the division —
replacing unsup.kmeans + the O(N*K) host loop (apply_r.lua:198-218).

Parity with analysis/kmeans.py's lax implementation is tested in
tests/test_pallas.py (interpret mode on CPU, compiled on TPU).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, c_ref, sums_ref, counts_ref, *, tile_n, n_valid):
    """x_ref: (TILE_N, D); c_ref: (K, D); accumulators:
    sums (K, D), counts (1, K) — grid-carried (same block every step).

    ``n_valid`` (static): rows with global index >= n_valid are padding —
    their one-hot contribution is zeroed INSIDE the kernel, so padded
    inputs need no host-side correction (whose separately-lowered argmin
    could disagree with the kernel's for near-equidistant centroids)."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        sums_ref[:] = jnp.zeros_like(sums_ref)
        counts_ref[:] = jnp.zeros_like(counts_ref)

    x = x_ref[:].astype(jnp.float32)
    c = c_ref[:].astype(jnp.float32)
    # ||x||² is constant per row — argmin only needs -2xc + ||c||²
    xc = jax.lax.dot_general(x, c, dimension_numbers=(((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    c2 = jnp.sum(c * c, axis=1)[None, :]
    d = c2 - 2.0 * xc                       # (TILE_N, K)
    assign = jnp.argmin(d, axis=1)          # (TILE_N,)
    k = c.shape[0]
    onehot = (assign[:, None] ==
              jax.lax.broadcasted_iota(jnp.int32, (x.shape[0], k), 1)
              ).astype(jnp.float32)         # (TILE_N, K)
    # mask padded rows (TPU needs >=2D iota: build row ids at (TILE_N, K))
    row_ids = (i * tile_n
               + jax.lax.broadcasted_iota(jnp.int32, (x.shape[0], k), 0))
    onehot = jnp.where(row_ids < n_valid, onehot, 0.0)
    sums_ref[:] += jax.lax.dot_general(
        onehot, x, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    counts_ref[:] += jnp.sum(onehot, axis=0)[None, :]


def kmeans_step_pallas(x: jax.Array, centroids: jax.Array, *,
                       tile_n: int = 512, interpret=None):
    """One fused Lloyd update. x: (N, D), centroids: (K, D); N % tile_n == 0.
    Returns (new_centroids, counts); empty clusters keep their centroid."""
    sums, counts = _kmeans_sums_counts(x, centroids, tile_n, interpret)
    new_centroids = sums / jnp.maximum(counts, 1.0)[:, None]
    new_centroids = jnp.where(counts[:, None] > 0, new_centroids,
                              centroids.astype(jnp.float32))
    return new_centroids, counts


def kmeans_pallas(key: jax.Array, x: jax.Array, k: int, iters: int, *,
                  tile_n: int = 512, interpret=None):
    """Full kmeans with the fused step; same init as analysis.kmeans.kmeans
    (random data points).

    N that is not a tile multiple is padded with copies of row 0; the
    kernel itself masks rows beyond the true N (``n_valid``), so padded
    runs match the unpadded lax path with no host-side correction.
    """
    x = x.astype(jnp.float32)
    n = x.shape[0]
    tile_n = min(tile_n, n)
    pad = (-n) % tile_n
    xp = jnp.concatenate([x, jnp.tile(x[:1], (pad, 1))]) if pad else x

    init_idx = jax.random.choice(key, n, (k,), replace=False)
    centroids = jnp.take(x, init_idx, axis=0)
    counts = jnp.zeros((k,), jnp.float32)
    for _ in range(iters):
        sums, counts = _kmeans_sums_counts(xp, centroids, tile_n, interpret,
                                           n_valid=n)
        new_centroids = sums / jnp.maximum(counts, 1.0)[:, None]
        centroids = jnp.where(counts[:, None] > 0, new_centroids, centroids)
    return centroids, counts


def _kmeans_sums_counts(x, centroids, tile_n, interpret, n_valid=None):
    """Raw (sums, counts) from the fused kernel (no centroid division).
    ``n_valid``: true row count — rows beyond it are padding, masked in
    the kernel (defaults to all rows valid)."""
    from .topk_kernel import _auto_interpret
    interpret = _auto_interpret(interpret)
    n, d = x.shape
    k = centroids.shape[0]
    assert n % tile_n == 0, (n, tile_n)
    sums, counts = pl.pallas_call(
        functools.partial(_kernel, tile_n=tile_n,
                          n_valid=n if n_valid is None else n_valid),
        grid=(n // tile_n,),
        in_specs=[
            pl.BlockSpec((tile_n, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, d), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((k, d), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(jax.ShapeDtypeStruct((k, d), jnp.float32),
                   jax.ShapeDtypeStruct((1, k), jnp.float32)),
        interpret=interpret,
    )(x, centroids)
    return sums, counts[0]
