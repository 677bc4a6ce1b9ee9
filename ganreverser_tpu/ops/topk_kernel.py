"""Pallas TPU kernel: fused normalize + cosine-score matmul.

The similarity search's hot op (apply_r.lua:265-318 host loops ->
analysis/similarity.py lax path). This kernel fuses the row-normalization
epilogue into the MXU matmul so the (N, D) embedding matrix is read from HBM
exactly once and no normalized copy is materialized:

  scores[q, n] = <e[needle_q], e[n]> / (||e[needle_q]|| * ||e[n]||)

Grid over N tiles; needles are gathered and normalized on-the-fly in VMEM.
fp32 accumulation (preferred_element_type) for ranking parity with the lax
reference (tested in tests/test_pallas.py, interpret mode on CPU + compiled
on TPU). Top-k selection stays in lax.top_k — XLA's sort unit handles it.

Escape hatch: analysis/similarity.py's lax path is the default everywhere;
the Pallas kernels are opt-in via apply_r's ``--pallas`` flag or by calling
these functions directly.
"""
from __future__ import annotations


import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS = 1e-8


def _kernel(needles_ref, emb_ref, out_ref):
    """needles_ref: (Q, D) VMEM; emb_ref: (TILE_N, D) VMEM;
    out_ref: (Q, TILE_N) VMEM."""
    q = needles_ref[:].astype(jnp.float32)
    e = emb_ref[:].astype(jnp.float32)
    # normalize both operands in VMEM (fused epilogue/prologue)
    qn = q * jax.lax.rsqrt(jnp.maximum(jnp.sum(q * q, axis=1,
                                               keepdims=True), _EPS * _EPS))
    en = e * jax.lax.rsqrt(jnp.maximum(jnp.sum(e * e, axis=1,
                                               keepdims=True), _EPS * _EPS))
    out_ref[:] = jax.lax.dot_general(
        qn, en, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)


def _auto_interpret(interpret):
    """Pallas compiles only for TPU; on any other backend fall back to the
    interpreter so the same code path works in CPU tests/CLIs."""
    if interpret is None:
        return jax.default_backend() != "tpu"
    return interpret


def auto_tile(tile_n: int, d: int, itemsize: int,
              budget: int = 8 << 20) -> int:
    """Shrink the corpus tile so one (tile, D) block stays under ``budget``
    bytes, never below 128 rows (sub-128 tiles put block boundaries off
    the (8,128) native tiling and Mosaic rejects the layout on real
    hardware). The fixed 512 default blew scoped VMEM on PIXEL similarity
    (apply_r's second search axis: D = H*W*C = 12288 at 64x64 RGB ->
    12.6MB/block, >16MB double-buffered — found live on TPU, round 2).
    Returns 0 when even a 128-row block exceeds the budget — callers fall
    back to the lax path (which is ~parity anyway, RESULTS.md)."""
    max_rows = budget // max(1, d * itemsize)
    if max_rows < 128:
        return 0
    return min(tile_n, (max_rows // 128) * 128)


def cosine_scores_pallas(embeddings: jax.Array, needle_idx: jax.Array,
                         *, tile_n: int = 512,
                         interpret=None) -> jax.Array:
    """(Q, N) cosine scores. N must be a multiple of the EFFECTIVE tile
    (auto_tile(tile_n, D, itemsize); pad upstream — cosine_topk_pallas
    does).

    NOTE: normalization clamps ||e||^2 at EPS^2 (the lax path clamps ||e||
    at EPS) — identical behavior for all non-degenerate rows.
    """
    interpret = _auto_interpret(interpret)
    n, d = embeddings.shape
    tile_n = auto_tile(tile_n, d, embeddings.dtype.itemsize)
    if tile_n == 0:  # D too wide for a 128-row block: lax path
        from ..analysis.similarity import cosine_scores
        return cosine_scores(embeddings, needle_idx)
    needles = jnp.take(embeddings, needle_idx, axis=0)
    q = needles.shape[0]
    assert n % tile_n == 0, (n, tile_n)

    grid = (n // tile_n,)
    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((q, d), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((q, tile_n), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((q, n), jnp.float32),
        interpret=interpret,
        # raised from the conservative 16MB compiler default; v5e has
        # 128MB physical VMEM (same rationale as the conv kernels) — the
        # 8MB/block auto_tile budget keeps actual usage far below this
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(needles, embeddings)


def cosine_topk_pallas(embeddings: jax.Array, needle_idx: jax.Array, k: int,
                       *, tile_n: int = 512, interpret=None):
    """Fused-kernel variant of analysis.similarity.cosine_topk; pads N up to
    a tile multiple with zero rows (masked out by taking only [:n])."""
    n, d = embeddings.shape
    tile_n = auto_tile(tile_n, d, embeddings.dtype.itemsize)
    if tile_n == 0:  # D too wide for a 128-row block: lax path
        from ..analysis.similarity import cosine_topk
        return cosine_topk(embeddings, needle_idx, k)
    pad = (-n) % tile_n
    if pad:
        embeddings = jnp.concatenate(
            [embeddings, jnp.zeros((pad, d), embeddings.dtype)])
    scores = cosine_scores_pallas(embeddings, needle_idx, tile_n=tile_n,
                                  interpret=interpret)
    if pad:
        scores = scores[:, :n]
    return jax.lax.top_k(scores, k)
