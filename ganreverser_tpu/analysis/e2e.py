"""The composed generate→invert→top-k pipeline as ONE device program.

The reference's apply_r main loop is strictly sequential on the host:
createImages (apply_r.lua:143-147), forwardBatched through R
(apply_r.lua:150-153), then the needle-by-needle cosine search
(apply_r.lua:265-318). The obvious TPU translation keeps three dispatches
(generate-all, invert-all, search-all) with the full (N, H, W, C) image
tensor written to and re-read from HBM in between.

This module fuses the whole pipeline into a single jitted program:

* the G→R leg is one ``lax.map`` chunk scan where each chunk's generated
  images feed R *immediately* — the full image set is never materialized,
  saving two full-HBM passes over N*H*W*C values (≈2x 60 MB at the
  flagship N=10240 geometry, bf16);
* the similarity search (every generated face as a needle, matching
  bench.py's historical "top-k answers for all N" accounting) runs as a
  needle-chunk scan over the already-resident embeddings.

``make_e2e_program`` is what bench.py times for the MEASURED end-to-end
rate (replacing the round-2 additive t_gen+t_inv+t_topk projection);
``make_serial_programs`` builds the unfused three-dispatch variant so the
fusion win is itself measured, not asserted.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..models.modules import Module
from .batched import forward_batched
from .similarity import normalize_rows


def topk_all(embeddings: jax.Array, k: int,
             needle_chunk: int = 256, approx: bool = False,
             recall_target: float = 0.95) -> Tuple[jax.Array, jax.Array]:
    """Top-k most-similar corpus rows for EVERY row, chunked over needles.

    The (N, N) score matrix is never materialized: needles stream through
    in ``needle_chunk`` blocks, each one matmul (MXU) + top_k. Returns
    (values (N, k), indices (N, k)). Traceable — safe inside jit.
    ``approx=True`` uses TPU's native approximate k-selection
    (analysis/similarity.py::_select_topk) — the selection is the
    dominant cost of this all-N search on hardware.
    """
    from .similarity import _select_topk
    n = embeddings.shape[0]
    normed = normalize_rows(embeddings)
    n_chunks = -(-n // needle_chunk)
    pad = n_chunks * needle_chunk - n
    # zero-row padding (NOT normed[:pad] — that under-pads when n < pad,
    # i.e. a corpus smaller than half the needle chunk)
    q = jnp.pad(normed, ((0, pad), (0, 0))) if pad else normed
    q = q.reshape(n_chunks, needle_chunk, -1)

    def search(qc):
        scores = jnp.dot(qc, normed.T, preferred_element_type=jnp.float32)
        return _select_topk(scores, k, approx, recall_target)

    v, i = jax.lax.map(search, q)
    return (v.reshape(n_chunks * needle_chunk, k)[:n],
            i.reshape(n_chunks * needle_chunk, k)[:n])


def make_e2e_program(G: Module, R: Module, *, batch_size: int = 128,
                     k: int = 100, needle_chunk: int = 256,
                     g_apply=None, approx: bool = False,
                     recall_target: float = 0.95):
    """One jitted ``(g_vars, r_vars, z) -> (emb, topk_vals, topk_idx)``.

    The fused production pipeline: chunked G→R (images stay in registers/
    VMEM-scale chunks, never a full-N HBM tensor), then the all-N cosine
    top-k. Equivalent to apply_r.lua:143-153 + 265-318 with every face as
    a needle.

    ``g_apply``: optional ``(g_variables, z_chunk) -> images`` override for
    the generator leg — e.g. models/fastpath.py's folded-BN lhs-dilated
    decoder, which reads the same checkpoint pytree.

    ``approx``: swap the exact per-needle top-k for TPU's native
    approximate k-selection (recall >= ``recall_target``); exact stays the
    default — the reference's rankings are exact.
    """

    @jax.jit
    def run(g_variables, r_variables, z):
        def g_then_r(zc):
            if g_apply is None:
                imgs, _ = G.apply(g_variables, zc, train=False)
            else:
                imgs = g_apply(g_variables, zc)
            emb, _ = R.apply(r_variables, imgs, train=False)
            return emb

        emb = forward_batched(g_then_r, z, batch_size)
        v, i = topk_all(emb, k, needle_chunk, approx, recall_target)
        return emb, v, i

    return run


def make_serial_programs(G: Module, R: Module, *, batch_size: int = 128,
                         k: int = 100, needle_chunk: int = 256):
    """The unfused three-dispatch pipeline (generate-all → invert-all →
    search-all), for measuring what the fusion in ``make_e2e_program``
    actually buys. Returns (generate, invert, search) jitted programs."""

    @jax.jit
    def generate(g_variables, z):
        return forward_batched(
            lambda b: G.apply(g_variables, b, train=False)[0], z, batch_size)

    @jax.jit
    def invert(r_variables, images):
        return forward_batched(
            lambda b: R.apply(r_variables, b, train=False)[0], images,
            batch_size)

    @jax.jit
    def search(emb):
        return topk_all(emb, k, needle_chunk)

    return generate, invert, search
