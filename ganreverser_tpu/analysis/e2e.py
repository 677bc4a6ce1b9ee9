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
  needle-chunk scan over the already-resident embeddings;
* ``pixel_k > 0`` adds the reference's SECOND similarity measure — cosine
  over raw flattened pixels (apply_r.lua:307-314) — scored from normalized
  flat pixels emitted by the same chunk scan (one extra (N, H*W*C) f32
  tensor; the un-normalized image tensor itself is still never stored);
* ``make_distributed_e2e_program`` shards the whole pipeline over a
  ``('data', 'model')`` mesh: z split over 'data', per-shard G→R scan,
  one small all-gather of the normalized embeddings over ICI, per-shard
  needle search, and — for the pixel measure — a ppermute RING over the
  pixel blocks so the (N, H*W*C) corpus is never replicated. This is the
  BASELINE.md v5e-8 north-star pipeline as ONE jitted program.

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


def chunked_topk_search(queries_normed: jax.Array, corpus_normed: jax.Array,
                        k: int, needle_chunk: int = 256,
                        approx: bool = False, recall_target: float = 0.95
                        ) -> Tuple[jax.Array, jax.Array]:
    """Top-k corpus rows per query, streaming queries in chunks.

    Both operands are row-normalized; the (Q, N) score matrix is never
    materialized: query chunks stream through one matmul (MXU) + top_k
    each. Returns (values (Q, k), indices (Q, k)). Traceable — safe
    inside jit and shard_map.
    """
    from .similarity import _select_topk
    q = queries_normed.shape[0]
    n_chunks = -(-q // needle_chunk)
    pad = n_chunks * needle_chunk - q
    # zero-row padding (NOT queries[:pad] — that under-pads when q < pad,
    # i.e. a query set smaller than half the needle chunk)
    qq = jnp.pad(queries_normed, ((0, pad), (0, 0))) if pad \
        else queries_normed
    qq = qq.reshape(n_chunks, needle_chunk, -1)

    def search(qc):
        scores = jnp.dot(qc, corpus_normed.T,
                         preferred_element_type=jnp.float32)
        return _select_topk(scores, k, approx, recall_target)

    v, i = jax.lax.map(search, qq)
    return (v.reshape(n_chunks * needle_chunk, k)[:q],
            i.reshape(n_chunks * needle_chunk, k)[:q])


def topk_all(embeddings: jax.Array, k: int,
             needle_chunk: int = 256, approx: bool = False,
             recall_target: float = 0.95) -> Tuple[jax.Array, jax.Array]:
    """Top-k most-similar corpus rows for EVERY row, chunked over needles.

    ``approx=True`` uses TPU's native approximate k-selection
    (analysis/similarity.py::_select_topk) — the selection is the
    dominant cost of this all-N search on hardware.
    """
    normed = normalize_rows(embeddings)
    return chunked_topk_search(normed, normed, k, needle_chunk, approx,
                               recall_target)


def _g_then_r_fn(G: Module, R: Module, g_apply, pixels: bool,
                 r_apply=None):
    """The per-chunk fused leg: z chunk -> R embedding (and optionally the
    normalized flat pixels for the pixel-cosine measure)."""

    def g_then_r(g_variables, r_variables, zc):
        if g_apply is None:
            imgs, _ = G.apply(g_variables, zc, train=False)
        else:
            imgs = g_apply(g_variables, zc)
        if r_apply is None:
            emb, _ = R.apply(r_variables, imgs, train=False)
        else:
            emb = r_apply(r_variables, imgs)
        if pixels:
            flat = imgs.reshape(imgs.shape[0], -1)
            return emb, normalize_rows(flat)
        return emb

    return g_then_r


def make_e2e_program(G: Module, R: Module, *, batch_size: int = 128,
                     k: int = 100, needle_chunk: int = 256,
                     g_apply=None, r_apply=None, approx: bool = False,
                     recall_target: float = 0.95, pixel_k: int = 0):
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

    ``pixel_k > 0``: also rank every face against all N on raw flattened
    pixels (the reference's second measure, apply_r.lua:307-314) and
    return ``(emb, v, i, pixel_v, pixel_i)``. Costs one (N, H*W*C) f32
    HBM tensor of normalized pixels (the only full-N image-scale tensor
    in the program) plus the wide-D search matmuls.

    ``r_apply``: optional ``(r_variables, images) -> embeddings`` override
    for the inverter leg — e.g. models/fastpath.py's int8 inverter, which
    reads the same checkpoint pytree.
    """
    g_then_r = _g_then_r_fn(G, R, g_apply, pixel_k > 0, r_apply)

    @jax.jit
    def run(g_variables, r_variables, z):
        out = forward_batched(
            lambda zc: g_then_r(g_variables, r_variables, zc),
            z, batch_size)
        if pixel_k > 0:
            emb, flat = out
            v, i = topk_all(emb, k, needle_chunk, approx, recall_target)
            pv, pi = chunked_topk_search(flat, flat, pixel_k, needle_chunk,
                                         approx, recall_target)
            return emb, v, i, pv, pi
        emb = out
        v, i = topk_all(emb, k, needle_chunk, approx, recall_target)
        return emb, v, i

    return run


def make_distributed_e2e_program(G: Module, R: Module, *, mesh,
                                 batch_size: int = 128, k: int = 100,
                                 needle_chunk: int = 256, g_apply=None,
                                 r_apply=None, approx: bool = False,
                                 recall_target: float = 0.95,
                                 pixel_k: int = 0):
    """The fused e2e pipeline sharded over the mesh's 'data' axis — the
    v5e-8 north-star workload (BASELINE.md: ≥50k end-to-end inversions/sec
    across 8 chips; /root/reference/apply_r.lua:143-153 + 265-318 is the
    composed pipeline being scaled) as ONE jitted program.

    Layout (SURVEY.md §5.7): z is split over 'data'; every shard runs the
    G→R chunk scan on its rows with zero communication; the embedding
    corpus (N, z_dim — ~4 MB f32 at the flagship shape) is all-gathered
    once over ICI; each shard then answers top-k for its OWN rows against
    the full corpus, so the search work splits N/n_shards ways and the
    returned (N, k) results come back 'data'-sharded in global row order.

    The optional pixel measure (``pixel_k > 0``) must score every needle
    against all N rows of a (N, H*W*C) corpus that is ~125x wider than
    the embeddings — replicating it via all-gather would burn HBM and DCN
    at pod scale. Instead the normalized pixel blocks RING around the
    'data' axis with ``ppermute`` (n_shards steps); each step every shard
    scores its local needles against the visiting block and folds the
    candidates into a running top-k. Peak per-device pixel storage stays
    2 blocks (local + visiting) regardless of mesh size.

    Params are taken replicated (pure DP — the north-star config);
    combine with parallel.shard_params TP via the unfused
    analysis/distributed.py path instead. Requires mesh model axis == 1.

    Returns jitted ``(g_vars, r_vars, z)`` -> same signature as
    ``make_e2e_program``. z's leading dim must divide by the data-axis
    size; parity with the single-device program is exact when
    (N / n_shards) % batch_size == 0 (identical chunk boundaries).
    """
    from jax import shard_map
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..parallel.mesh import DATA_AXIS, MODEL_AXIS

    if MODEL_AXIS in mesh.shape and mesh.shape[MODEL_AXIS] != 1:
        raise ValueError(
            "make_distributed_e2e_program is the pure-DP north-star "
            f"pipeline; got model axis {mesh.shape[MODEL_AXIS]} != 1 — "
            "use analysis/distributed.py for TP-sharded params")
    n_shards = mesh.shape[DATA_AXIS]
    g_then_r = _g_then_r_fn(G, R, g_apply, pixel_k > 0, r_apply)

    def _ring_pixel_topk(flat_local):
        """All-pairs pixel top-k via a ppermute ring over pixel blocks.

        flat_local: (local_n, D) normalized rows of THIS shard. Returns
        (local_n, pixel_k) values/global-indices for the local needles.
        """
        local_n = flat_local.shape[0]
        my = jax.lax.axis_index(DATA_AXIS)
        kk = min(pixel_k, local_n)
        perm = [(s, (s + 1) % n_shards) for s in range(n_shards)]

        def step(s, carry):
            block, vbest, ibest = carry
            # the visiting block started at shard (my - s) mod n_shards
            src = jax.lax.rem(my - s + n_shards, n_shards)
            v, i = chunked_topk_search(flat_local, block, kk, needle_chunk,
                                       approx, recall_target)
            gi = i + src * local_n
            vcat = jnp.concatenate([vbest, v], axis=1)
            icat = jnp.concatenate([ibest, gi], axis=1)
            vbest, sel = jax.lax.top_k(vcat, pixel_k)
            ibest = jnp.take_along_axis(icat, sel, axis=1)
            block = jax.lax.ppermute(block, DATA_AXIS, perm)
            return block, vbest, ibest

        v0 = jnp.full((local_n, pixel_k), -jnp.inf, jnp.float32)
        i0 = jnp.zeros((local_n, pixel_k), jnp.int32)
        _, vbest, ibest = jax.lax.fori_loop(
            0, n_shards, step, (flat_local, v0, i0))
        return vbest, ibest

    def local_pipeline(g_variables, r_variables, z_local):
        out = forward_batched(
            lambda zc: g_then_r(g_variables, r_variables, zc),
            z_local, batch_size)
        emb_local, flat_local = out if pixel_k > 0 else (out, None)
        normed_local = normalize_rows(emb_local)
        # one small ICI all-gather: tiled axis-0 gather preserves shard
        # order, so corpus row j IS global row j and local top-k indices
        # are global without adjustment
        corpus = jax.lax.all_gather(normed_local, DATA_AXIS, axis=0,
                                    tiled=True)
        v, i = chunked_topk_search(normed_local, corpus, k, needle_chunk,
                                   approx, recall_target)
        if pixel_k > 0:
            pv, pi = _ring_pixel_topk(flat_local)
            return emb_local, v, i, pv, pi
        return emb_local, v, i

    n_out = 5 if pixel_k > 0 else 3
    fn = shard_map(local_pipeline, mesh=mesh,
                   in_specs=(P(), P(), P(DATA_AXIS)),
                   out_specs=(P(DATA_AXIS),) * n_out, check_vma=False)
    return jax.jit(fn)


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
