"""Mesh-sharded analysis — the 'large-N batch inversion' scale path
(SURVEY.md §5.7, BASELINE.json north star: 10k inversions + top-k answers
across a v5e-8).

The N axis (generated faces / embeddings) is sharded over the mesh's 'data'
axis; G/R parameters are replicated (or TP-sharded via parallel.shard_params).
Inversion then runs with zero communication, and the similarity search
becomes: local fused scores per shard -> local top-k -> one small all-gather
of candidates over ICI -> final top-k (parallel/comm.py pattern).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.prng import noise_inputs
from ..models.modules import Module
from ..parallel.mesh import DATA_AXIS, data_sharding, replicated
from .similarity import normalize_rows


def distributed_generate_and_invert(G: Module, R: Module, g_variables: dict,
                                    r_variables: dict, *, n: int,
                                    noise_dim: int, noise_method: str,
                                    key: jax.Array, mesh: Mesh):
    """Generate N faces and invert them, N sharded over 'data'.

    Returns (noise, images, attributes), each sharded along axis 0. N must
    divide evenly by the data axis size.
    """
    n_shards = mesh.shape[DATA_AXIS]
    assert n % n_shards == 0, (n, n_shards)
    noise = jax.device_put(
        noise_inputs(key, n, noise_dim, noise_method),
        data_sharding(mesh, 2))

    @jax.jit
    def run(gv, rv, z):
        imgs, _ = G.apply(gv, z, train=False)
        zh, _ = R.apply(rv, imgs, train=False)
        return imgs, zh

    images, attributes = run(g_variables, r_variables, noise)
    return noise, images, attributes


def distributed_cosine_topk(embeddings: jax.Array, needle_idx: jax.Array,
                            k: int, mesh: Mesh, approx: bool = False,
                            recall_target: float = 0.95):
    """Global top-k cosine search over 'data'-sharded embeddings.

    Per shard: normalize locally, matmul against the (replicated) gathered
    needles, local top-k; then all-gather the (value, global-index)
    candidates over ICI and re-top-k. Exact by default — the global top-k
    is a subset of the union of local top-ks. ``approx=True`` swaps the
    LOCAL selection for TPU's native approximate k-selection (the
    per-shard recall bound carries to the global result, since the final
    re-top-k over the gathered candidates stays exact); measured 17-38x
    on the single-chip all-N shape (RESULTS.md round 3).
    """
    n, d = embeddings.shape
    q = needle_idx.shape[0]
    n_shards = mesh.shape[DATA_AXIS]
    local_n = n // n_shards
    kk = min(k, local_n)

    def local(emb_shard, needles):
        from .similarity import _select_topk
        shard_id = jax.lax.axis_index(DATA_AXIS)
        en = normalize_rows(emb_shard)
        qn = normalize_rows(needles)
        scores = jnp.dot(qn, en.T, preferred_element_type=jnp.float32)
        v, i = _select_topk(scores, kk, approx, recall_target)  # (q, kk)
        gi = i + shard_id * local_n
        v_all = jax.lax.all_gather(v, DATA_AXIS, axis=1, tiled=True)
        gi_all = jax.lax.all_gather(gi, DATA_AXIS, axis=1, tiled=True)
        fv, fi = jax.lax.top_k(v_all, k)
        return fv, jnp.take_along_axis(gi_all, fi, axis=1)

    # needles gathered once on the host side of the program: a tiny (q, d)
    # replicated operand
    needles = jnp.take(embeddings, needle_idx, axis=0)
    needles = jax.device_put(jax.device_get(needles),
                             replicated(mesh))

    fn = shard_map(local, mesh=mesh,
                   in_specs=(P(DATA_AXIS), P()),
                   out_specs=(P(), P()), check_vma=False)
    return jax.jit(fn)(embeddings, needles)
