"""Thin collective wrappers for shard_map code paths.

The reference has no communication backend at all (SURVEY.md §2.4/§5.8);
on TPU these compile to XLA collectives over ICI.
"""
from __future__ import annotations


import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from .mesh import DATA_AXIS


def psum(x, axis_name: str = DATA_AXIS):
    return jax.lax.psum(x, axis_name)


def pmean(x, axis_name: str = DATA_AXIS):
    return jax.lax.pmean(x, axis_name)


def all_gather(x, axis_name: str = DATA_AXIS, axis: int = 0,
               tiled: bool = True):
    return jax.lax.all_gather(x, axis_name, axis=axis, tiled=tiled)


def ppermute(x, perm, axis_name: str = DATA_AXIS):
    return jax.lax.ppermute(x, axis_name, perm)


def sharded_topk_merge(scores, k: int, mesh: Mesh,
                       axis_name: str = DATA_AXIS):
    """Global top-k over a 'data'-sharded score vector: local top-k per shard,
    all-gather the (value, index) candidates over ICI, re-top-k — the
    collective replacement for the reference's host-side full sorts
    (apply_r.lua:275, sample.lua:130-148).

    scores: (N,) sharded over axis 0. Returns (values, global_indices),
    replicated.
    """
    n = scores.shape[0]
    n_shards = mesh.shape[axis_name]
    local_n = n // n_shards

    def local(scores_shard):
        kk = min(k, local_n)
        v, i = jax.lax.top_k(scores_shard, kk)
        shard_id = jax.lax.axis_index(axis_name)
        gi = i + shard_id * local_n
        # gather all candidates over ICI, then the final small top-k
        v_all = jax.lax.all_gather(v, axis_name, axis=0, tiled=True)
        gi_all = jax.lax.all_gather(gi, axis_name, axis=0, tiled=True)
        fv, fi = jax.lax.top_k(v_all, k)
        return fv, jnp.take(gi_all, fi)

    fn = shard_map(local, mesh=mesh, in_specs=P(axis_name),
                   out_specs=(P(), P()), check_vma=False)
    return fn(scores)
