"""Multi-process (multi-host) wiring — SURVEY.md §5.8's named deliverable.

The reference is strictly single-process (SURVEY.md §2.4: no NCCL/MPI, no
launcher). On TPU pods, JAX runs one process per host: each process sees
only its local chips, and ``jax.distributed.initialize`` joins them into one
logical runtime so a single ('data', 'model') mesh can span hosts — DP/TP
collectives ride ICI within a slice and DCN across slices, inserted by XLA.

Usage (one process per host):

    initialize_distributed("host0:1234", num_processes=N, process_id=i)
    mesh = make_mesh(...)               # spans ALL processes' devices
    local = loader(*process_slice(n))   # host-local input shard
    batch = global_batch_from_local(local, mesh)

CLI plumbing: ``--coordinator_address/--num_processes/--process_id`` on the
training entry points call ``initialize_distributed`` before any device use.
Exercised by tests/test_multihost.py: a 2-process CPU localhost smoke run.
"""
from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import DATA_AXIS


def initialize_distributed(coordinator_address: str = "",
                           num_processes: int = 0,
                           process_id: int = -1) -> bool:
    """Join the JAX distributed runtime when coordinator flags are set.

    No-op (returns False) when ``coordinator_address`` is empty — the
    single-process default. Must be called BEFORE any JAX backend use.
    """
    if not coordinator_address:
        return False
    if num_processes <= 0 or process_id < 0:
        raise ValueError(
            "--coordinator_address needs --num_processes > 0 and "
            f"--process_id >= 0 (got {num_processes}, {process_id})")
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    return True


def global_batch_from_local(local, mesh: Mesh,
                            axis: Optional[str] = DATA_AXIS):
    """Assemble a global batch-sharded array from this process's local shard.

    Each process passes only its own rows (``process_slice`` of the global
    batch); the result is one logical array sharded over ``axis`` across the
    whole mesh — the pod-scale input pipeline (SURVEY.md §5.8).
    """
    ndim = getattr(local, "ndim", 1)
    spec = P(axis, *([None] * (ndim - 1)))
    return jax.make_array_from_process_local_data(
        NamedSharding(mesh, spec), local)


def replicate_global(tree, mesh: Mesh):
    """Replicate host-local (identical on every process) arrays onto a
    possibly multi-process mesh. Single-process: plain replicated device_put;
    multi-process: the multihost host-local -> global conversion."""
    if jax.process_count() == 1:
        return jax.tree_util.tree_map(
            lambda leaf: jax.device_put(leaf, NamedSharding(mesh, P())), tree)
    from jax.experimental import multihost_utils
    return multihost_utils.host_local_array_to_global_array(tree, mesh, P())


def shard_params_global(tree, mesh: Mesh, min_size: int = 1 << 16):
    """Multi-process version of mesh.shard_params: every process holds an
    identical full host copy of each parameter; each contributes exactly its
    addressable shards via make_array_from_callback (device_put cannot place
    onto non-addressable devices)."""
    import numpy as np

    from .mesh import MODEL_AXIS, param_partition_spec
    model_size = mesh.shape[MODEL_AXIS]

    def place(leaf):
        spec = param_partition_spec(leaf, min_size, model_size)
        host = np.asarray(leaf)
        return jax.make_array_from_callback(
            host.shape, NamedSharding(mesh, spec), lambda idx: host[idx])
    return jax.tree_util.tree_map(place, tree)


def gather_replicated(tree, mesh: Mesh):
    """Make every array leaf fully-replicated (host-fetchable) across the
    mesh — required before checkpointing TP-sharded params in a
    multi-process run, where jax.device_get on a 'model'-sharded array
    would span non-addressable devices.

    This inserts all-gathers (a COLLECTIVE): every process must call it,
    even though only rank 0 writes the checkpoint afterwards.
    """
    leaves, tdef = jax.tree_util.tree_flatten(tree)
    rep = NamedSharding(mesh, P())
    arr_idx = [i for i, l in enumerate(leaves)
               if isinstance(l, jax.Array) and not l.is_fully_addressable]
    if not arr_idx:
        return tree
    gather = jax.jit(lambda xs: xs, out_shardings=[rep] * len(arr_idx))
    gathered = gather([leaves[i] for i in arr_idx])
    for i, g in zip(arr_idx, gathered):
        leaves[i] = g
    return tdef.unflatten(leaves)


def first_local_value(x) -> float:
    """Scalar fetch that works on multi-process global arrays (a plain
    ``float(x)`` requires the array to be fully addressable)."""
    if getattr(x, "is_fully_addressable", True):
        return float(x)
    return float(x.addressable_shards[0].data)
