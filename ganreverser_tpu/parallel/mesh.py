"""Device mesh & sharding — the framework's distribution layer.

The reference is strictly single-process/single-device (SURVEY.md §2.4: no
DP/TP/PP, no collectives, no NCCL/MPI). This module is green-field TPU
design: a 2-D mesh with named axes ('data', 'model'); data parallelism =
batch sharded over 'data'; tensor parallelism = the big Dense/conv kernels
sharded over 'model'. XLA inserts the all-reduces/all-gathers over ICI.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(data: int = 0, model: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a ('data', 'model') mesh. ``data=0`` uses all remaining
    devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if model < 1:
        model = 1
    if model > n:
        raise ValueError(
            f"model axis {model} exceeds the {n} available devices")
    if data <= 0:
        data = n // model
    if data < 1 or data * model > n:
        raise ValueError(
            f"mesh ({data} data x {model} model) does not fit {n} devices")
    devs = np.asarray(devices[: data * model]).reshape(data, model)
    return Mesh(devs, (DATA_AXIS, MODEL_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Shard the leading (batch / N) axis over 'data'."""
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))


def shard_batch(x, mesh: Mesh):
    """Place a host batch onto the mesh, sharded along axis 0
    (the 'large-N batch inversion' layout, SURVEY.md §5.7)."""
    return jax.device_put(x, data_sharding(mesh, np.ndim(x)))


def param_partition_spec(leaf, min_size: int = 1 << 16,
                         model_size: int = 1) -> P:
    """Tensor-parallel layout rule: shard the output features of big Dense
    kernels and the output channels of big conv kernels over 'model' (falling
    back to the input dim, then replication, when not divisible); replicate
    everything small (biases, BN, PReLU)."""
    shape = getattr(leaf, "shape", ())
    size = int(np.prod(shape)) if shape else 0
    if size < min_size or model_size <= 1:
        return P()
    if len(shape) == 2:
        if shape[1] % model_size == 0:
            return P(None, MODEL_AXIS)
        if shape[0] % model_size == 0:
            return P(MODEL_AXIS, None)
    if len(shape) == 4:
        if shape[3] % model_size == 0:
            return P(None, None, None, MODEL_AXIS)
        if shape[2] % model_size == 0:
            return P(None, None, MODEL_AXIS, None)
    return P()


def shard_params(tree, mesh: Mesh, min_size: int = 1 << 16):
    """Apply the TP layout rule to a parameter pytree. The 'model' axis of
    size 1 degenerates to full replication."""
    model_size = mesh.shape[MODEL_AXIS]

    def place(leaf):
        spec = param_partition_spec(leaf, min_size, model_size)
        return jax.device_put(leaf, NamedSharding(mesh, spec))
    return jax.tree_util.tree_map(place, tree)


def replicate(tree, mesh: Mesh):
    return jax.tree_util.tree_map(
        lambda leaf: jax.device_put(leaf, replicated(mesh)), tree)


def process_slice(n: int) -> slice:
    """This host's slice of a length-n globally-sharded data axis —
    host-local data loading for multi-process TPU pods (SURVEY.md §5.8).
    On a single process this is the identity slice."""
    p = jax.process_index()
    np_ = jax.process_count()
    if n % np_ != 0:
        raise ValueError(
            f"global data size {n} must divide evenly by the process count "
            f"{np_} (pad the dataset or adjust the batch)")
    per = n // np_
    return slice(p * per, (p + 1) * per)


def host_local_batch(loader, n: int):
    """Load only this process's shard: ``loader(start, count)`` -> array.
    Combine with jax.make_array_from_process_local_data for pod-scale input
    pipelines."""
    s = process_slice(n)
    return loader(s.start, s.stop - s.start)
