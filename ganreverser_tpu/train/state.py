"""Train state containers — pytree-registered dataclasses.

Replaces the reference's flat-parameter views + global OPTSTATE
(train.lua:176-193): one TrainState per network bundles params, module state
(BatchNorm running stats), and optimizer state, so a single jitted step can
thread everything functionally.
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from ..optim import Optimizer


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    params: Any
    state: Any          # module state (BatchNorm running stats)
    opt_state: Any
    step: jax.Array

    @classmethod
    def create(cls, variables: dict, opt: Optimizer) -> "TrainState":
        return cls(params=variables["params"], state=variables["state"],
                   opt_state=opt.init(variables["params"]),
                   step=jnp.zeros((), jnp.int32))

    @property
    def variables(self) -> dict:
        return {"params": self.params, "state": self.state}


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class GanState:
    """G + D pair for adversarial training (train.lua's MODEL_G/MODEL_D +
    OPTSTATE, as one pytree)."""
    g: TrainState
    d: TrainState


def create_train_state(module, opt: Optimizer, key, in_shape) -> TrainState:
    """Build module variables + optimizer state as ONE jitted program.

    Eager init dispatches one op per parameter tensor; on a high-latency
    device link (the axon tunnel's ~28 ms round trip) that is dozens of
    round trips per model. One compiled program = one round trip.
    """
    import functools

    @functools.partial(jax.jit, static_argnums=())
    def go(k):
        variables, _ = module.init(k, in_shape)
        return TrainState.create(variables, opt)

    return go(key)


def merge_state(old: dict, new: dict) -> dict:
    """Deep-merge a partial state update (only stateful layers report back)
    into the full state tree."""
    if not new:
        return old
    out = dict(old)
    for k, v in new.items():
        if k in old and isinstance(old[k], dict) and isinstance(v, dict):
            out[k] = merge_state(old[k], v)
        else:
            out[k] = v
    return out
