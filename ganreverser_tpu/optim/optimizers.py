"""The six reference optimizers, implemented as pure JAX gradient transforms.

The reference dispatches to torch/optim's C-backed sgd/adagrad/adadelta/
adamax/adam/rmsprop (adversarial.lua:147-188, train_r.lua:170). Torch
semantics and *defaults* are reproduced (the reference initializes every
optimizer state empty, train.lua:183-193, so torch defaults apply — except
sgd, which gets the CLI lr/momentum).

Interface (optax-style, works on arbitrary pytrees):
    opt = adam()
    state = opt.init(params)
    updates, state = opt.update(grads, state, params)
    params = apply_updates(params, updates)

All state lives in pytrees, so optimizer state checkpoints and shards like
parameters do — an improvement over the reference, which silently drops
optimizer state on resume (train.lua:183-193, SURVEY.md §5.4).
"""
from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp


class Optimizer(NamedTuple):
    init: Callable[[Any], Any]
    update: Callable[[Any, Any, Any], tuple[Any, Any]]


def apply_updates(params, updates):
    return jax.tree_util.tree_map(lambda p, u: (p + u).astype(p.dtype),
                                  params, updates)


def _zeros_like(params):
    return jax.tree_util.tree_map(jnp.zeros_like, params)


def _map_split(one, n_out, grads, *trees):
    """tree_map ``one`` over (grads, *trees) and split the per-leaf output
    tuples into ``n_out`` trees. Multi-tree tree_map also ENFORCES that the
    state/param treedefs match grads' (the old flatten/zip silently relied
    on leaf order)."""
    packed = jax.tree_util.tree_map(lambda *leaves: one(*leaves),
                                    grads, *trees)
    tdef = jax.tree_util.tree_structure(grads)
    flat = tdef.flatten_up_to(packed)
    return tuple(tdef.unflatten([leaf[i] for leaf in flat])
                 for i in range(n_out))


def sgd(lr: float = 1e-3, momentum: float = 0.0, dampening: float = 0.0,
        weight_decay: float = 0.0, nesterov: bool = False,
        lr_decay: float = 0.0) -> Optimizer:
    """torch optim.sgd. The reference passes lr/momentum from the CLI
    (train.lua:189-192; defaults lr=0.02, momentum=0)."""

    def init(params):
        return {"step": jnp.zeros((), jnp.int32), "mom": _zeros_like(params)}

    def update(grads, state, params):
        step = state["step"]
        clr = lr / (1.0 + step.astype(jnp.float32) * lr_decay)

        def one(g, p, m):
            if weight_decay != 0.0:
                g = g + weight_decay * p
            if momentum != 0.0:
                m = momentum * m + (1.0 - dampening) * g
                d = g + momentum * m if nesterov else m
            else:
                d = g
            return -clr * d, m

        updates, new_mom = _map_split(one, 2, grads, params, state["mom"])
        return updates, {"step": step + 1, "mom": new_mom}

    return Optimizer(init, update)


def adagrad(lr: float = 1e-2, lr_decay: float = 0.0,
            weight_decay: float = 0.0, eps: float = 1e-10) -> Optimizer:
    """torch optim.adagrad (default lr 1e-2)."""

    def init(params):
        return {"step": jnp.zeros((), jnp.int32), "acc": _zeros_like(params)}

    def update(grads, state, params):
        step = state["step"]
        clr = lr / (1.0 + step.astype(jnp.float32) * lr_decay)

        def one(g, p, a):
            # torch optim.adagrad accumulates the weight-decayed gradient;
            # update and accumulator derive from the same decayed g
            if weight_decay != 0.0:
                g = g + weight_decay * p
            a = a + g * g
            return -clr * g / (jnp.sqrt(a) + eps), a

        updates, acc = _map_split(one, 2, grads, params, state["acc"])
        return updates, {"step": step + 1, "acc": acc}

    return Optimizer(init, update)


def adadelta(rho: float = 0.9, eps: float = 1e-6,
             weight_decay: float = 0.0) -> Optimizer:
    """torch optim.adadelta (rho=0.9, eps=1e-6, no lr)."""

    def init(params):
        return {"acc_g": _zeros_like(params), "acc_d": _zeros_like(params)}

    def update(grads, state, params):
        def one(g, p, ag, ad):
            if weight_decay != 0.0:
                g = g + weight_decay * p
            ag = rho * ag + (1.0 - rho) * g * g
            d = -jnp.sqrt(ad + eps) / jnp.sqrt(ag + eps) * g
            ad = rho * ad + (1.0 - rho) * d * d
            return d, ag, ad

        updates, ag, ad = _map_split(one, 3, grads, params,
                                     state["acc_g"], state["acc_d"])
        return updates, {"acc_g": ag, "acc_d": ad}

    return Optimizer(init, update)


def adam(lr: float = 1e-3, b1: float = 0.9, b2: float = 0.999,
         eps: float = 1e-8, weight_decay: float = 0.0) -> Optimizer:
    """torch optim.adam (lr=1e-3, betas 0.9/0.999, eps=1e-8) — the default
    optimizer for D, G (train.lua:37-38) and R (train_r.lua:170)."""

    def init(params):
        return {"step": jnp.zeros((), jnp.int32),
                "m": _zeros_like(params), "v": _zeros_like(params)}

    def update(grads, state, params):
        step = state["step"] + 1
        t = step.astype(jnp.float32)
        # torch formulation: stepSize = lr * sqrt(1-b2^t) / (1-b1^t)
        step_size = lr * jnp.sqrt(1.0 - b2 ** t) / (1.0 - b1 ** t)

        def one(g, p, m, v):
            if weight_decay != 0.0:
                g = g + weight_decay * p
            m = b1 * m + (1.0 - b1) * g
            v = b2 * v + (1.0 - b2) * g * g
            return -step_size * m / (jnp.sqrt(v) + eps), m, v

        updates, m, v = _map_split(one, 3, grads, params,
                                   state["m"], state["v"])
        return updates, {"step": step, "m": m, "v": v}

    return Optimizer(init, update)


def adamax(lr: float = 2e-3, b1: float = 0.9, b2: float = 0.999,
           eps: float = 1e-38, weight_decay: float = 0.0) -> Optimizer:
    """torch optim.adamax (lr=2e-3, eps=1e-38; infinity-norm variant)."""

    def init(params):
        return {"step": jnp.zeros((), jnp.int32),
                "m": _zeros_like(params), "u": _zeros_like(params)}

    def update(grads, state, params):
        step = state["step"] + 1
        t = step.astype(jnp.float32)
        step_size = lr / (1.0 - b1 ** t)

        def one(g, p, m, u):
            if weight_decay != 0.0:
                g = g + weight_decay * p
            m = b1 * m + (1.0 - b1) * g
            u = jnp.maximum(b2 * u, jnp.abs(g) + eps)
            return -step_size * m / u, m, u

        updates, m, u = _map_split(one, 3, grads, params,
                                   state["m"], state["u"])
        return updates, {"step": step, "m": m, "u": u}

    return Optimizer(init, update)


def rmsprop(lr: float = 1e-2, alpha: float = 0.99, eps: float = 1e-8,
            weight_decay: float = 0.0) -> Optimizer:
    """torch optim.rmsprop (lr=1e-2, alpha=0.99, eps=1e-8)."""

    def init(params):
        return {"ms": _zeros_like(params)}

    def update(grads, state, params):
        def one(g, p, ms):
            if weight_decay != 0.0:
                g = g + weight_decay * p
            ms = alpha * ms + (1.0 - alpha) * g * g
            return -lr * g / (jnp.sqrt(ms) + eps), ms

        updates, ms = _map_split(one, 2, grads, params, state["ms"])
        return updates, {"ms": ms}

    return Optimizer(init, update)


def make_optimizer(method: str, *, sgd_lr: float = 0.02,
                   sgd_momentum: float = 0.0) -> Optimizer:
    """The adversarial.lua:147-188 dispatch table. Only sgd takes CLI
    hyperparameters (train.lua:189-192); the rest use torch defaults."""
    if method == "sgd":
        return sgd(lr=sgd_lr, momentum=sgd_momentum)
    if method == "adagrad":
        return adagrad()
    if method == "adadelta":
        return adadelta()
    if method == "adamax":
        return adamax()
    if method == "adam":
        return adam()
    if method == "rmsprop":
        return rmsprop()
    raise ValueError(f"Unknown optimizer method {method!r}")
