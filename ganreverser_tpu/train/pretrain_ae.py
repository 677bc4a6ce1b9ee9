"""Autoencoder warm-start for G — pretrain_g.lua as one jitted step.

G_encoder ∘ G(decoder) trained with MSE reconstruction on real images, adam
(pretrain_g.lua:85-89, 148-180). Only the DECODER's variables are saved as
``g_pretrained_<dims>_nd<z>`` (pretrain_g.lua:191-202 saves ``:get(2)``);
train.lua auto-loads that file when present (train.lua:148-157).
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from ..models.modules import Module, Sequential
from ..optim import Optimizer, adam, apply_updates, regularize
from .losses import mse
from .state import TrainState, merge_state


def make_autoencoder(G_encoder: Module, G_decoder: Module) -> Module:
    """nn.Sequential(G_ENCODER, G_DECODER) — pretrain_g.lua:85-89. The
    decoder's variables live under key 'l1' of the container."""
    return Sequential([G_encoder, G_decoder])


def decoder_variables(ae_variables: dict) -> dict:
    """Extract the decoder (``:get(2)``) for the g_pretrained checkpoint."""
    return {"params": ae_variables["params"]["l1"],
            "state": ae_variables["state"].get("l1", {})}


def make_ae_train_step(AE: Module, *, g_l1: float = 0.0, g_l2: float = 0.0,
                       g_clamp: float = 5.0,
                       opt: Optional[Optimizer] = None) -> Callable:
    """Jitted ``step(ts, images, key) -> (ts, loss)`` — MSE(AE(x), x)."""
    opt = opt or adam()

    def loss_fn(params, state, images, rng):
        out, new_state = AE.apply({"params": params, "state": state},
                                  images, train=True, rng=rng)
        return mse(out, images), new_state

    def step(ts: TrainState, images, key):
        (loss, new_state), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            ts.params, ts.state, images, key)
        grads, loss = regularize(ts.params, grads, loss, g_l1, g_l2, g_clamp)
        updates, opt_state = opt.update(grads, ts.opt_state, ts.params)
        return TrainState(params=apply_updates(ts.params, updates),
                          state=merge_state(ts.state, new_state),
                          opt_state=opt_state, step=ts.step + 1), loss

    return jax.jit(step)
