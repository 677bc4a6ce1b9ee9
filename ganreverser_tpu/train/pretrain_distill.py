"""Net2net distillation warm-start — pretrain_with_previous_net.lua.

Grow image size / noise dim / color space by distilling a previous {G, D}:
* new G mimics G_prev's outputs with MSE, where the new z's leading
  min(new_nd, prev_nd) components are copied from the prev z
  (pretrain_with_previous_net.lua:155-159, 185-211);
* new D mimics D_prev's *soft predictions* with BCE on half-real /
  half-G_prev batches (161-183, 213-242);
* color-space changes handled by converting G_prev outputs / D_prev inputs
  (167, 182) — conversion happens on the host (data.colorspace), images are
  fed in both spaces to the jitted step.

Saves ``pretrained_<dims>_nd<z>`` consumed by train.lua:127-138.
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from ..core.prng import noise_inputs
from ..models.modules import Module
from ..optim import adam, apply_updates, regularize
from .losses import bce, mse
from .state import TrainState, merge_state


def paired_noise(key, n: int, new_nd: int, new_method: str, prev_nd: int,
                 prev_method: str):
    """(prev_z, new_z) with the shared leading components copied
    (pretrain_with_previous_net.lua:150-159)."""
    k1, k2 = jax.random.split(key)
    prev_z = noise_inputs(k1, n, prev_nd, prev_method)
    new_z = noise_inputs(k2, n, new_nd, new_method)
    shared = min(new_nd, prev_nd)
    new_z = new_z.at[:, :shared].set(prev_z[:, :shared])
    return prev_z, new_z


def make_distill_g_step(G: Module, *, g_l1: float = 0.0, g_l2: float = 0.0,
                        g_clamp: float = 5.0, opt=None) -> Callable:
    """Jitted ``step(ts, new_z, target_images, key) -> (ts, loss)``:
    MSE(G(new_z), target_images) where target_images = colorspace-converted
    G_prev(prev_z)."""
    opt = opt or adam()

    def loss_fn(params, state, z, targets, rng):
        out, new_state = G.apply({"params": params, "state": state}, z,
                                 train=True, rng=rng)
        return mse(out, targets), new_state

    def step(ts: TrainState, z, targets, key):
        (loss, new_state), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            ts.params, ts.state, z, targets, key)
        grads, loss = regularize(ts.params, grads, loss, g_l1, g_l2, g_clamp)
        updates, opt_state = opt.update(grads, ts.opt_state, ts.params)
        return TrainState(params=apply_updates(ts.params, updates),
                          state=merge_state(ts.state, new_state),
                          opt_state=opt_state, step=ts.step + 1), loss

    return jax.jit(step)


def make_distill_d_step(D: Module, *, d_l1: float = 0.0, d_l2: float = 1e-4,
                        d_clamp: float = 1.0, opt=None) -> Callable:
    """Jitted ``step(ts, images, soft_targets, key) -> (ts, loss)``:
    BCE(D(images), D_prev's predictions)."""
    opt = opt or adam()

    def loss_fn(params, state, images, targets, rng):
        out, new_state = D.apply({"params": params, "state": state}, images,
                                 train=True, rng=rng)
        return bce(out.reshape(-1), targets.reshape(-1)), new_state

    def step(ts: TrainState, images, targets, key):
        (loss, new_state), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            ts.params, ts.state, images, targets, key)
        grads, loss = regularize(ts.params, grads, loss, d_l1, d_l2, d_clamp)
        updates, opt_state = opt.update(grads, ts.opt_state, ts.params)
        return TrainState(params=apply_updates(ts.params, updates),
                          state=merge_state(ts.state, new_state),
                          opt_state=opt_state, step=ts.step + 1), loss

    return jax.jit(step)
