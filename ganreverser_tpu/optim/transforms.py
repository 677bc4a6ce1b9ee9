"""Gradient/loss transforms: clamp, L1, L2 — adversarial.lua:8-28.

Reference order per step (adversarial.lua:78-80): backward -> L1 -> L2 ->
clamp. The reference's L1 helper crashes when used (undefined ``l1Weight``
global, adversarial.lua:17 vs ``l1weight``:14) — fixed here, behavior as
evidently intended (SURVEY.md §7 hard part f).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def clamp_grads(grads, clamp_value: float):
    """adversarial.clamp (adversarial.lua:8-12): elementwise clip to
    [-clamp_value, +clamp_value]; 0 disables."""
    if clamp_value == 0:
        return grads
    return jax.tree_util.tree_map(
        lambda g: jnp.clip(g, -clamp_value, clamp_value), grads)


def l1_penalty(params, grads, loss, l1_weight: float):
    """adversarial.l1: loss += w*||p||_1; grad += w*sign(p)."""
    if l1_weight == 0:
        return grads, loss
    norm = sum(jnp.sum(jnp.abs(p)) for p in jax.tree_util.tree_leaves(params))
    grads = jax.tree_util.tree_map(
        lambda g, p: g + l1_weight * jnp.sign(p), grads, params)
    return grads, loss + l1_weight * norm


def l2_penalty(params, grads, loss, l2_weight: float):
    """adversarial.l2: loss += w*||p||_2^2/2; grad += w*p."""
    if l2_weight == 0:
        return grads, loss
    sq = sum(jnp.sum(p * p) for p in jax.tree_util.tree_leaves(params))
    grads = jax.tree_util.tree_map(
        lambda g, p: g + l2_weight * p, grads, params)
    return grads, loss + l2_weight * sq / 2.0


def regularize(params, grads, loss, l1_weight: float, l2_weight: float,
               clamp_value: float):
    """The full reference pipeline: L1 -> L2 -> clamp."""
    grads, loss = l1_penalty(params, grads, loss, l1_weight)
    grads, loss = l2_penalty(params, grads, loss, l2_weight)
    grads = clamp_grads(grads, clamp_value)
    return grads, loss
