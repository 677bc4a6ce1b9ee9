"""Gradient-based latent refinement — the new inversion mode
(BASELINE.json config 5; impossible-ish in the Torch7 reference,
SURVEY.md §7 step 5).

Given target images and an initial guess z0 (e.g. R's output), optimize z
through the *frozen* G with adam on the per-image pixel MSE. The whole
optimization (all steps, all images) is one jitted XLA program driven by
``lax.fori_loop`` — no per-step host round trips.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..models.modules import Module


def make_refiner(G: Module, *, steps: int = 100, lr: float = 0.05,
                 b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8):
    """Returns jitted ``refine(g_variables, images, z0) -> (z, final_loss)``.

    final_loss is the per-image pixel MSE at the last step.
    """

    def refine(g_variables, images, z0):
        images = images.astype(jnp.float32)

        def per_image_loss(z):
            out, _ = G.apply(g_variables, z, train=False)
            d = out.astype(jnp.float32) - images
            return jnp.mean(d * d, axis=tuple(range(1, d.ndim)))

        def total_loss(z):
            return jnp.sum(per_image_loss(z))

        grad_fn = jax.grad(total_loss)

        def body(i, carry):
            z, m, v = carry
            g = grad_fn(z)
            m = b1 * m + (1 - b1) * g
            v = b2 * v + (1 - b2) * g * g
            t = (i + 1).astype(jnp.float32)
            step_size = lr * jnp.sqrt(1 - b2 ** t) / (1 - b1 ** t)
            z = z - step_size * m / (jnp.sqrt(v) + eps)
            return z, m, v

        z0 = z0.astype(jnp.float32)
        z, _, _ = jax.lax.fori_loop(
            0, steps, body, (z0, jnp.zeros_like(z0), jnp.zeros_like(z0)))
        return z, per_image_loss(z)

    return jax.jit(refine)
