"""Loss criteria — nn.BCECriterion (train.lua:174) and nn.MSECriterion
(train_r.lua:122), both size-averaged like torch."""
from __future__ import annotations

import jax.numpy as jnp

# torch BCECriterion clamps log terms; we clamp probabilities instead.
_EPS = 1e-7


def bce(outputs: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Binary cross-entropy on probabilities (D ends in Sigmoid), mean over
    the batch."""
    o = jnp.clip(outputs.astype(jnp.float32), _EPS, 1.0 - _EPS)
    t = targets.astype(jnp.float32)
    return -jnp.mean(t * jnp.log(o) + (1.0 - t) * jnp.log(1.0 - o))


def mse(outputs: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Mean squared error, averaged over all elements (torch sizeAverage)."""
    d = outputs.astype(jnp.float32) - targets.astype(jnp.float32)
    return jnp.mean(d * d)
