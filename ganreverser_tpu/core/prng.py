"""PRNG-key discipline.

The reference seeds three RNGs (math.randomseed / torch.manualSeed /
cutorch.manualSeed, train.lua:58-59,98). Here a single ``jax.random`` key is
the only source of randomness; everything else folds in from it.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def seed_key(seed: int, impl: str = "threefry") -> jax.Array:
    """The framework-wide root key (replaces the reference's triple seeding).

    ``impl``: 'threefry' (default — deterministic across backends) or
    'rbg' (XLA's native RngBitGenerator). Every key derived by split/
    fold_in inherits the impl, so one root-key choice switches the WHOLE
    program's RNG. Measured on v5e (benchmarks/train_ablate.py, round 3):
    threefry mask generation costs the R training step 13.4 ms of 40.2
    (seven dropout layers, ~270M mask elements); rbg runs the same step
    in 26.8 ms — 1.50x. Trade-off: rbg streams are not guaranteed stable
    across backends/XLA versions. Defaults follow the measurements:
    train_r defaults to rbg (dropout-mask-bound — the 1.50x win);
    train keeps threefry (d/g steps measured RNG-insensitive,
    benchmarks/train_ablate.py) — ``--prng`` overrides either way."""
    # impl is ALWAYS pinned explicitly: bare PRNGKey(seed) follows the
    # jax_default_prng_impl config, so a JAX_DEFAULT_PRNG_IMPL=rbg in the
    # environment would silently defeat '--prng threefry' determinism
    if impl == "threefry":
        return jax.random.PRNGKey(seed, impl="threefry2x32")
    return jax.random.key(seed, impl=impl)


def noise_inputs(key: jax.Array, n: int, noise_dim: int, method: str = "normal",
                 dtype=jnp.float32) -> jax.Array:
    """Sample (n, noise_dim) latent vectors.

    Mirrors NN_UTILS.createNoiseInputs (utils/nn_utils.lua:39-51):
    ``normal`` ~ N(0, 1), ``uniform`` ~ U(-1, 1).
    """
    if method == "normal":
        return jax.random.normal(key, (n, noise_dim), dtype)
    if method == "uniform":
        return jax.random.uniform(key, (n, noise_dim), dtype, -1.0, 1.0)
    raise ValueError(f"Unknown noise method {method!r}")
