"""The inversion/analysis pipelines of apply_r.lua, on-device.

Each function is the TPU-native equivalent of one numbered pipeline in
SURVEY.md §3.3. Image-assembly (grids, borders) stays on the host in the CLI;
everything O(N) runs on device.
"""
from __future__ import annotations

import functools
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.prng import noise_inputs
from ..models.modules import Module
from .batched import forward_batched


@functools.lru_cache(maxsize=64)
def _eval_program(net: Module, batch_size: int, needs_rng: bool):
    """Cached jitted ``(variables[, rng], x) -> net(x, train=False)`` over
    device-side chunks. Modules are frozen dataclasses (hashable), so the
    cache key is (architecture, batch_size): defining fresh jits/closures
    per call — the previous shape of this file — re-traced AND re-compiled
    the whole scan program on EVERY call (variables were baked in as
    constants), measured at 513 img/s where the cached program does 23k+
    (benchmarks/RESULTS.md round 2, config 4)."""
    if needs_rng:
        @jax.jit
        def run(variables, rng, x):
            def fwd(b):
                y, _ = net.apply(variables, b, train=False, rng=rng)
                return y
            return forward_batched(fwd, x, batch_size)
    else:
        @jax.jit
        def run(variables, x):
            def fwd(b):
                y, _ = net.apply(variables, b, train=False)
                return y
            return forward_batched(fwd, x, batch_size)
    return run


def variation_sweep(G: Module, g_variables: dict, *, noise_dim: int,
                    noise_method: str, key: jax.Array, nb_steps: int = 16,
                    batch_size: int = 256) -> jax.Array:
    """① latent-component sweep (apply_r.lua:115-138): one base noise vector
    repeated noise_dim*nb_steps times; row i varies component i over
    linspace(-3,3) for normal noise / (-1,1) for uniform."""
    lo, hi = (-1.0, 1.0) if noise_method == "uniform" else (-3.0, 3.0)
    steps = jnp.linspace(lo, hi, nb_steps)
    base = noise_inputs(key, 1, noise_dim, noise_method)[0]
    noise = jnp.tile(base, (noise_dim * nb_steps, 1))
    comp = jnp.repeat(jnp.arange(noise_dim), nb_steps)
    vals = jnp.tile(steps, (noise_dim,))
    rows = jnp.arange(noise_dim * nb_steps)
    noise = noise.at[rows, comp].set(vals)
    return _eval_program(G, batch_size, False)(g_variables, noise)


def generate_and_invert(G: Module, R: Module, g_variables: dict,
                        r_variables: dict, *, n: int, noise_dim: int,
                        noise_method: str, key: jax.Array,
                        batch_size: int = 1024,
                        r_fixer_variables: Optional[dict] = None,
                        R_fixer: Optional[Module] = None):
    """② generate N faces with G and recover their latents with R (and the
    fixer-R when given) — apply_r.lua:143-153, one device program each.

    Returns (noise, images, attributes[, attributes_fixer])."""
    k_noise, k_fix = jax.random.split(key)
    noise = noise_inputs(k_noise, n, noise_dim, noise_method)

    images = _eval_program(G, batch_size, False)(g_variables, noise)
    attributes = _eval_program(R, batch_size, False)(r_variables, images)
    if R_fixer is None:
        return noise, images, attributes

    attributes_fixer = _eval_program(R_fixer, batch_size, True)(
        r_fixer_variables, k_fix, images)
    return noise, images, attributes, attributes_fixer


def fix_images(G: Module, g_variables: dict, recovered_z: jax.Array,
               batch_size: int = 1024) -> jax.Array:
    """⑤ G∘R image fixing (apply_r.lua:324-352): re-generate from recovered
    latents. The reference pads to batch-of-2 because torch BN rejects
    batch-1 (apply_r.lua:331); here it's one large batched forward."""
    return _eval_program(G, batch_size, False)(g_variables, recovered_z)


@jax.jit
def anomaly_scores(images: jax.Array, fixed: jax.Array) -> jax.Array:
    """⑥ anomaly score = 1 - ||image - G(R_fixer(image))||_2 (euclidean over
    all pixels, apply_r.lua:360-369). Higher = more normal."""
    d = (images.astype(jnp.float32) - fixed.astype(jnp.float32)).reshape(
        images.shape[0], -1)
    return 1.0 - jnp.sqrt(jnp.sum(d * d, axis=1))


def anomaly_threshold(scores: jax.Array, quantile: float = 0.15) -> jax.Array:
    """The reference's threshold: element floor(N*q) of the ASCENDING sort,
    1-based (apply_r.lua:371-372) — i.e. sorted[floor(N*q)-1] 0-based."""
    n = scores.shape[0]
    idx = max(int(n * quantile) - 1, 0)
    return jnp.sort(scores)[idx]


def detect_anomalies(images: jax.Array, fixed: jax.Array,
                     quantile: float = 0.15):
    """Returns (scores, threshold, is_anomaly) — anomaly iff
    score <= threshold (apply_r.lua:374-377)."""
    scores = anomaly_scores(images, fixed)
    thr = anomaly_threshold(scores, quantile)
    return scores, thr, scores <= thr
