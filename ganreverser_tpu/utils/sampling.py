"""G/D sampling conveniences — the NN_UTILS helpers (utils/nn_utils.lua)
as library functions (the CLIs use these; exposed for API parity):

  create_images_from_noise  <- nn_utils.createImagesFromNoise (:57-81)
  create_images             <- nn_utils.createImages (:87-89)
  sort_images_by_prediction <- nn_utils.sortImagesByPrediction (:101-129)
  to_batch / to_image_tensor<- nn_utils.toBatch/toImageTensor (:248-307)
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..analysis.batched import forward_batched
from ..core.prng import noise_inputs
from ..models.modules import Module


def create_images_from_noise(G: Module, g_variables: dict,
                             noise: jax.Array,
                             batch_size: int = 256) -> jax.Array:
    """Batched G forward over HBM-resident noise (eval mode)."""
    @jax.jit
    def fwd(z):
        y, _ = G.apply(g_variables, z, train=False)
        return y
    return forward_batched(fwd, noise, batch_size)


def create_images(G: Module, g_variables: dict, n: int, *, noise_dim: int,
                  noise_method: str, key: jax.Array,
                  batch_size: int = 256) -> jax.Array:
    z = noise_inputs(key, n, noise_dim, noise_method)
    return create_images_from_noise(G, g_variables, z, batch_size)


def sort_images_by_prediction(D: Module, d_variables: dict,
                              images: jax.Array, *, ascending: bool = False,
                              nb_max_out: Optional[int] = None,
                              batch_size: int = 256):
    """Rank images by D's realness score. Descending (default) starts with
    the most 'real' images (nn_utils.lua:91-129). Returns
    (sorted_images, sorted_predictions), truncated to nb_max_out."""
    @jax.jit
    def rate(x):
        y, _ = D.apply(d_variables, x, train=False)
        return y.reshape(-1)

    preds = forward_batched(rate, images, batch_size)
    order = jnp.argsort(preds if ascending else -preds, stable=True)
    if nb_max_out is not None:
        order = order[:nb_max_out]
    return jnp.take(images, order, axis=0), jnp.take(preds, order)


def to_batch(image: np.ndarray) -> np.ndarray:
    """Add a leading batch dim (nn_utils.toBatch)."""
    return np.asarray(image)[None]


def to_image_tensor(images, force_channel: bool = False) -> np.ndarray:
    """Coerce a list/array of images to one (N, H, W, C) array
    (nn_utils.toImageTensor; NHWC here instead of NCHW)."""
    arr = np.stack([np.asarray(im) for im in images]) \
        if isinstance(images, (list, tuple)) else np.asarray(images)
    if force_channel and arr.ndim == 3:
        arr = arr[..., None]
    return arr
