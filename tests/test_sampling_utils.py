"""Tests for the NN_UTILS-style sampling helpers and Confusion rendering."""
import jax
import jax.numpy as jnp
import numpy as np

from ganreverser_tpu import models as M
from ganreverser_tpu import utils as U
from ganreverser_tpu.train import Confusion
from ganreverser_tpu.core.prng import seed_key


def test_create_and_sort(key):
    G = M.create_G((1, 8, 8), 4)
    D = M.create_D((1, 8, 8))
    gv, _ = G.init(jax.random.fold_in(key, 1), (4,))
    dv, _ = D.init(jax.random.fold_in(key, 2), (8, 8, 1))

    imgs = U.create_images(G, gv, 10, noise_dim=4, noise_method="normal",
                           key=seed_key(5), batch_size=4)
    assert imgs.shape == (10, 8, 8, 1)

    s_imgs, preds = U.sort_images_by_prediction(D, dv, imgs, nb_max_out=5)
    assert s_imgs.shape == (5, 8, 8, 1)
    p = np.asarray(preds)
    assert np.all(p[:-1] >= p[1:])  # descending = most 'real' first
    _, p_asc = U.sort_images_by_prediction(D, dv, imgs, ascending=True)
    p_asc = np.asarray(p_asc)
    assert np.all(p_asc[:-1] <= p_asc[1:])


def test_coercion_helpers():
    im = np.zeros((4, 4, 1), np.float32)
    assert U.to_batch(im).shape == (1, 4, 4, 1)
    lst = [np.zeros((4, 4)), np.ones((4, 4))]
    t = U.to_image_tensor(lst, force_channel=True)
    assert t.shape == (2, 4, 4, 1)


def test_confusion_render():
    c = Confusion.zero()
    c = c.add_batch(jnp.array([0.9, 0.1, 0.8, 0.2]),
                    jnp.array([1.0, 0.0, 0.0, 1.0]))
    s = c.render()
    assert "ConfusionMatrix" in s and "0.5000" in s
