"""Unit tests for the pretrainer building blocks and state creation."""
import jax
import jax.numpy as jnp
import numpy as np

from ganreverser_tpu import models as M
from ganreverser_tpu import optim as O
from ganreverser_tpu import train as T


def test_paired_noise_prefix_copy(key):
    """Shared leading components copied from the prev noise
    (pretrain_with_previous_net.lua:150-159)."""
    prev_z, new_z = T.paired_noise(key, 8, new_nd=12, new_method="normal",
                                   prev_nd=5, prev_method="uniform")
    assert prev_z.shape == (8, 5) and new_z.shape == (8, 12)
    np.testing.assert_allclose(np.asarray(new_z[:, :5]),
                               np.asarray(prev_z))
    # prev is uniform in [-1,1]
    assert float(jnp.abs(prev_z).max()) <= 1.0
    # shrinking case: new smaller than prev
    prev_z, new_z = T.paired_noise(key, 4, new_nd=3, new_method="normal",
                                   prev_nd=6, prev_method="normal")
    np.testing.assert_allclose(np.asarray(new_z),
                               np.asarray(prev_z[:, :3]))


def test_autoencoder_decoder_extraction(key):
    enc = M.create_G_encoder((1, 8, 8), 4)
    dec = M.create_G((1, 8, 8), 4)
    AE = T.make_autoencoder(enc, dec)
    v, out_shape = AE.init(key, (8, 8, 1))
    assert out_shape == (8, 8, 1)  # reconstruction
    dec_vars = T.decoder_variables(v)
    # decoder vars drive create_G standalone
    y, _ = dec.apply(dec_vars, jnp.zeros((2, 4)))
    assert y.shape == (2, 8, 8, 1)


def test_create_train_state_single_program(key):
    """create_train_state == eager init (same fold_in keys), one program."""
    R = M.create_R((1, 8, 8), 4, "normal")
    ts = T.create_train_state(R, O.adam(), key, (8, 8, 1))
    v_ref, _ = R.init(key, (8, 8, 1))
    for a, b in zip(jax.tree_util.tree_leaves(ts.params),
                    jax.tree_util.tree_leaves(v_ref["params"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
    assert int(ts.step) == 0
