"""Model zoo tests: output shapes, parameter counts vs the exact reference
architectures (SURVEY.md §2.2), and behavioral details (fixer dropout always
on, tanh head only for uniform noise)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ganreverser_tpu import models as M

DIMS = (3, 32, 32)  # (C, H, W), reference default geometry
ND = 32


def _init_apply(model, key, x, **kw):
    variables, out_shape = model.init(key, tuple(x.shape[1:]))
    y, new_state = model.apply(variables, x, **kw)
    return variables, y, out_shape


def test_G_shapes(key):
    g = M.create_G(DIMS, ND)
    z = jnp.zeros((4, ND))
    variables, y, out_shape = _init_apply(g, key, z)
    assert y.shape == (4, 32, 32, 3)
    assert out_shape == (32, 32, 3)
    # sigmoid output in [0, 1] (models.lua:133)
    assert float(y.min()) >= 0.0 and float(y.max()) <= 1.0


def test_G_param_count(key):
    """G3 at 3x32x32, z=32. Exact arithmetic from models.lua:104-143:
    Linear(32, 512*8*8) + BN + conv(512->256,3) + BN + conv(256->128,3) + BN
    + conv(128->3,3)."""
    g = M.create_G(DIMS, ND)
    variables, _ = g.init(key, (ND,))
    n = M.count_parameters(variables["params"])
    expected = (
        (32 * 512 * 64 + 512 * 64) + 2 * 512 * 64        # linear + BN
        + (512 * 256 * 9 + 256) + 2 * 256                # conv1 + BN
        + (256 * 128 * 9 + 128) + 2 * 128                # conv2 + BN
        + (128 * 3 * 9 + 3)                              # out conv
    )
    assert n == expected


def test_D_shapes(key):
    d = M.create_D(DIMS)
    x = jnp.zeros((4, 32, 32, 3))
    _, y, _ = _init_apply(d, key, x)
    assert y.shape == (4, 1)
    assert float(y.min()) >= 0.0 and float(y.max()) <= 1.0


def test_D_param_count(key):
    """D2 at 3x32x32 (models.lua:272-337). PReLU adds 1 shared param each."""
    d = M.create_D(DIMS)
    variables, _ = d.init(key, (32, 32, 3))
    n = M.count_parameters(variables["params"])
    expected = (
        (3 * 128 * 9 + 128) + 1                      # stem conv1 + prelu
        + (128 * 128 * 9 + 128) + 1                  # stem conv2 + prelu
        + (128 * 64 * 25 + 64) + 1                   # left 5x5 conv + prelu
        + (64 * 8 * 8 * 512 + 512) + 1               # left linear + prelu (View(64*(H/4)*(W/4)), models.lua:299-300)
        + (128 * 128 * 9 + 128) + 1                  # right conv1 + prelu
        + (128 * 256 * 9 + 256) + 1                  # right conv2 + prelu
        + (256 * 256 * 9 + 256) + 1                  # right conv3 + prelu
        + (256 * 4 * 4 * 512 + 512) + 1              # right linear + prelu
        + (1024 * 256 + 256) + 1                     # merge linear + prelu
        + (256 * 1 + 1)                              # out
    )
    assert n == expected


def test_R_shapes_and_tanh_rule(key):
    x = jnp.zeros((2, 32, 32, 3))
    r_norm = M.create_R(DIMS, ND, "normal")
    _, y, _ = _init_apply(r_norm, key, x)
    assert y.shape == (2, ND)

    # uniform noise appends Tanh (models.lua:452-454)
    r_uni = M.create_R(DIMS, ND, "uniform")
    variables, _ = r_uni.init(key, (32, 32, 3))
    big = jnp.ones((2, 32, 32, 3)) * 100
    y, _ = r_uni.apply(variables, big)
    assert float(jnp.abs(y).max()) <= 1.0


def test_R_fixer_dropout_always_on(key):
    """The fixer-R's input dropout stays active even in eval
    (models.lua:399-406)."""
    r = M.create_R(DIMS, ND, "normal", fixer=True)
    variables, _ = r.init(key, (32, 32, 3))
    x = jnp.ones((2, 32, 32, 3))
    y1, _ = r.apply(variables, x, train=False, rng=jax.random.PRNGKey(1))
    y2, _ = r.apply(variables, x, train=False, rng=jax.random.PRNGKey(2))
    assert not np.allclose(np.asarray(y1), np.asarray(y2))
    # non-fixer eval is deterministic and needs no rng
    r0 = M.create_R(DIMS, ND, "normal", fixer=False)
    v0, _ = r0.init(key, (32, 32, 3))
    a, _ = r0.apply(v0, x, train=False)
    b, _ = r0.apply(v0, x, train=False)
    assert np.allclose(np.asarray(a), np.asarray(b))


def test_G_encoder(key):
    enc = M.create_G_encoder(DIMS, ND)
    x = jnp.zeros((2, 32, 32, 3))
    _, y, _ = _init_apply(enc, key, x)
    assert y.shape == (2, ND)
    assert float(jnp.abs(y).max()) <= 1.0  # tanh head (models.lua:92)


def test_unused_variants(key):
    """Inventory parity: G4 / D_default / D_facegen / residual all build and
    run (models.lua:145-194, 213-270, 339-383, 8-55)."""
    g4 = M.create_G4(DIMS, ND)
    z = jnp.zeros((2, ND))
    _, y, _ = _init_apply(g4, key, z)
    assert y.shape == (2, 32, 32, 3)

    for maker in (M.create_D_default, M.create_D_facegen):
        d = maker(DIMS)
        x = jnp.zeros((2, 32, 32, 3))
        _, y, _ = _init_apply(d, key, x)
        assert y.shape == (2, 1)

    res = M.create_residual(8, 4, 16, "PReLU", True)
    x = jnp.zeros((2, 8, 8, 8))
    _, y, _ = _init_apply(res, key, x)
    assert y.shape == (2, 8, 8, 16)
    # same-channel residual uses identity shortcut
    res2 = M.create_residual(8, 8, 8, "LeakyReLU", False)
    _, y2, _ = _init_apply(res2, key, x)
    assert y2.shape == (2, 8, 8, 8)


def test_batchnorm_state_updates(key):
    bn = M.BatchNorm(4)
    variables, _ = bn.init(key, (4,))
    x = jnp.ones((16, 4)) * 3.0
    y, new_state = bn.apply(variables, x, train=True)
    # running mean moved toward batch mean 3.0 with momentum 0.1
    assert np.allclose(np.asarray(new_state["mean"]), 0.3, atol=1e-6)
    # eval mode uses running stats, doesn't update
    y2, s2 = bn.apply(variables, x, train=False)
    assert np.allclose(np.asarray(s2["mean"]), 0.0)


def test_jit_forward(key):
    """Everything must trace once and compile (static shapes)."""
    g = M.create_G(DIMS, ND)
    variables, _ = g.init(key, (ND,))

    @jax.jit
    def fwd(v, z):
        y, _ = g.apply(v, z)
        return y

    z = jax.random.normal(key, (8, ND))
    y = fwd(variables, z)
    assert y.shape == (8, 32, 32, 3)
