"""Deeper module-level unit tests: layer math vs closed forms, dropout
semantics, pooling/upsampling values, preemption guard, prefetch sharding."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ganreverser_tpu import models as M
from ganreverser_tpu.io.preemption import PreemptionGuard


def test_conv_same_padding_values(key):
    """3x3 SAME conv with an identity-ish kernel reproduces shifts."""
    conv = M.Conv(1, 3)
    v, _ = conv.init(key, (4, 4, 1))
    # kernel that picks the left neighbor: W[1,0,0,0]=1, else 0
    k = np.zeros((3, 3, 1, 1), np.float32)
    k[1, 0, 0, 0] = 1.0
    v = {"params": {"kernel": jnp.asarray(k),
                    "bias": jnp.zeros((1,))}, "state": {}}
    x = jnp.arange(16.0).reshape(1, 4, 4, 1)
    y, _ = conv.apply(v, x)
    # output[i,j] = x[i, j-1], zero at the left edge
    np.testing.assert_allclose(np.asarray(y[0, 1, 1:, 0]),
                               np.asarray(x[0, 1, :-1, 0]))
    assert float(y[0, 1, 0, 0]) == 0.0


def test_maxpool_avgpool_values():
    x = jnp.asarray(np.arange(16.0).reshape(1, 4, 4, 1))
    my, _ = M.MaxPool(2).apply({}, x)
    ay, _ = M.AvgPool(2).apply({}, x)
    assert my.shape == (1, 2, 2, 1)
    assert float(my[0, 0, 0, 0]) == 5.0           # max of [[0,1],[4,5]]
    assert float(ay[0, 0, 0, 0]) == 2.5           # mean of same


def test_upsample_nearest_values():
    x = jnp.asarray([[1.0, 2.0], [3.0, 4.0]]).reshape(1, 2, 2, 1)
    y, _ = M.UpsampleNearest(2).apply({}, x)
    assert y.shape == (1, 4, 4, 1)
    np.testing.assert_allclose(np.asarray(y[0, :2, :2, 0]), 1.0)
    np.testing.assert_allclose(np.asarray(y[0, 2:, 2:, 0]), 4.0)


def test_prelu_shared_scalar(key):
    p = M.PReLU()
    v, _ = p.init(key, (4,))
    assert v["params"]["alpha"].shape == (1,)
    assert float(v["params"]["alpha"][0]) == 0.25  # torch default
    y, _ = p.apply(v, jnp.asarray([-2.0, 3.0]))
    np.testing.assert_allclose(np.asarray(y), [-0.5, 3.0])


def test_spatial_dropout_drops_whole_channels(key):
    sd = M.SpatialDropout(0.5)
    x = jnp.ones((4, 8, 8, 16))
    y, _ = sd.apply({}, x, train=True, rng=key)
    y = np.asarray(y)
    # each (sample, channel) map is either all zero or all 2.0
    per_map = y.reshape(4, 64, 16)
    for n in range(4):
        for c in range(16):
            vals = np.unique(per_map[n, :, c])
            assert len(vals) == 1 and vals[0] in (0.0, 2.0)


def test_dropout_scaling_preserves_mean(key):
    d = M.Dropout(0.5)
    x = jnp.ones((10000,))
    y, _ = d.apply({}, x, train=True, rng=key)
    assert float(jnp.mean(y)) == pytest.approx(1.0, abs=0.05)
    # eval = identity without rng
    y2, _ = d.apply({}, x, train=False)
    assert np.allclose(np.asarray(y2), 1.0)


def test_elu_activation():
    a = M.Activation("elu")
    y, _ = a.apply({}, jnp.asarray([-1.0, 2.0]))
    np.testing.assert_allclose(np.asarray(y), [np.expm1(-1.0), 2.0],
                               rtol=1e-6)


def test_leaky_relu_slope():
    a = M.Activation("leaky_relu")  # createResidual's 0.333 slope
    y, _ = a.apply({}, jnp.asarray([-3.0]))
    assert float(y[0]) == pytest.approx(-0.999)


def test_preemption_guard_flag():
    g = PreemptionGuard(signals=())
    assert not g.should_stop
    g.trigger()
    assert g.should_stop
    g.restore()


def test_prefetch_with_sharding():
    from ganreverser_tpu import parallel as par
    from ganreverser_tpu.data import prefetch_to_device
    mesh = par.make_mesh()
    sharding = par.data_sharding(mesh, 2)
    batches = list(prefetch_to_device(
        lambda i: np.ones((16, 4), np.float32) * i, 3, sharding=sharding))
    assert len(batches) == 3
    assert batches[2].sharding == sharding
    assert float(batches[1][0, 0]) == 1.0
