"""Weight-init statistics vs the four formulas (weight-init.lua:14-37) and
optimizer semantics vs torch/optim (SURVEY.md §4 unit tests)."""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ganreverser_tpu.models.init import scheme_std, init_dense, init_conv
from ganreverser_tpu import optim as O


@pytest.mark.parametrize("scheme,expected", [
    ("heuristic", math.sqrt(1 / (3 * 100))),
    ("xavier", math.sqrt(2 / (100 + 200))),
    ("xavier_caffe", math.sqrt(1 / 100)),
    ("kaiming", math.sqrt(4 / (100 + 200))),
])
def test_scheme_formulas(scheme, expected):
    assert scheme_std(scheme, 100, 200) == pytest.approx(expected)


def test_dense_init_stats(key):
    p = init_dense(key, 256, 512, "heuristic")
    std = scheme_std("heuristic", 256, 512)
    w = np.asarray(p["kernel"])
    assert w.shape == (256, 512)
    assert abs(w).max() <= std
    # uniform(-std, std) has sd std/sqrt(3)
    assert np.std(w) == pytest.approx(std / math.sqrt(3), rel=0.05)
    assert np.all(np.asarray(p["bias"]) == 0)  # weight-init.lua:70-72


def test_conv_init_fans(key):
    p = init_conv(key, 16, 32, 3, "xavier")
    std = scheme_std("xavier", 16 * 9, 32 * 9)
    w = np.asarray(p["kernel"])
    assert w.shape == (3, 3, 16, 32)
    assert abs(w).max() <= std


def _quad_loss(params):
    return sum(jnp.sum(p * p) for p in jax.tree_util.tree_leaves(params))


@pytest.mark.parametrize("method", ["sgd", "adagrad", "adadelta", "adamax",
                                    "adam", "rmsprop"])
def test_optimizers_descend(method):
    """Each optimizer reduces a quadratic (all six paths of
    adversarial.lua:147-188)."""
    opt = O.make_optimizer(method, sgd_lr=0.1)
    params = {"a": jnp.array([1.0, -2.0]), "b": jnp.array([[3.0]])}
    state = opt.init(params)
    loss0 = float(_quad_loss(params))
    for _ in range(50):
        grads = jax.grad(_quad_loss)(params)
        updates, state = opt.update(grads, state, params)
        params = O.apply_updates(params, updates)
    assert float(_quad_loss(params)) < loss0


def test_adam_matches_torch_formula():
    """First adam step: m=(1-b1)g, v=(1-b2)g², update = -lr*sqrt(1-b2)/(1-b1)
    * m/(sqrt(v)+eps) ≈ -lr*sign(g) for g≫eps."""
    opt = O.adam(lr=0.001)
    params = {"w": jnp.array([10.0])}
    state = opt.init(params)
    grads = {"w": jnp.array([5.0])}
    updates, state = opt.update(grads, state, params)
    assert float(updates["w"][0]) == pytest.approx(-0.001, rel=1e-3)


def test_sgd_momentum_matches_torch():
    """torch sgd with momentum: v = mu*v + g; x -= lr*v."""
    opt = O.sgd(lr=0.1, momentum=0.9)
    params = {"w": jnp.array([0.0])}
    state = opt.init(params)
    g = {"w": jnp.array([1.0])}
    u1, state = opt.update(g, state, params)
    assert float(u1["w"][0]) == pytest.approx(-0.1)
    u2, state = opt.update(g, state, params)
    assert float(u2["w"][0]) == pytest.approx(-0.1 * (0.9 * 1.0 + 1.0))


def test_adagrad_first_step():
    """x -= lr * g / (sqrt(g²) + eps) on step 1 (torch optim.adagrad)."""
    opt = O.adagrad(lr=0.5)
    params = {"w": jnp.array([1.0])}
    state = opt.init(params)
    u, _ = opt.update({"w": jnp.array([2.0])}, state, params)
    assert float(u["w"][0]) == pytest.approx(-0.5 * 2.0 / (2.0 + 1e-10),
                                             rel=1e-6)


def test_adadelta_first_step():
    """u = -sqrt(eps)/sqrt((1-rho)g²+eps) * g (torch optim.adadelta)."""
    opt = O.adadelta(rho=0.9, eps=1e-6)
    params = {"w": jnp.array([0.0])}
    state = opt.init(params)
    g = 3.0
    u, _ = opt.update({"w": jnp.array([g])}, state, params)
    import math
    expected = -math.sqrt(1e-6) / math.sqrt(0.1 * g * g + 1e-6) * g
    assert float(u["w"][0]) == pytest.approx(expected, rel=1e-5)


def test_adamax_first_step():
    """u = -(lr/(1-b1)) * (1-b1)g / max(b2*0, |g|+eps) = -lr*sign(g)."""
    opt = O.adamax(lr=0.002)
    params = {"w": jnp.array([0.0])}
    state = opt.init(params)
    u, _ = opt.update({"w": jnp.array([7.0])}, state, params)
    assert float(u["w"][0]) == pytest.approx(-0.002, rel=1e-5)


def test_rmsprop_first_step():
    """u = -lr*g/(sqrt((1-alpha)g²)+eps) (torch optim.rmsprop)."""
    opt = O.rmsprop(lr=0.01, alpha=0.99)
    params = {"w": jnp.array([0.0])}
    state = opt.init(params)
    g = 4.0
    u, _ = opt.update({"w": jnp.array([g])}, state, params)
    import math
    expected = -0.01 * g / (math.sqrt(0.01 * g * g) + 1e-8)
    assert float(u["w"][0]) == pytest.approx(expected, rel=1e-5)


def test_clamp_and_penalties():
    params = {"w": jnp.array([2.0, -3.0])}
    grads = {"w": jnp.array([10.0, -10.0])}
    out = O.clamp_grads(grads, 1.0)
    assert np.allclose(np.asarray(out["w"]), [1.0, -1.0])
    # clamp 0 disables (adversarial.lua:9)
    out = O.clamp_grads(grads, 0)
    assert np.allclose(np.asarray(out["w"]), [10.0, -10.0])

    g2, loss = O.l2_penalty(params, grads, 0.0, 0.5)
    # grad += w*p ; loss += w*||p||²/2
    assert np.allclose(np.asarray(g2["w"]), [11.0, -11.5])
    assert loss == pytest.approx(0.5 * 13 / 2)

    g1, loss = O.l1_penalty(params, grads, 0.0, 0.1)
    assert np.allclose(np.asarray(g1["w"]), [10.1, -10.1])
    assert loss == pytest.approx(0.5)


def test_regularize_order():
    """Reference order: L1 -> L2 -> clamp (adversarial.lua:78-80)."""
    params = {"w": jnp.array([100.0])}
    grads = {"w": jnp.array([0.5])}
    g, loss = O.regularize(params, grads, 0.0, l1_weight=0.0, l2_weight=0.01,
                           clamp_value=1.0)
    # 0.5 + 0.01*100 = 1.5, clamped to 1.0
    assert float(g["w"][0]) == pytest.approx(1.0)
