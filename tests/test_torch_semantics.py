"""Hand-computed torch-semantics goldens (VERDICT r1 item 8).

Unlike tests/test_goldens.py (self-generated regression pins), every
expected value here is worked out BY HAND from the torch formulas the
reference relies on, so a systematic deviation (fan-in/fan-out swap, eps in
the wrong place, biased-vs-unbiased variance, momentum direction) fails
loudly. The arithmetic for each literal is in the comments.
"""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ganreverser_tpu import optim as O
from ganreverser_tpu.models import modules as nn
from ganreverser_tpu.models.init import scheme_std


def test_batchnorm_train_hand_golden():
    """nn.BatchNormalization, torch semantics: normalize with the BIASED
    batch variance; update running stats with momentum 0.1 and the UNBIASED
    variance estimate.

    x = [1, 2, 3] (one feature, batch 3):
      batch mean          = 2
      biased variance     = ((1-2)^2 + 0 + (3-2)^2) / 3 = 2/3
      unbiased variance   = 2/3 * 3/(3-1) = 1
      y_i = (x_i - 2) / sqrt(2/3 + 1e-5)
          = [-1.2247357, 0, +1.2247357]          (1/sqrt(0.6666767))
      new running mean    = 0.9*0 + 0.1*2 = 0.2
      new running var     = 0.9*1 + 0.1*1 = 1.0  (init var is 1)
    """
    bn = nn.BatchNorm(1)
    variables, _ = bn.init(jax.random.PRNGKey(0), (1,))
    x = jnp.array([[1.0], [2.0], [3.0]])
    y, state = bn.apply(variables, x, train=True)
    np.testing.assert_allclose(
        np.asarray(y).ravel(), [-1.2247357, 0.0, 1.2247357], atol=1e-6)
    np.testing.assert_allclose(float(state["mean"][0]), 0.2, atol=1e-7)
    np.testing.assert_allclose(float(state["var"][0]), 1.0, atol=1e-7)


def test_batchnorm_eval_hand_golden():
    """Eval mode uses the running statistics verbatim:
    running mean 0.2, running var 1.0, scale 2, bias -1:
      y(1.2) = 2*(1.2-0.2)/sqrt(1+1e-5) - 1 = 2/1.0000050 - 1 = 0.9999900
    """
    bn = nn.BatchNorm(1)
    variables = {"params": {"scale": jnp.array([2.0]),
                            "bias": jnp.array([-1.0])},
                 "state": {"mean": jnp.array([0.2]),
                           "var": jnp.array([1.0])}}
    y, _ = bn.apply(variables, jnp.array([[1.2]]), train=False)
    np.testing.assert_allclose(float(y[0, 0]), 0.99999, atol=1e-6)


def test_prelu_shared_slope_hand_golden():
    """nn.PReLU() — ONE shared slope, torch default a=0.25:
    [-2, 3, -0.4] -> [-0.5, 3, -0.1]."""
    p = nn.PReLU()
    variables, _ = p.init(jax.random.PRNGKey(0), (3,))
    assert variables["params"]["alpha"].shape == (1,)  # shared, not per-ch
    y, _ = p.apply(variables, jnp.array([-2.0, 3.0, -0.4]))
    np.testing.assert_allclose(np.asarray(y), [-0.5, 3.0, -0.1], atol=1e-7)


def test_elu_hand_golden():
    """nn.ELU() default alpha=1: y(-1) = e^-1 - 1 = -0.63212055;
    y(0.5) = 0.5."""
    y, _ = nn.Activation("elu").apply({}, jnp.array([-1.0, 0.5]))
    np.testing.assert_allclose(np.asarray(y), [-0.63212055, 0.5], atol=1e-7)


def test_init_scheme_bounds_hand_golden():
    """weight-init.lua formulas as uniform(-std, std) half-widths.
    conv 3x3, 4 -> 8 channels: fan_in = 4*9 = 36, fan_out = 8*9 = 72.
      heuristic     sqrt(1/(3*36))   = sqrt(1/108)  = 0.09622504
      xavier        sqrt(2/(36+72))  = sqrt(1/54)   = 0.13608276
      xavier_caffe  sqrt(1/36)                      = 0.16666667
      kaiming       sqrt(4/(36+72))  = sqrt(1/27)   = 0.19245009
    """
    assert math.isclose(scheme_std("heuristic", 36, 72), 0.09622504, rel_tol=1e-6)
    assert math.isclose(scheme_std("xavier", 36, 72), 0.13608276, rel_tol=1e-6)
    assert math.isclose(scheme_std("xavier_caffe", 36, 72), 0.16666667, rel_tol=1e-6)
    assert math.isclose(scheme_std("kaiming", 36, 72), 0.19245009, rel_tol=1e-6)
    # the draw respects the bound and is uniform (std ~ bound/sqrt(3))
    from ganreverser_tpu.models.init import init_conv
    p = init_conv(jax.random.PRNGKey(1), 4, 8, 3, "heuristic")
    w = np.asarray(p["kernel"])
    assert np.abs(w).max() <= 0.09622504
    assert abs(w.std() - 0.09622504 / math.sqrt(3)) < 0.01
    assert np.all(np.asarray(p["bias"]) == 0)  # weight-init.lua:70-72


def test_adam_first_step_hand_golden():
    """torch optim.adam, defaults lr=1e-3, b1=0.9, b2=0.999, eps=1e-8.
    One parameter, gradient g=1, step 1:
      m = 0.1*1 = 0.1;  v = 0.001*1 = 0.001
      stepSize = lr * sqrt(1-0.999^1) / (1-0.9^1)
               = 1e-3 * 0.031622777 / 0.1 = 3.1622777e-4
      update = -stepSize * m / (sqrt(v)+eps)
             = -3.1622777e-5 / (0.031622777 + 1e-8) = -9.9999968e-4
    (tolerance 2e-5 relative: the implementation computes 1-b2^t in f32)
    """
    opt = O.adam()
    params = {"w": jnp.array([0.0])}
    state = opt.init(params)
    updates, _ = opt.update({"w": jnp.array([1.0])}, state, params)
    np.testing.assert_allclose(float(updates["w"][0]), -9.9999968e-4,
                               rtol=2e-5)


def test_sgd_momentum_hand_golden():
    """torch optim.sgd: m_t = momentum*m + (1-dampening)*g; update -lr*m.
    lr=0.1, momentum=0.5, g=2 twice:
      step1: m = 2            -> update -0.2
      step2: m = 0.5*2 + 2 = 3 -> update -0.3
    """
    opt = O.sgd(lr=0.1, momentum=0.5)
    params = {"w": jnp.array([0.0])}
    state = opt.init(params)
    g = {"w": jnp.array([2.0])}
    u1, state = opt.update(g, state, params)
    u2, state = opt.update(g, state, params)
    np.testing.assert_allclose(float(u1["w"][0]), -0.2, atol=1e-7)
    np.testing.assert_allclose(float(u2["w"][0]), -0.3, atol=1e-7)


def test_two_layer_net_hand_golden():
    """End-to-end micro-golden with hand-set weights, eval mode.

    x = [2.0]
    Dense1: w = [[1, 2]], b = [0.5, -0.5]  ->  [2*1+0.5, 2*2-0.5] = [2.5, 3.5]
    ReLU: unchanged (both positive)
    Dense2: w = [[1], [-1]], b = [0.25]    ->  2.5 - 3.5 + 0.25   = -0.75
    """
    net = nn.Sequential([nn.Dense(2), nn.Activation("relu"), nn.Dense(1)])
    variables = {
        "params": {
            "l0": {"kernel": jnp.array([[1.0, 2.0]]),
                   "bias": jnp.array([0.5, -0.5])},
            "l2": {"kernel": jnp.array([[1.0], [-1.0]]),
                   "bias": jnp.array([0.25])}},
        "state": {}}
    y, _ = net.apply(variables, jnp.array([[2.0]]), train=False)
    np.testing.assert_allclose(float(y[0, 0]), -0.75, atol=1e-7)


def test_conv_same_padding_hand_golden():
    """3x3 SAME conv, single 1-valued center pixel in a 3x3 image, kernel
    all-ones, bias 0.1: output = 1.1 everywhere (every output position's
    window covers the center exactly once)."""
    conv = nn.Conv(1, 3)
    variables = {"params": {"kernel": jnp.ones((3, 3, 1, 1)),
                            "bias": jnp.array([0.1])}, "state": {}}
    x = jnp.zeros((1, 3, 3, 1)).at[0, 1, 1, 0].set(1.0)
    y, _ = conv.apply(variables, x)
    np.testing.assert_allclose(np.asarray(y), np.full((1, 3, 3, 1), 1.1),
                               atol=1e-6)


def test_torch_faithful_init_mode():
    """zoo ``init="torch"`` reproduces the reference's ACCIDENTAL initial
    distributions (weight-init.lua:52-68 matches 'nn.*' typenames at top
    level only — see models/init.py docstring):

    G3: cudnn convs keep torch default uniform(±1/sqrt(9*Ci)) — wider than
    heuristic's sqrt(1/(3*9*Ci)) by sqrt(3) — with zero (top-level) bias;
    the Linear is heuristic; BN scale ~ uniform(0,1).
    D2: nested convs/branch-Linears keep nonzero uniform default biases;
    top-level Linears are heuristic with zero bias.
    """
    from ganreverser_tpu import models as M
    key = jax.random.PRNGKey(3)

    G = M.create_G3((3, 32, 32), 32, init="torch")
    g_vars, _ = G.init(key, (32,))
    p = g_vars["params"]
    # l5 = first 3x3 conv (512 -> 256): fan_in = 9*512 = 4608
    w = np.asarray(p["l5"]["kernel"])
    heuristic_bound = math.sqrt(1.0 / (3 * 4608))   # 0.0085
    default_bound = math.sqrt(1.0 / 4608)           # 0.0147
    assert np.abs(w).max() > heuristic_bound        # NOT heuristic-init
    assert np.abs(w).max() <= default_bound         # torch default reset
    assert np.all(np.asarray(p["l5"]["bias"]) == 0)  # top-level bias zeroed
    # l0 Dense IS matched by w_init -> heuristic, fan_in = 32
    dw = np.asarray(p["l0"]["kernel"])
    assert np.abs(dw).max() <= math.sqrt(1.0 / (3 * 32)) + 1e-7
    # BN scale: old-torch reset uniform(0,1), not ones
    bn = np.asarray(p["l1"]["scale"])
    assert bn.min() >= 0.0 and bn.max() <= 1.0 and bn.std() > 0.1

    D = M.create_D2((3, 32, 32), init="torch")
    d_vars, _ = D.init(jax.random.fold_in(key, 1), (32, 32, 3))
    dp = d_vars["params"]
    # stem conv lives in a createNxN sub-Sequential -> untouched by w_init:
    # bias keeps torch's uniform(±1/sqrt(fan)) default (nonzero)
    stem_bias = np.asarray(dp["l0"]["l0"]["bias"])
    assert np.abs(stem_bias).max() > 0
    # left-branch Dense (nested in the Concat): nonzero bias too
    left_bias = np.asarray(dp["l3"]["b0"]["l3"]["bias"])
    assert np.abs(left_bias).max() > 0
    # top-level Linears matched by w_init: heuristic + zero bias
    assert np.all(np.asarray(dp["l4"]["bias"]) == 0)
    assert np.all(np.asarray(dp["l7"]["bias"]) == 0)

    # default mode is unchanged: zero biases + heuristic bound everywhere
    G_def = M.create_G3((3, 32, 32), 32)
    gd, _ = G_def.init(key, (32,))
    wd = np.asarray(gd["params"]["l5"]["kernel"])
    assert np.abs(wd).max() <= heuristic_bound + 1e-7
    assert np.all(np.asarray(gd["params"]["l1"]["scale"]) == 1.0)


def test_maxpool_floor_semantics():
    """nn.SpatialMaxPooling(2,2) on odd extent: torch floors (VALID),
    5x5 -> 2x2, trailing row/col dropped."""
    x = jnp.arange(25.0).reshape(1, 5, 5, 1)
    y, _ = nn.MaxPool(2).apply({}, x)
    # windows: [[0,1],[5,6]]->6, [[2,3],[7,8]]->8; [[10..16]]->16, 18
    np.testing.assert_allclose(np.asarray(y).reshape(2, 2),
                               [[6.0, 8.0], [16.0, 18.0]])
