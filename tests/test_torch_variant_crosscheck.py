"""Assembled-model torch crosscheck for the zoo's VARIANT architectures.

test_torch_model_crosscheck.py closes the wiring surface for the flagship
G3/D2/R; this file does the same for the remaining reference models —
built for inventory parity and exercised by tests only:

* G4        (models.lua:145-194): 32 parallel branches, channel-concat
* G_encoder (models.lua:57-102): pretrain_g's conv encoder
* D_default (models.lua:213-270)
* D_facegen (models.lua:339-383)
* createResidual (models.lua:8-55): inner path + shortcut sum

Each is rebuilt as an independent PyTorch NCHW forward with weights copied
from the JAX pytrees; eval-mode outputs must match. Same layout bridge as
the flagship file: NCHW<->NHWC permutes, (H, W, C) flatten order,
HWIO->OIHW kernel copies.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
F = torch.nn.functional

from ganreverser_tpu.models import zoo as Z
from ganreverser_tpu.core.prng import seed_key


def _t(x):
    return torch.tensor(np.asarray(x, np.float32))


def _nchw(x):
    return _t(np.transpose(np.asarray(x, np.float32), (0, 3, 1, 2)))


def _conv(x, p, pad):
    w = _t(p["kernel"]).permute(3, 2, 0, 1)  # HWIO -> OIHW
    return F.conv2d(x, w, _t(p["bias"]), padding=pad)


def _bn(x, params, state):
    return F.batch_norm(x, _t(state["mean"]), _t(state["var"]),
                        _t(params["scale"]), _t(params["bias"]),
                        training=False, eps=1e-5)


def _prelu(x, p):
    return F.prelu(x, _t(p["alpha"]))


def _linear(x, p):
    return F.linear(x, _t(p["kernel"]).T, _t(p["bias"]))


def _flatten_nhwc(x):
    return x.permute(0, 2, 3, 1).reshape(x.shape[0], -1)


def _randomized_state(variables, key):
    """Eval-mode BN with non-trivial running stats (fresh-init 0/1 stats
    would hide scale/shift mix-ups)."""
    def rand_like(leaf):
        nonlocal key
        key, sub = jax.random.split(key)
        return jax.random.uniform(sub, leaf.shape, jnp.float32, 0.2, 1.5)
    state = jax.tree_util.tree_map(rand_like, variables["state"])
    return {"params": variables["params"], "state": state}


def _amplify_kernels(variables, factor):
    """BN-free sigmoid discriminators pin near 0.5 at random init; scaling
    kernels inflates logits so wiring errors are visible (PReLU is
    positively homogeneous — the function stays well-conditioned)."""
    def scale(path, leaf):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        return leaf * factor if name == "kernel" else leaf
    params = jax.tree_util.tree_map_with_path(scale, variables["params"])
    return {"params": params, "state": variables["state"]}


# --- torch replicas --------------------------------------------------------

def torch_G4(variables, z):
    """models.lua:145-194: 32 branches (Linear 16 -> PReLU -> Linear 4096
    -> BN -> PReLU -> 16x16x16 maps -> up2 -> conv16 -> BN -> PReLU),
    nn.Concat(2) to 512 maps, conv64 + conv-C + Sigmoid."""
    p, s = variables["params"], variables["state"]
    bp, bs = p["l0"], s["l0"]
    outs = []
    for i in range(32):
        q, t = bp[f"b{i}"], bs[f"b{i}"]
        x = _prelu(_linear(_t(z), q["l0"]), q["l1"])
        x = _prelu(_bn(_linear(x, q["l2"]), q["l3"], t["l3"]), q["l4"])
        # Reshape((16, 16, 16)) is NHWC -> view then permute to NCHW
        x = x.view(-1, 16, 16, 16).permute(0, 3, 1, 2)
        x = F.interpolate(x, scale_factor=2, mode="nearest")
        x = _prelu(_bn(_conv(x, q["l7"], 1), q["l8"], t["l8"]), q["l9"])
        outs.append(x)
    x = torch.cat(outs, dim=1)  # channel concat == NHWC last-axis concat
    x = _prelu(_bn(_conv(x, p["l1"], 1), p["l2"], s["l2"]), p["l3"])
    return torch.sigmoid(_conv(x, p["l4"], 1))


def torch_G_encoder(variables, images):
    """models.lua:57-102: conv16/avgpool, conv32/maxpool, conv64/maxpool,
    Dense 512 + BN + ReLU, Dense nd + Tanh."""
    p, s = variables["params"], variables["state"]
    x = _nchw(images)
    x = F.avg_pool2d(F.relu(_bn(_conv(x, p["l0"], 1), p["l1"], s["l1"])), 2)
    x = F.max_pool2d(F.relu(_bn(_conv(x, p["l4"], 1), p["l5"], s["l5"])), 2)
    x = F.max_pool2d(F.relu(_bn(_conv(x, p["l8"], 1), p["l9"], s["l9"])), 2)
    x = _flatten_nhwc(x)
    x = F.relu(_bn(_linear(x, p["l13"]), p["l14"], s["l14"]))
    return torch.tanh(_linear(x, p["l16"]))


def torch_D_default(variables, images):
    """models.lua:213-270: five conv+PReLU stages (three avg-pools),
    Dense 512 -> Dense 1 -> Sigmoid (dropouts inert in eval)."""
    p = variables["params"]
    x = _nchw(images)
    x = _prelu(_conv(x, p["l0"], 1), p["l1"])
    x = _prelu(_conv(x, p["l2"], 1), p["l3"])
    x = F.avg_pool2d(_prelu(_conv(x, p["l5"], 1), p["l6"]), 2)
    x = F.avg_pool2d(_prelu(_conv(x, p["l9"], 1), p["l10"]), 2)
    x = F.avg_pool2d(_prelu(_conv(x, p["l13"], 1), p["l14"]), 2)
    x = _prelu(_linear(_flatten_nhwc(x), p["l18"]), p["l19"])
    return torch.sigmoid(_linear(x, p["l21"]))


def torch_D_facegen(variables, images):
    """models.lua:339-383: four conv+PReLU+avgpool stages, two Dense 512
    PReLU blocks, Dense 1 + Sigmoid."""
    p = variables["params"]
    x = _nchw(images)
    x = F.avg_pool2d(_prelu(_conv(x, p["l0"], 1), p["l1"]), 2)
    x = F.avg_pool2d(_prelu(_conv(x, p["l4"], 1), p["l5"]), 2)
    x = F.avg_pool2d(_prelu(_conv(x, p["l8"], 1), p["l9"]), 2)
    x = F.avg_pool2d(_prelu(_conv(x, p["l12"], 1), p["l13"]), 2)
    x = _flatten_nhwc(x)
    x = _prelu(_linear(x, p["l17"]), p["l18"])
    x = _prelu(_linear(x, p["l20"]), p["l21"])
    return torch.sigmoid(_linear(x, p["l23"]))


def _torch_res_chain(x, p, s, specs):
    """Run a Sequential of (conv-key, pad, bn-key) triples + ReLU."""
    for conv_key, pad, bn_key in specs:
        x = _conv(x, p[conv_key], pad)
        if bn_key is not None:
            x = _bn(x, p[bn_key], s[bn_key])
        x = F.relu(x)
    return x


def torch_residual_same(variables, x_nhwc):
    """createResidual(16,16,16): inner 2x [conv3x3+BN+ReLU], Identity
    shortcut, summed (models.lua:8-55, CAddTable)."""
    p, s = variables["params"], variables["state"]
    x = _nchw(x_nhwc)
    inner = _torch_res_chain(x, p["inner"], s["inner"],
                             [("l0", 1, "l1"), ("l3", 1, "l4")])
    return inner + x


def torch_residual_proj(variables, x_nhwc):
    """createResidual(8,4,16): 1x1 reduce, 2x conv3x3, 1x1 expand on the
    inner path; 1x1+BN+ReLU shortcut; summed."""
    p, s = variables["params"], variables["state"]
    x = _nchw(x_nhwc)
    inner = _torch_res_chain(
        x, p["inner"], s["inner"],
        [("l0", 0, "l1"), ("l3", 1, "l4"), ("l6", 1, "l7"),
         ("l9", 0, "l10")])
    short = _torch_res_chain(x, p["shortcut"], s["shortcut"],
                             [("l0", 0, "l1")])
    return inner + short


# --- tests -----------------------------------------------------------------

def test_G4_assembled_vs_torch():
    key = seed_key(11)
    G4 = Z.create_G4((3, 32, 32), 16)
    gv, _ = G4.init(jax.random.fold_in(key, 1), (16,))
    gv = _randomized_state(gv, jax.random.fold_in(key, 2))
    z = np.asarray(jax.random.normal(jax.random.fold_in(key, 3), (4, 16)))
    ours, _ = G4.apply(gv, jnp.asarray(z), train=False)
    theirs = torch_G4(gv, z).detach().numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(ours), theirs, rtol=1e-4,
                               atol=1e-4)


def test_G4_branch_order_detected():
    """The checker must catch a branch-order transposition (all branches
    are shape-identical, so swapping them preserves every shape)."""
    key = seed_key(11)
    G4 = Z.create_G4((3, 32, 32), 16)
    gv, _ = G4.init(jax.random.fold_in(key, 1), (16,))
    gv = _randomized_state(gv, jax.random.fold_in(key, 2))
    z = np.asarray(jax.random.normal(jax.random.fold_in(key, 3), (2, 16)))
    # amplify (identically on both sides) so the swap's signal clears the
    # sigmoid's flat region; random-init G4 logits sit near 0
    gv = _amplify_kernels(gv, 3.0)
    swapped = jax.tree_util.tree_map(lambda x: x, gv)
    b = dict(swapped["params"]["l0"])
    b["b0"], b["b1"] = b["b1"], b["b0"]
    swapped["params"] = dict(swapped["params"], l0=b)
    ours, _ = G4.apply(gv, jnp.asarray(z), train=False)
    theirs = torch_G4(swapped, z).detach().numpy().transpose(0, 2, 3, 1)
    assert np.max(np.abs(np.asarray(ours) - theirs)) > 1e-3


def test_G_encoder_assembled_vs_torch():
    key = seed_key(12)
    E = Z.create_G_encoder((3, 32, 32), 16)
    ev, _ = E.init(jax.random.fold_in(key, 1), (32, 32, 3))
    ev = _randomized_state(ev, jax.random.fold_in(key, 2))
    imgs = np.asarray(jax.random.uniform(jax.random.fold_in(key, 3),
                                         (4, 32, 32, 3)))
    ours, _ = E.apply(ev, jnp.asarray(imgs), train=False)
    theirs = torch_G_encoder(ev, imgs).detach().numpy()
    np.testing.assert_allclose(np.asarray(ours), theirs, rtol=1e-4,
                               atol=1e-4)


def test_D_default_assembled_vs_torch():
    key = seed_key(13)
    D = Z.create_D_default((3, 32, 32))
    dv, _ = D.init(jax.random.fold_in(key, 1), (32, 32, 3))
    dv = _amplify_kernels(dv, 3.0)
    imgs = np.asarray(jax.random.uniform(jax.random.fold_in(key, 2),
                                         (4, 32, 32, 3)))
    ours, _ = D.apply(dv, jnp.asarray(imgs), train=False)
    theirs = torch_D_default(dv, imgs).detach().numpy()
    np.testing.assert_allclose(np.asarray(ours), theirs, rtol=1e-4,
                               atol=1e-5)


def test_D_facegen_assembled_vs_torch():
    key = seed_key(14)
    D = Z.create_D_facegen((3, 32, 32))
    dv, _ = D.init(jax.random.fold_in(key, 1), (32, 32, 3))
    dv = _amplify_kernels(dv, 3.0)
    imgs = np.asarray(jax.random.uniform(jax.random.fold_in(key, 2),
                                         (4, 32, 32, 3)))
    ours, _ = D.apply(dv, jnp.asarray(imgs), train=False)
    theirs = torch_D_facegen(dv, imgs).detach().numpy()
    np.testing.assert_allclose(np.asarray(ours), theirs, rtol=1e-4,
                               atol=1e-5)


def test_residual_same_channels_vs_torch():
    key = seed_key(15)
    res = Z.create_residual(16, 16, 16)
    rv, _ = res.init(jax.random.fold_in(key, 1), (8, 8, 16))
    rv = _randomized_state(rv, jax.random.fold_in(key, 2))
    x = np.asarray(jax.random.normal(jax.random.fold_in(key, 3),
                                     (4, 8, 8, 16)))
    ours, _ = res.apply(rv, jnp.asarray(x), train=False)
    theirs = (torch_residual_same(rv, x).detach().numpy()
              .transpose(0, 2, 3, 1))
    np.testing.assert_allclose(np.asarray(ours), theirs, rtol=1e-4,
                               atol=1e-4)


def test_residual_projection_vs_torch():
    key = seed_key(16)
    res = Z.create_residual(8, 4, 16)
    rv, _ = res.init(jax.random.fold_in(key, 1), (8, 8, 8))
    rv = _randomized_state(rv, jax.random.fold_in(key, 2))
    x = np.asarray(jax.random.normal(jax.random.fold_in(key, 3),
                                     (4, 8, 8, 8)))
    ours, _ = res.apply(rv, jnp.asarray(x), train=False)
    theirs = (torch_residual_proj(rv, x).detach().numpy()
              .transpose(0, 2, 3, 1))
    np.testing.assert_allclose(np.asarray(ours), theirs, rtol=1e-4,
                               atol=1e-4)
