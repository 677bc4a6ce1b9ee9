"""ops parity tests: every optimized op lands only with a reference-
composition equivalence test (SURVEY.md §7 step 7)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ganreverser_tpu import models as M
from ganreverser_tpu.ops import (upsample2_conv3x3,
                                 upsample2_conv3x3_reference)


@pytest.mark.parametrize("h,w,ci,co", [(4, 4, 3, 5), (8, 6, 7, 4),
                                       (16, 16, 8, 8)])
def test_upsample_conv_exact(key, h, w, ci, co):
    k1, k2, k3 = jax.random.split(key, 3)
    x = jax.random.normal(k1, (2, h, w, ci))
    kernel = jax.random.normal(k2, (3, 3, ci, co))
    bias = jax.random.normal(k3, (co,))
    ref = upsample2_conv3x3_reference(x, kernel, bias)
    out = upsample2_conv3x3(x, kernel, bias)
    assert out.shape == (2, 2 * h, 2 * w, co)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("h,w,ci,co", [(4, 4, 3, 5), (8, 6, 7, 4),
                                       (16, 16, 8, 8)])
def test_upsample_conv_dilated_exact(key, h, w, ci, co):
    """lhs-dilated single-conv formulation == naive repeat+conv (exact
    tap-aggregation equivalence, ops/upsample_conv.py)."""
    from ganreverser_tpu.ops.upsample_conv import upsample2_conv3x3_dilated
    k1, k2, k3 = jax.random.split(key, 3)
    x = jax.random.normal(k1, (2, h, w, ci))
    kernel = jax.random.normal(k2, (3, 3, ci, co))
    bias = jax.random.normal(k3, (co,))
    ref = upsample2_conv3x3_reference(x, kernel, bias)
    out = upsample2_conv3x3_dilated(x, kernel, bias)
    assert out.shape == (2, 2 * h, 2 * w, co)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("h,w,ci,co,pack,act", [
    (8, 8, 8, 3, (2, 4), "sigmoid"),
    (16, 16, 16, 3, (4, 8), "sigmoid"),
    (16, 8, 8, 1, (8, 8), None),
    (8, 16, 5, 4, (2, 2), "relu"),
    # R's Co=64 backbone shape (models.lua:409-423) at test scale — the
    # co64_packed A/B leg (tpu_kernel_check) rides this path with ELU
    (8, 8, 16, 8, (1, 2), "elu"),
])
def test_conv3x3_packed_exact(key, h, w, ci, co, pack, act):
    """Lane-packed small-Co conv (ops/pack_conv.py — the G s3 candidate):
    the strided block-kernel formulation == SAME conv3x3 + bias (+act),
    exactly (same taps, reassociated only across the block kernel's
    zero-padding)."""
    from ganreverser_tpu.ops.pack_conv import conv3x3_packed
    from ganreverser_tpu.ops.precision import conv_f32acc
    k1, k2, k3 = jax.random.split(key, 3)
    x = jax.random.normal(k1, (2, h, w, ci))
    kernel = jax.random.normal(k2, (3, 3, ci, co)) * 0.2
    bias = jax.random.normal(k3, (co,))
    ref = conv_f32acc(x, kernel, (1, 1), "SAME", None,
                      ("NHWC", "HWIO", "NHWC")) + bias
    if act == "sigmoid":
        ref = jax.nn.sigmoid(ref)
    elif act == "relu":
        ref = jnp.maximum(ref, 0.0)
    elif act == "elu":
        ref = jax.nn.elu(ref)
    out = conv3x3_packed(x, kernel, bias, pack, act)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_conv3x3_packed_rejects_bad_geometry(key):
    from ganreverser_tpu.ops.pack_conv import conv3x3_packed
    x = jax.random.normal(key, (1, 6, 6, 4))
    kernel = jnp.zeros((3, 3, 4, 3))
    with pytest.raises(ValueError, match="divisible"):
        conv3x3_packed(x, kernel, jnp.zeros(3), (4, 4))


@pytest.mark.parametrize("h,w,ci,co,act", [(4, 4, 3, 5, "relu"),
                                           (8, 8, 8, 16, "relu"),
                                           (8, 6, 7, 4, "none"),
                                           (16, 16, 8, 8, "sigmoid")])
def test_upsample_conv_bn_act_kernel_parity(key, h, w, ci, co, act):
    """Pallas fused upsample2+conv3x3+BN(eval)+act vs the module composition
    (UpsampleNearest -> Conv -> BatchNorm(eval) -> act), interpret mode on
    CPU — the G hot block (models.lua:121-130)."""
    from ganreverser_tpu.models import modules as nn
    from ganreverser_tpu.ops.conv_kernel import fold_batchnorm
    from ganreverser_tpu.ops.upsample_conv_kernel import (
        upsample2_conv3x3_bn_act)
    ks = jax.random.split(key, 6)
    x = jax.random.normal(ks[0], (2, h, w, ci))
    kernel = jax.random.normal(ks[1], (3, 3, ci, co)) * 0.2
    bias = jax.random.normal(ks[2], (co,)) * 0.1
    bn_params = {"scale": jax.random.uniform(ks[3], (co,), minval=0.5,
                                             maxval=1.5),
                 "bias": jax.random.normal(ks[4], (co,)) * 0.1}
    bn_state = {"mean": jax.random.normal(ks[5], (co,)) * 0.1,
                "var": jnp.ones((co,)) * 0.8}

    up = nn.UpsampleNearest(2)
    conv = nn.Conv(co, 3)
    bn = nn.BatchNorm(co)
    y, _ = up.apply({}, x)
    y, _ = conv.apply({"params": {"kernel": kernel, "bias": bias}}, y)
    ref, _ = bn.apply({"params": bn_params, "state": bn_state}, y,
                      train=False)
    if act == "relu":
        ref = jax.nn.relu(ref)
    elif act == "sigmoid":
        ref = jax.nn.sigmoid(ref)

    scale, shift = fold_batchnorm(bn_params, bn_state, bias)
    out = upsample2_conv3x3_bn_act(x, kernel, scale, shift, act=act,
                                   tile_n=2)
    assert out.shape == (2, 2 * h, 2 * w, co)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_upsample_conv_kernel_plain_conv(key):
    """scale=1 / shift=bias degenerates to plain upsample+conv — cross-check
    against the existing lax fused op."""
    from ganreverser_tpu.ops.upsample_conv_kernel import (
        upsample2_conv3x3_bn_act)
    k1, k2, k3 = jax.random.split(key, 3)
    x = jax.random.normal(k1, (2, 8, 8, 4))
    kernel = jax.random.normal(k2, (3, 3, 4, 6))
    bias = jax.random.normal(k3, (6,))
    ref = upsample2_conv3x3_reference(x, kernel, bias)
    out = upsample2_conv3x3_bn_act(x, kernel, jnp.ones((6,)), bias,
                                   act="none", tile_n=1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_fast_generator_matches_G(key):
    """models/fastpath.make_fast_generator == create_G3.apply(train=False)
    on the standard checkpoint pytree (bf16 path, interpret-mode kernels)."""
    from ganreverser_tpu.models.fastpath import make_fast_generator
    dims, nd = (3, 16, 16), 8
    G = M.create_G(dims, nd, dtype=jnp.bfloat16)
    variables, _ = G.init(key, (nd,))
    # non-trivial BN stats so the folding is actually exercised
    for l in ("l1", "l6", "l10"):
        variables["state"][l]["mean"] = 0.1 * jnp.arange(
            variables["state"][l]["mean"].shape[0], dtype=jnp.float32) % 1.0
        variables["state"][l]["var"] = 0.5 + 0.5 * jnp.ones_like(
            variables["state"][l]["var"])
    z = jax.random.normal(jax.random.fold_in(key, 1), (4, nd))
    ref, _ = G.apply(variables, z, train=False)
    fast = make_fast_generator(dims, nd, dtype=jnp.bfloat16)
    out = fast(variables, z)
    assert out.shape == ref.shape
    # bf16 compute on both sides; reassociated accumulation order
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=0.05, atol=0.02)


def test_fast_generator_matches_G_f32(key):
    """Same in f32 — tight tolerance isolates real math errors from bf16
    rounding."""
    from ganreverser_tpu.models.fastpath import make_fast_generator
    dims, nd = (1, 8, 8), 6
    G = M.create_G(dims, nd)
    variables, _ = G.init(key, (nd,))
    z = jax.random.normal(jax.random.fold_in(key, 1), (2, nd))
    ref, _ = G.apply(variables, z, train=False)
    out = make_fast_generator(dims, nd, dtype=jnp.float32,
                              tile_n=1)(variables, z)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_upsample_conv_fused_final_head(key):
    """upsample2_conv3x3_bn_act with the fused trailing conv+sigmoid head
    (G's output layer) vs the unfused composition, f32 interpret mode."""
    from ganreverser_tpu.ops.upsample_conv import upsample2_conv3x3_reference
    from ganreverser_tpu.ops.upsample_conv_kernel import (
        upsample2_conv3x3_bn_act)
    from jax import lax
    h, w, ci, co, cf = 6, 4, 5, 8, 3
    ks = jax.random.split(key, 6)
    x = jax.random.normal(ks[0], (2, h, w, ci))
    kernel = jax.random.normal(ks[1], (3, 3, ci, co)) * 0.3
    scale = jax.random.uniform(ks[2], (co,), minval=0.5, maxval=1.5)
    shift = jax.random.normal(ks[3], (co,)) * 0.1
    fk = jax.random.normal(ks[4], (3, 3, co, cf)) * 0.3
    fb = jax.random.normal(ks[5], (cf,)) * 0.1

    y = upsample2_conv3x3_reference(x, kernel, jnp.zeros((co,)))
    y = jnp.maximum(y * scale + shift, 0.0)
    ref = jax.nn.sigmoid(lax.conv_general_dilated(
        y, fk, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + fb)

    out = upsample2_conv3x3_bn_act(
        x, kernel, scale, shift, act="relu", tile_n=1, interpret=True,
        final_kernel=fk, final_bias=fb, final_act="sigmoid")
    assert out.shape == (2, 2 * h, 2 * w, cf)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_bf16_conv_grads_work_and_match_f32(key):
    """Differentiating through bf16 convs (ops/precision.py::conv_f32acc):
    JAX's conv transpose rejects the f32-cotangent/bf16-operand mix the
    preferred_element_type idiom produces, which broke bf16 training and
    config-5 latent refinement. The custom vjp must (a) work and (b) agree
    with the f32 gradients to bf16 tolerance — G (incl. the dilated
    UpsampleConv default) and R both."""
    dims, nd = (1, 8, 8), 6
    for make, in_shape, x_maker in (
            (lambda dt: M.create_G(dims, nd, dtype=dt), (nd,),
             lambda k: jax.random.normal(k, (2, nd))),
            (lambda dt: M.create_R(dims, nd, "normal", dtype=dt), (8, 8, 1),
             lambda k: jax.random.uniform(k, (2, 8, 8, 1)))):
        net32 = make(jnp.float32)
        net16 = make(jnp.bfloat16)
        variables, _ = net32.init(key, in_shape)
        x = x_maker(jax.random.fold_in(key, 1))

        def loss(net):
            def f(params):
                v = {"params": params, "state": variables["state"]}
                y, _ = net.apply(v, x, train=False)
                return jnp.mean(y.astype(jnp.float32) ** 2)
            return f

        g32 = jax.grad(loss(net32))(variables["params"])
        g16 = jax.grad(loss(net16))(variables["params"])  # crashed pre-fix
        flat32 = jnp.concatenate(
            [jnp.ravel(t) for t in jax.tree_util.tree_leaves(g32)])
        flat16 = jnp.concatenate(
            [jnp.ravel(t).astype(jnp.float32)
             for t in jax.tree_util.tree_leaves(g16)])
        denom = float(jnp.max(jnp.abs(flat32))) + 1e-8
        assert float(jnp.max(jnp.abs(flat16 - flat32))) / denom < 0.1


def test_conv_f32acc_vjp_matches_finite_differences(key):
    """The custom backward of ops/precision.py::conv_f32acc checked against
    central finite differences — independent of JAX's own conv transpose,
    covering both the plain-SAME and the lhs-dilated (upsample) cases."""
    from ganreverser_tpu.ops.precision import conv_f32acc
    cases = [
        dict(strides=(1, 1), padding="SAME", lhs_dilation=None),
        dict(strides=(1, 1), padding=((2, 2), (2, 2)), lhs_dilation=(2, 2)),
    ]
    for case in cases:
        k1, k2, k3 = jax.random.split(jax.random.fold_in(key, 7), 3)
        x = jax.random.normal(k1, (1, 4, 4, 2))
        w = jax.random.normal(k2, (3, 3, 2, 3)) * 0.5

        def loss(x, w):
            y = conv_f32acc(x, w, case["strides"], case["padding"],
                            case["lhs_dilation"], ("NHWC", "HWIO", "NHWC"))
            # fixed random projection -> scalar (probes all outputs)
            proj = jax.random.normal(k3, y.shape)
            return jnp.sum(y * proj)

        gx, gw = jax.grad(loss, argnums=(0, 1))(x, w)
        eps = 1e-3
        for g, arg, idx in ((gx, 0, (0, 1, 2, 1)), (gw, 1, (1, 0, 1, 2))):
            args = [x, w]
            plus = [a.at[idx].add(eps) if i == arg else a
                    for i, a in enumerate(args)]
            minus = [a.at[idx].add(-eps) if i == arg else a
                     for i, a in enumerate(args)]
            fd = (loss(*plus) - loss(*minus)) / (2 * eps)
            np.testing.assert_allclose(float(g[idx]), float(fd),
                                       rtol=2e-3, atol=2e-3)


def test_fast_generator_xla_matches_G_f32(key):
    """models/fastpath.make_fast_generator_xla (BN folded + lhs-dilated
    upsample conv, pure XLA) == create_G3.apply(train=False), f32 tight."""
    from ganreverser_tpu.models.fastpath import make_fast_generator_xla
    dims, nd = (1, 8, 8), 6
    G = M.create_G(dims, nd)
    variables, _ = G.init(key, (nd,))
    for l in ("l1", "l6", "l10"):
        variables["state"][l]["mean"] = 0.05 * jnp.ones_like(
            variables["state"][l]["mean"])
        variables["state"][l]["var"] = 0.8 * jnp.ones_like(
            variables["state"][l]["var"])
    z = jax.random.normal(jax.random.fold_in(key, 1), (2, nd))
    ref, _ = G.apply(variables, z, train=False)
    out = make_fast_generator_xla(dims, nd, dtype=jnp.float32)(variables, z)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_fast_generator_xla_pack_out_parity(key):
    """Whole-G parity for the lane-packed s3 candidate: fastpath with
    pack_out=(ph, pw) (ops/pack_conv.py on the final Co=C conv+sigmoid,
    models.lua:132-133) == the default fastpath, f32 tight. The bench
    e2e packed-out leg (bench.py --full) rides exactly this path."""
    from ganreverser_tpu.models.fastpath import make_fast_generator_xla
    dims, nd = (3, 32, 32), 8
    G = M.create_G(dims, nd)
    variables, _ = G.init(key, (nd,))
    z = jax.random.normal(jax.random.fold_in(key, 1), (4, nd))
    ref = make_fast_generator_xla(dims, nd, dtype=jnp.float32)(variables, z)
    out = make_fast_generator_xla(
        dims, nd, dtype=jnp.float32, pack_out=(4, 8))(variables, z)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("pool", [False, True])
def test_conv_block_kernel_parity(key, pool):
    """Pallas fused conv-chain (3x conv3x3+BN(eval)+ELU [+maxpool]) vs the
    module composition — R's backbone block (models.lua:409-440)."""
    from ganreverser_tpu.models import modules as nn
    from ganreverser_tpu.ops.conv_block_kernel import conv_block
    from ganreverser_tpu.ops.conv_kernel import fold_batchnorm
    chans = [5, 8, 8, 8]
    ks = jax.random.split(key, 16)
    x = jax.random.normal(ks[0], (2, 8, 8, chans[0]))
    kernels, scales, shifts, ref = [], [], [], x
    for li in range(3):
        ci, co = chans[li], chans[li + 1]
        kern = jax.random.normal(ks[1 + 3 * li], (3, 3, ci, co)) * 0.2
        bias = jax.random.normal(ks[2 + 3 * li], (co,)) * 0.1
        bn_p = {"scale": jax.random.uniform(ks[3 + 3 * li], (co,),
                                            minval=0.5, maxval=1.5),
                "bias": jnp.zeros((co,))}
        bn_s = {"mean": jax.random.normal(ks[12 + li], (co,)) * 0.1,
                "var": jnp.ones((co,)) * 0.9}
        y, _ = nn.Conv(co, 3).apply(
            {"params": {"kernel": kern, "bias": bias}}, ref)
        y, _ = nn.BatchNorm(co).apply({"params": bn_p, "state": bn_s}, y,
                                      train=False)
        ref = jax.nn.elu(y)
        sc, sh = fold_batchnorm(bn_p, bn_s, bias)
        kernels.append(kern)
        scales.append(sc)
        shifts.append(sh)
    if pool:
        ref, _ = nn.MaxPool(2).apply({}, ref)
    out = conv_block(x, tuple(kernels), tuple(scales), tuple(shifts),
                     act="elu", pool=pool, tile_n=2)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_fast_inverter_matches_R_f32(key):
    """models/fastpath.make_fast_inverter == create_R.apply(train=False) on
    the standard checkpoint pytree, f32 tight tolerance."""
    from ganreverser_tpu.models.fastpath import make_fast_inverter
    dims, nd = (3, 8, 8), 6
    R = M.create_R(dims, nd, "normal")
    variables, _ = R.init(key, (8, 8, 3))
    for l in ("l1", "l5", "l9", "l14", "l18", "l22", "l28"):
        variables["state"][l]["mean"] = 0.05 * jnp.ones_like(
            variables["state"][l]["mean"])
        variables["state"][l]["var"] = 0.8 * jnp.ones_like(
            variables["state"][l]["var"])
    x = jax.random.uniform(jax.random.fold_in(key, 1), (2, 8, 8, 3))
    ref, _ = R.apply(variables, x, train=False)
    out = make_fast_inverter(dims, nd, "normal", dtype=jnp.float32,
                             tile_n=1)(variables, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_fast_inverter_uniform_tanh(key):
    """Uniform-noise R appends Tanh (models.lua:452-454) — fast path too."""
    from ganreverser_tpu.models.fastpath import make_fast_inverter
    dims, nd = (1, 8, 8), 4
    R = M.create_R(dims, nd, "uniform")
    variables, _ = R.init(key, (8, 8, 1))
    x = jax.random.uniform(jax.random.fold_in(key, 1), (2, 8, 8, 1))
    ref, _ = R.apply(variables, x, train=False)
    out = make_fast_inverter(dims, nd, "uniform", dtype=jnp.float32,
                             tile_n=1)(variables, x)
    assert float(jnp.max(jnp.abs(out))) <= 1.0
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_fused_G_matches_unfused(key):
    """create_G(fuse=True) and fuse=False share the same param pytree and
    produce the same outputs."""
    dims, nd = (1, 8, 8), 8
    Gf = M.create_G(dims, nd, fuse=True)
    Gu = M.create_G(dims, nd, fuse=False)
    vf, _ = Gf.init(key, (nd,))
    vu, _ = Gu.init(key, (nd,))
    # identical initialization (same layer indices -> same fold_in keys)
    for a, b in zip(jax.tree_util.tree_leaves(vf),
                    jax.tree_util.tree_leaves(vu)):
        assert np.allclose(np.asarray(a), np.asarray(b))
    z = jax.random.normal(jax.random.fold_in(key, 1), (4, nd))
    yf, _ = Gf.apply(vf, z, train=False)
    yu, _ = Gu.apply(vu, z, train=False)
    np.testing.assert_allclose(np.asarray(yf), np.asarray(yu),
                               rtol=1e-5, atol=1e-5)


def test_tiled_topk_matches_lax(key):
    """Two-pass tiled selection (ops/tiled_topk.py) == lax.top_k, including
    the -inf padding tail and k > tile."""
    from ganreverser_tpu.ops.tiled_topk import tiled_topk
    scores = jax.random.normal(key, (5, 1000))
    for k, tile in ((7, 256), (7, 64), (100, 64), (100, 1024)):
        v, i = tiled_topk(scores, k, tile=tile)
        rv, ri = jax.lax.top_k(scores, k)
        np.testing.assert_allclose(np.asarray(v), np.asarray(rv),
                                   rtol=1e-6, atol=0)
        assert np.array_equal(np.asarray(i), np.asarray(ri))


def test_pixel_cosine_topk_tiled_matches_similarity(key):
    from ganreverser_tpu.analysis.similarity import pixel_cosine_topk
    from ganreverser_tpu.ops.tiled_topk import pixel_cosine_topk_tiled
    imgs = jax.random.uniform(key, (60, 8, 8, 3))
    needles = jnp.arange(4)
    v, i = pixel_cosine_topk_tiled(imgs, needles, 10, tile=16)
    rv, ri = pixel_cosine_topk(imgs, needles, 10)
    np.testing.assert_allclose(np.asarray(v), np.asarray(rv),
                               rtol=1e-5, atol=1e-6)
    assert np.array_equal(np.asarray(i), np.asarray(ri))


def test_conv_f32acc_forward_mode_ad(key):
    """f32 operands dispatch to the plain primitive, so forward-mode AD
    (jax.jvp/jacfwd) works — the custom_vjp is confined to the low-
    precision path, where jvp raising is the documented constraint
    (ops/precision.py)."""
    import pytest
    from ganreverser_tpu.ops.precision import conv_f32acc
    dn = ("NHWC", "HWIO", "NHWC")
    x = jax.random.normal(key, (2, 8, 8, 3), jnp.float32)
    w = jax.random.normal(jax.random.fold_in(key, 1), (3, 3, 3, 4),
                          jnp.float32)

    def f(x):
        return conv_f32acc(x, w, (1, 1), "SAME", None, dn).sum()

    _, tangent = jax.jvp(f, (x,), (jnp.ones_like(x),))
    assert np.isfinite(float(tangent))
    # and it agrees with reverse mode
    g = jax.grad(f)(x)
    np.testing.assert_allclose(float(tangent), float(jnp.sum(g)),
                               rtol=1e-5)

    with pytest.raises(Exception):  # bf16 path: reverse-mode only
        jax.jvp(lambda x: conv_f32acc(
            x, w.astype(jnp.bfloat16), (1, 1), "SAME", None, dn).sum(),
            (x.astype(jnp.bfloat16),),
            (jnp.ones_like(x, jnp.bfloat16),))
