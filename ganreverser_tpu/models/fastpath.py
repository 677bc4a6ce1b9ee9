"""Fast eval-mode G / R forwards: whole networks through fused Pallas blocks.

Consumes the STANDARD create_G3 checkpoint pytree (zoo.py layer indices
l0 Dense, l1 BN, l5/l9 convs, l6/l10 BNs, l12 final conv) — no separate
weights, no pytree changes:

  z -> Dense(+BN folded)+ReLU                     [XLA matmul epilogue]
    -> fused upsample2+conv3x3+BN+ReLU  (512->256) [ops/upsample_conv_kernel]
    -> fused upsample2+conv3x3+BN+ReLU  (256->128) [ops/upsample_conv_kernel]
    -> conv3x3 + Sigmoid                           [XLA; Co=C wastes MXU
                                                    lanes in a kernel]

And the R inversion hot path (the BASELINE.json headline,
models.lua:389-464) with each 3-conv block + maxpool fused into ONE kernel
whose activations never leave VMEM (ops/conv_block_kernel.py):

  images -> [conv64+BN+ELU x3 + pool]   (one kernel)
         -> [conv128+BN+ELU x3 + pool]  (one kernel)
         -> Dense(+BN folded)+ELU -> Dense (+Tanh for uniform)  [XLA]

Eval-mode only (BN running statistics folded on the host at trace time;
the Dropout layers are identity in eval). Parity vs apply(train=False):
tests/test_ops.py::test_fast_generator*, test_fast_inverter*.
"""
from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
from jax import lax

from ..ops.conv_block_kernel import conv_block
from ..ops.conv_kernel import fold_batchnorm
from ..ops.upsample_conv_kernel import upsample2_conv3x3_bn_act

Dims = tuple  # (C, H, W)


def make_fast_generator(dims: Dims, noise_dim: int,
                        dtype: Any = jnp.bfloat16, *, tile_n: int = 2,
                        interpret=None):
    # tile_n=2 measured fastest on v5e (benchmarks/RESULTS.md round-2 sweep)
    """Returns jitted ``generate(g_variables, z) -> images`` equivalent to
    ``create_G3(...).apply(variables, z, train=False)``.

    ``g_variables`` is the standard {"params", "state"} tree of create_G3
    (fuse=False layer indices). Batch must be a multiple of ``tile_n``.
    """
    c, h, w = dims
    sh, sw = h // 4, w // 4

    @jax.jit
    def generate(variables, z):
        p, s = variables["params"], variables["state"]

        # Dense + folded BN + ReLU (models.lua:115-117)
        scale0, shift0 = fold_batchnorm(p["l1"], s["l1"], p["l0"]["bias"])
        k0 = p["l0"]["kernel"].astype(jnp.float32) * scale0[None, :]
        y = jnp.dot(z.astype(dtype), k0.astype(dtype),
                    preferred_element_type=jnp.float32) + shift0
        y = jnp.maximum(y, 0.0).astype(dtype)
        x = y.reshape(z.shape[0], sh, sw, 512)

        # two fused upsample+conv+BN+ReLU stages (models.lua:121-130)
        scale1, shift1 = fold_batchnorm(p["l6"], s["l6"], p["l5"]["bias"])
        x = upsample2_conv3x3_bn_act(
            x, p["l5"]["kernel"].astype(dtype), scale1, shift1, act="relu",
            tile_n=tile_n, interpret=interpret, out_dtype=dtype)
        scale2, shift2 = fold_batchnorm(p["l10"], s["l10"], p["l9"]["bias"])
        x = upsample2_conv3x3_bn_act(
            x, p["l9"]["kernel"].astype(dtype), scale2, shift2, act="relu",
            tile_n=tile_n, interpret=interpret, out_dtype=dtype)

        # final 3x3 conv + sigmoid (models.lua:132-133) stays on XLA: the
        # kernel's fused final_head variant was measured SLOWER end-to-end
        # (29.1k vs 37.9k img/s — the Co=3 conv wastes MXU lanes in-kernel
        # while XLA's small-channel conv emitter handles it well)
        y = lax.conv_general_dilated(
            x, p["l12"]["kernel"].astype(dtype), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        return jax.nn.sigmoid(y + p["l12"]["bias"]).astype(dtype)

    return generate


def make_fast_generator_xla(dims: Dims, noise_dim: int,
                            dtype: Any = jnp.bfloat16,
                            pack_out: Any = None):
    """Pure-XLA fast G: BN folded at trace time + the lhs-dilated
    upsample+conv formulation (ops/upsample_conv.py::upsample2_conv3x3_dilated,
    2.25x fewer effective taps than the naive repeat+conv, no Mosaic).

    Same contract as make_fast_generator: consumes the standard create_G3
    pytree, equivalent to ``apply(variables, z, train=False)``.

    ``pack_out``: optional (ph, pw) — compute the final Co=C conv +
    sigmoid lane-packed (ops/pack_conv.py). A measurement candidate for
    the G s3 stage (benchmarks/tpu_kernel_check.py s3_packed); None keeps
    the measured XLA default.
    """
    from ..ops.upsample_conv import upsample2_conv3x3_dilated
    c, h, w = dims
    sh, sw = h // 4, w // 4

    @jax.jit
    def generate(variables, z):
        p, s = variables["params"], variables["state"]

        scale0, shift0 = fold_batchnorm(p["l1"], s["l1"], p["l0"]["bias"])
        k0 = p["l0"]["kernel"].astype(jnp.float32) * scale0[None, :]
        y = jnp.dot(z.astype(dtype), k0.astype(dtype),
                    preferred_element_type=jnp.float32) + shift0
        y = jnp.maximum(y, 0.0).astype(dtype)
        x = y.reshape(z.shape[0], sh, sw, 512)

        for conv, bn in (("l5", "l6"), ("l9", "l10")):
            scale, shift = fold_batchnorm(p[bn], s[bn], p[conv]["bias"])
            k = (p[conv]["kernel"].astype(jnp.float32)
                 * scale[None, None, None, :]).astype(dtype)
            x = upsample2_conv3x3_dilated(x, k, shift.astype(jnp.float32),
                                          dtype)
            x = jnp.maximum(x, 0.0).astype(dtype)

        if pack_out is not None:
            from ..ops.pack_conv import conv3x3_packed
            return conv3x3_packed(x, p["l12"]["kernel"], p["l12"]["bias"],
                                  tuple(pack_out), "sigmoid", dtype)
        y = lax.conv_general_dilated(
            x, p["l12"]["kernel"].astype(dtype), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        return jax.nn.sigmoid(y + p["l12"]["bias"]).astype(dtype)

    return generate


def make_fast_inverter(dims: Dims, noise_dim: int, noise_method: str,
                       dtype: Any = jnp.bfloat16, *, tile_n: int = 2,
                       interpret=None):
    """Returns jitted ``invert(r_variables, images) -> z_hat`` equivalent to
    ``create_R(...).apply(variables, images, train=False)`` for the plain
    (non-fixer) R — the fixer's always-on input dropout needs an rng and
    stays on the module path.

    ``r_variables``: standard create_R_default pytree (zoo.py layer indices
    l0/l4/l8 + l13/l17/l21 convs, l1/... BNs, l27/l31 Denses).
    """
    assert noise_method in ("normal", "uniform"), noise_method

    def fold(p, s, conv, bn):
        return fold_batchnorm(p[bn], s[bn], p[conv]["bias"])

    @jax.jit
    def invert(variables, images):
        p, s = variables["params"], variables["state"]
        x = images.astype(dtype)

        # block 1: 3x [conv64 + BN + ELU] + maxpool2 (models.lua:409-423)
        sc0, sh0 = fold(p, s, "l0", "l1")
        sc1, sh1 = fold(p, s, "l4", "l5")
        sc2, sh2 = fold(p, s, "l8", "l9")
        x = conv_block(
            x, (p["l0"]["kernel"].astype(dtype),
                p["l4"]["kernel"].astype(dtype),
                p["l8"]["kernel"].astype(dtype)),
            (sc0, sc1, sc2), (sh0, sh1, sh2), act="elu", pool=True,
            tile_n=tile_n, interpret=interpret, out_dtype=dtype)

        # block 2: 3x [conv128 + BN + ELU] + maxpool2 (models.lua:426-440)
        sc3, sh3 = fold(p, s, "l13", "l14")
        sc4, sh4 = fold(p, s, "l17", "l18")
        sc5, sh5 = fold(p, s, "l21", "l22")
        x = conv_block(
            x, (p["l13"]["kernel"].astype(dtype),
                p["l17"]["kernel"].astype(dtype),
                p["l21"]["kernel"].astype(dtype)),
            (sc3, sc4, sc5), (sh3, sh4, sh5), act="elu", pool=True,
            tile_n=tile_n, interpret=interpret, out_dtype=dtype)

        # head: Dense(+BN folded)+ELU -> Dense (models.lua:446-451)
        x = x.reshape(x.shape[0], -1)
        scd, shd = fold(p, s, "l27", "l28")
        kd = p["l27"]["kernel"].astype(jnp.float32) * scd[None, :]
        y = jnp.dot(x, kd.astype(dtype),
                    preferred_element_type=jnp.float32) + shd
        y = jax.nn.elu(y).astype(dtype)
        z = jnp.dot(y, p["l31"]["kernel"].astype(dtype),
                    preferred_element_type=jnp.float32) + p["l31"]["bias"]
        if noise_method != "normal":
            z = jnp.tanh(z)  # models.lua:452-454
        return z.astype(dtype)

    return invert


def make_fast_inverter_int8(dims: Dims, noise_dim: int, noise_method: str,
                            dtype: Any = jnp.bfloat16):
    """int8 weight+activation R eval path (ops/quant.py) — the serving
    candidate for the headline R-inversion workload (apply_r.lua:143-153).

    Same contract as make_fast_inverter (plain non-fixer R, standard
    create_R_default pytree), but every conv/dense runs int8 x int8 ->
    int32 on folded-BN weights, structured as the MEASURED-winner XLA
    conv pipeline (per-layer convs, not the conv_block kernel — see
    RESULTS.md: the fused chain lost to XLA at these shapes). Output is
    an approximation of the bf16 path; adoption is gated on the on-device
    top-k ranking recall + throughput A/B (tpu_kernel_check int8_r).
    """
    assert noise_method in ("normal", "uniform"), noise_method
    from ..ops.quant import (fold_quantize_conv, fold_quantize_dense,
                             quant_act, quant_conv3x3_same, quant_dense)

    neg_inf = -jnp.inf

    @jax.jit
    def invert(variables, images):
        p, s = variables["params"], variables["state"]

        def foldq(conv, bn):
            sc, sh = fold_batchnorm(p[bn], s[bn], p[conv]["bias"])
            return fold_quantize_conv(p[conv]["kernel"], sc, sh)

        x = images.astype(jnp.float32)
        # two blocks of 3x [conv + BN + ELU] + maxpool2 (models.lua:409-440;
        # the Dropout layers are identity in eval)
        for layers in ((("l0", "l1"), ("l4", "l5"), ("l8", "l9")),
                       (("l13", "l14"), ("l17", "l18"), ("l21", "l22"))):
            for conv, bn in layers:
                wq, ws, b = foldq(conv, bn)
                xq, xs = quant_act(x)
                x = jax.nn.elu(quant_conv3x3_same(xq, xs, wq, ws, b))
            x = lax.reduce_window(x, neg_inf, lax.max,
                                  (1, 2, 2, 1), (1, 2, 2, 1), "VALID")

        # head: Dense(+BN folded)+ELU -> Dense (models.lua:446-451)
        x = x.reshape(x.shape[0], -1)
        scd, shd = fold_batchnorm(p["l28"], s["l28"], p["l27"]["bias"])
        wq, ws, b = fold_quantize_dense(p["l27"]["kernel"], scd, shd)
        xq, xs = quant_act(x)
        y = jax.nn.elu(quant_dense(xq, xs, wq, ws, b))
        wq2, ws2, b2 = fold_quantize_dense(
            p["l31"]["kernel"], jnp.ones((), jnp.float32), p["l31"]["bias"])
        yq, ys = quant_act(y)
        z = quant_dense(yq, ys, wq2, ws2, b2)
        if noise_method != "normal":
            z = jnp.tanh(z)  # models.lua:452-454
        return z.astype(dtype)

    return invert


def make_fast_generator_xla_int8(dims: Dims, noise_dim: int,
                                 dtype: Any = jnp.bfloat16):
    """int8 variant of make_fast_generator_xla: the measured-winner
    lhs-dilated upsample+conv formulation with int8 operands (zero
    insertion stays exact — symmetric quantization maps 0.0 to 0).
    e2e is G-bound (G 53-54k vs R 72-74k img/s), so this is the e2e-side
    int8 candidate; gated on tpu_kernel_check int8_g like int8_r.
    """
    from ..ops.quant import (fold_quantize_dense, quant_act, quant_dense,
                             quantize_symmetric)
    c, h, w = dims
    sh_, sw_ = h // 4, w // 4
    # (4,3) tap-aggregation map of upsample2_conv3x3_dilated
    A = jnp.asarray([[1.0, 0.0, 0.0], [1.0, 1.0, 0.0],
                     [0.0, 1.0, 1.0], [0.0, 0.0, 1.0]], jnp.float32)

    @jax.jit
    def generate(variables, z):
        p, s = variables["params"], variables["state"]

        # s0: Dense + folded BN + ReLU (models.lua:115-117)
        scale0, shift0 = fold_batchnorm(p["l1"], s["l1"], p["l0"]["bias"])
        wq0, ws0, b0 = fold_quantize_dense(p["l0"]["kernel"], scale0, shift0)
        zq, zs = quant_act(z.astype(jnp.float32))
        y = jnp.maximum(quant_dense(zq, zs, wq0, ws0, b0), 0.0)
        x = y.reshape(z.shape[0], sh_, sw_, 512)

        # s1/s2: lhs-dilated upsample+conv (ops/upsample_conv.py) in int8
        for conv, bn in (("l5", "l6"), ("l9", "l10")):
            scale, shift = fold_batchnorm(p[bn], s[bn], p[conv]["bias"])
            wf = (p[conv]["kernel"].astype(jnp.float32)
                  * scale[None, None, None, :])
            w4 = jnp.einsum("ay,yxio->axio", A, wf)
            w4 = jnp.einsum("bx,axio->abio", A, w4)
            wq, ws = quantize_symmetric(w4, axis=(0, 1, 2))
            xq, xs = quant_act(x)
            yi = lax.conv_general_dilated(
                xq, wq, (1, 1), ((2, 2), (2, 2)), lhs_dilation=(2, 2),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32)
            x = jnp.maximum(
                yi.astype(jnp.float32) * (xs * ws).reshape(1, 1, 1, -1)
                + shift.astype(jnp.float32), 0.0)

        # s3: final Co=C conv + sigmoid (models.lua:132-133) in int8
        wq3, ws3 = quantize_symmetric(p["l12"]["kernel"], axis=(0, 1, 2))
        xq, xs = quant_act(x)
        yi = lax.conv_general_dilated(
            xq, wq3, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)
        y = (yi.astype(jnp.float32) * (xs * ws3).reshape(1, 1, 1, -1)
             + p["l12"]["bias"].astype(jnp.float32))
        return jax.nn.sigmoid(y).astype(dtype)

    return generate
