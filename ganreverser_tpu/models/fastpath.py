"""Fast eval-mode G forward: the whole decoder through fused Pallas blocks.

Consumes the STANDARD create_G3 checkpoint pytree (zoo.py layer indices
l0 Dense, l1 BN, l5/l9 convs, l6/l10 BNs, l12 final conv) — no separate
weights, no pytree changes:

  z -> Dense(+BN folded)+ReLU                     [XLA matmul epilogue]
    -> fused upsample2+conv3x3+BN+ReLU  (512->256) [ops/upsample_conv_kernel]
    -> fused upsample2+conv3x3+BN+ReLU  (256->128) [ops/upsample_conv_kernel]
    -> conv3x3 + Sigmoid                           [XLA; Co=C wastes MXU
                                                    lanes in a kernel]

Eval-mode only (BN running statistics folded on the host at trace time).
Parity vs G.apply(train=False): tests/test_ops.py::test_fast_generator.
Reference hot path: models.lua:104-143 (create_G3).
"""
from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
from jax import lax

from ..ops.conv_kernel import fold_batchnorm
from ..ops.upsample_conv_kernel import upsample2_conv3x3_bn_act

Dims = tuple  # (C, H, W)


def make_fast_generator(dims: Dims, noise_dim: int,
                        dtype: Any = jnp.bfloat16, *, tile_n: int = 2,
                        interpret=None):
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

        # final 3x3 conv + sigmoid (models.lua:132-133)
        y = lax.conv_general_dilated(
            x, p["l12"]["kernel"].astype(dtype), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        return jax.nn.sigmoid(y + p["l12"]["bias"]).astype(dtype)

    return generate
