"""The model zoo — every architecture of models.lua, rebuilt NHWC/TPU-native.

Active aliases match the reference: ``create_G`` -> G3 (models.lua:201-203),
``create_D`` -> D2 (models.lua:209-211), ``create_R`` -> R_default
(models.lua:385-387). The unused variants (G4, D_default, D_facegen,
createResidual) are provided for full inventory parity (SURVEY.md §2.1 #4).

``dimensions`` is (C, H, W) like the reference API; tensors flow as NHWC.
All models are weight-initialized with the 'heuristic' scheme
(models.lua:140,334,461 -> weight-init.lua).
"""
from __future__ import annotations

from typing import Any

import jax.numpy as jnp

from .modules import (Activation, AvgPool, BatchNorm, Conv, ConcatBranches,
                      Dense, Dropout, Flatten, Identity, MaxPool, Module,
                      PReLU, Reshape, Residual, Sequential, SpatialDropout,
                      UpsampleConv, UpsampleNearest)

Dims = tuple  # (C, H, W)


def _act(name: str):
    return Activation(name)


def create_G(dimensions: Dims, noise_dim: int, dtype: Any = jnp.float32,
             fuse: bool = False) -> Module:
    """models.create_G == create_G3 (models.lua:201-203)."""
    return create_G3(dimensions, noise_dim, dtype, fuse)


def create_G3(dimensions: Dims, noise_dim: int, dtype: Any = jnp.float32,
              fuse: bool = False) -> Module:
    """create_G3 (models.lua:104-143): z -> Linear -> BN -> ReLU -> reshape
    H/4 x W/4 x 512 -> 2x [NN-upsample x2 + 3x3 conv + BN + ReLU] -> 3x3 conv
    -> Sigmoid. Output in [0, 1].

    ``fuse=True`` replaces each UpsampleNearest+Conv pair with the fused
    UpsampleConv op (2.25x fewer MACs, same parameters & numerics up to
    reassociation; ops/upsample_conv.py). Layer indices — and therefore
    checkpoint pytree keys — are identical in both modes. Default OFF: on
    TPU v5e the measured throughput of XLA's native upsample+conv pipeline
    (22.5k img/s @64x64 b1024) beats the fused rewrite (11.5k img/s) — the
    odd-size (H+1,W+1) intermediate and the pixel-shuffle transpose cost
    more than the saved MACs."""
    c, h, w = dimensions
    sh, sw = h // 4, w // 4

    def up_conv(features):
        if fuse:
            return [Identity(), UpsampleConv(features, dtype=dtype)]
        return [UpsampleNearest(2), Conv(features, 3, dtype=dtype)]

    return Sequential([
        Dense(512 * sh * sw, dtype=dtype),
        BatchNorm(512 * sh * sw, dtype=dtype),
        _act("relu"),
        Reshape((sh, sw, 512)),
        *up_conv(256),
        BatchNorm(256, dtype=dtype),
        _act("relu"),
        *up_conv(128),
        BatchNorm(128, dtype=dtype),
        _act("relu"),
        Conv(c, 3, dtype=dtype),
        _act("sigmoid"),
    ])


def create_G4(dimensions: Dims, noise_dim: int, dtype: Any = jnp.float32) -> Module:
    """create_G4 (models.lua:145-194, unused upstream): 32 parallel branches
    [Linear 16 -> PReLU -> Linear 16*16*16 -> BN -> PReLU -> reshape 16x16x16
    -> upsample -> conv16 -> BN -> PReLU], channel-concat to 512 maps, then
    conv64 + conv-to-C + Sigmoid. Hardcodes 16/32 geometry like the reference
    (only valid for 32x32 outputs)."""
    c, h, w = dimensions
    assert h == 32 and w == 32, "create_G4 hardcodes 32x32 (models.lua:162-167)"

    def branch():
        return Sequential([
            Dense(16, dtype=dtype),
            PReLU(),
            Dense(16 * 16 * 16, dtype=dtype),
            BatchNorm(16 * 16 * 16, dtype=dtype),
            PReLU(),
            Reshape((16, 16, 16)),
            UpsampleNearest(2),
            Conv(16, 3, dtype=dtype),
            BatchNorm(16, dtype=dtype),
            PReLU(),
        ])

    return Sequential([
        ConcatBranches([branch() for _ in range(32)]),
        Conv(64, 3, dtype=dtype),
        BatchNorm(64, dtype=dtype),
        PReLU(),
        Conv(c, 3, dtype=dtype),
        _act("sigmoid"),
    ])


def create_G_encoder(dimensions: Dims, noise_dim: int, dtype: Any = jnp.float32) -> Module:
    """create_G_encoder (models.lua:57-102) — the autoencoder encoder used by
    pretrain_g: conv16/avgpool, conv32/maxpool, conv64/maxpool, Linear 512
    + BN + ReLU, Linear noise_dim + Tanh."""
    return Sequential([
        Conv(16, 3, dtype=dtype), BatchNorm(16, dtype=dtype), _act("relu"), AvgPool(2),
        Conv(32, 3, dtype=dtype), BatchNorm(32, dtype=dtype), _act("relu"), MaxPool(2),
        Conv(64, 3, dtype=dtype), BatchNorm(64, dtype=dtype), _act("relu"), MaxPool(2),
        Flatten(),
        Dense(512, dtype=dtype), BatchNorm(512, dtype=dtype), _act("relu"),
        Dense(noise_dim, dtype=dtype), _act("tanh"),
    ])


def create_D(dimensions: Dims, dtype: Any = jnp.float32) -> Module:
    """models.create_D == create_D2 (models.lua:209-211)."""
    return create_D2(dimensions, dtype)


def _nxn(features: int, kernel: int, dropout: float, dtype) -> Module:
    """create_D2's createNxN helper (models.lua:273-281). Reference quirk kept:
    the dropout argument only gates *whether* a dropout layer is added; the
    rate is always SpatialDropout(0.25)."""
    layers = [Conv(features, kernel, dtype=dtype), PReLU()]
    if dropout > 0:
        layers.append(SpatialDropout(0.25))
    return Sequential(layers)


def create_D2(dimensions: Dims, dtype: Any = jnp.float32) -> Module:
    """create_D2 (models.lua:272-337): shared stem, then a two-branch
    nn.Concat (left: 5x5 conv path; right: deeper 3x3 path), concat(1024)
    -> Linear 256 -> Linear 1 -> Sigmoid."""
    c, h, w = dimensions
    left = Sequential([
        _nxn(64, 5, 0.2, dtype),
        MaxPool(2),
        Flatten(),
        Dense(512, dtype=dtype),
        PReLU(),
        Dropout(0.25),
    ])
    right = Sequential([
        _nxn(128, 3, 0.2, dtype),
        MaxPool(2),
        _nxn(256, 3, 0.2, dtype),
        _nxn(256, 3, 0.2, dtype),
        MaxPool(2),
        Flatten(),
        Dense(512, dtype=dtype),
        PReLU(),
    ])
    return Sequential([
        _nxn(128, 3, 0.0, dtype),
        _nxn(128, 3, 0.2, dtype),
        MaxPool(2),
        ConcatBranches([left, right]),
        Dense(256, dtype=dtype),
        PReLU(),
        Dropout(0.25),
        Dense(1, dtype=dtype),
        _act("sigmoid"),
    ])


def create_D_default(dimensions: Dims, dtype: Any = jnp.float32) -> Module:
    """create_D_default (models.lua:213-270, unused upstream)."""
    return Sequential([
        Conv(32, 3, dtype=dtype), PReLU(),
        Conv(64, 3, dtype=dtype), PReLU(), SpatialDropout(0.25),
        Conv(128, 3, dtype=dtype), PReLU(), SpatialDropout(0.25), AvgPool(2),
        Conv(256, 3, dtype=dtype), PReLU(), SpatialDropout(0.25), AvgPool(2),
        Conv(512, 3, dtype=dtype), PReLU(), SpatialDropout(0.25), AvgPool(2),
        Flatten(),
        Dense(512, dtype=dtype), PReLU(), Dropout(0.5),
        Dense(1, dtype=dtype), _act("sigmoid"),
    ])


def create_D_facegen(dimensions: Dims, dtype: Any = jnp.float32) -> Module:
    """create_D_facegen (models.lua:339-383, unused upstream)."""
    return Sequential([
        Conv(64, 3, dtype=dtype), PReLU(), SpatialDropout(0.2), AvgPool(2),
        Conv(128, 3, dtype=dtype), PReLU(), SpatialDropout(0.2), AvgPool(2),
        Conv(256, 3, dtype=dtype), PReLU(), SpatialDropout(0.2), AvgPool(2),
        Conv(512, 3, dtype=dtype), PReLU(), SpatialDropout(0.2), AvgPool(2),
        Flatten(),
        Dense(512, dtype=dtype), PReLU(), Dropout(0.5),
        Dense(512, dtype=dtype), PReLU(), Dropout(0.5),
        Dense(1, dtype=dtype), _act("sigmoid"),
    ])


def create_R(dimensions: Dims, noise_dim: int, noise_method: str,
             fixer: bool = False, dtype: Any = jnp.float32) -> Module:
    """models.create_R == create_R_default (models.lua:385-387)."""
    return create_R_default(dimensions, noise_dim, noise_method, fixer, dtype)


def create_R_default(dimensions: Dims, noise_dim: int, noise_method: str,
                     fixer: bool = False, dtype: Any = jnp.float32) -> Module:
    """create_R_default (models.lua:389-464).

    * ``fixer=True`` prepends a Dropout(0.5) that stays active even at
      inference (models.lua:399-406) — implemented via ``always_on``.
    * Tanh output head only for uniform noise (models.lua:452-454); the
      normal-noise R has an unbounded linear output.
    """
    assert noise_method in ("normal", "uniform"), noise_method
    c, h, w = dimensions
    layers = []
    if fixer:
        layers.append(Dropout(0.5, always_on=True))
    # 3 blocks at 64 channels (models.lua:409-423); nn.Dropout() default 0.5
    layers += [
        Conv(64, 3, dtype=dtype), BatchNorm(64, dtype=dtype), _act("elu"), Dropout(0.5),
        Conv(64, 3, dtype=dtype), BatchNorm(64, dtype=dtype), _act("elu"), Dropout(0.5),
        Conv(64, 3, dtype=dtype), BatchNorm(64, dtype=dtype), _act("elu"), MaxPool(2), Dropout(0.5),
    ]
    # 3 blocks at 128 channels (models.lua:426-440)
    layers += [
        Conv(128, 3, dtype=dtype), BatchNorm(128, dtype=dtype), _act("elu"), Dropout(0.5),
        Conv(128, 3, dtype=dtype), BatchNorm(128, dtype=dtype), _act("elu"), Dropout(0.5),
        Conv(128, 3, dtype=dtype), BatchNorm(128, dtype=dtype), _act("elu"), SpatialDropout(0.25), MaxPool(2),
    ]
    layers += [
        Flatten(),
        Dense(512, dtype=dtype), BatchNorm(512, dtype=dtype), _act("elu"), Dropout(0.5),
        Dense(noise_dim, dtype=dtype),
    ]
    if noise_method != "normal":
        layers.append(_act("tanh"))
    return Sequential(layers)


def create_residual(nb_input: int, nb_inner: int, nb_output: int,
                    activation: str = "ReLU", bn: bool = True,
                    dtype: Any = jnp.float32) -> Module:
    """models.createResidual (models.lua:8-55, unused upstream)."""
    act_name = {"ReLU": "relu", "PReLU": "prelu",
                "LeakyReLU": "leaky_relu"}.get(activation)
    if act_name is None:
        raise ValueError(f"Unknown activation {activation!r}")

    def act():
        return PReLU() if act_name == "prelu" else Activation(act_name)

    inner = []
    if nb_input != nb_inner:
        inner += [Conv(nb_inner, 1, dtype=dtype)]
        if bn:
            inner += [BatchNorm(nb_inner, dtype=dtype)]
        inner += [act()]
    for _ in range(2):
        inner += [Conv(nb_inner, 3, dtype=dtype)]
        if bn:
            inner += [BatchNorm(nb_inner, dtype=dtype)]
        inner += [act()]
    if nb_inner != nb_output:
        inner += [Conv(nb_output, 1, dtype=dtype)]
        if bn:
            inner += [BatchNorm(nb_output, dtype=dtype)]
        inner += [act()]

    if nb_input == nb_output:
        shortcut: Module = Identity()
    else:
        sc = [Conv(nb_output, 1, dtype=dtype)]
        if bn:
            sc += [BatchNorm(nb_output, dtype=dtype)]
        sc += [act()]
        shortcut = Sequential(sc)
    return Residual(Sequential(inner), shortcut)
