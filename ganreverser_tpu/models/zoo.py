"""The model zoo — every architecture of models.lua, rebuilt NHWC/TPU-native.

Active aliases match the reference: ``create_G`` -> G3 (models.lua:201-203),
``create_D`` -> D2 (models.lua:209-211), ``create_R`` -> R_default
(models.lua:385-387). The unused variants (G4, D_default, D_facegen,
createResidual) are provided for full inventory parity (SURVEY.md §2.1 #4).

``dimensions`` is (C, H, W) like the reference API; tensors flow as NHWC.

Weight init: the default applies the 'heuristic' scheme to every conv/linear
with zero biases — a DELIBERATE, FLAGGED deviation from the reference, whose
`require('weight-init')(model,'heuristic')` calls (models.lua:140,334,461)
actually re-initialize far less than they claim: w_init matches modules by
'nn.*' typename string and only at top level, so every cudnn conv keeps
torch's default reset and everything nested in sub-Sequentials/Concat
branches keeps torch defaults including nonzero biases (see
models/init.py's module docstring for the full accounting). Pass
``init="torch"`` to reproduce the reference's accidental initial
distributions exactly (per-layer mapping in each create_* below); the
deviation and mapping are also recorded in PARITY.md.
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
             fuse: bool = True, init: str = "heuristic") -> Module:
    """models.create_G == create_G3 (models.lua:201-203)."""
    return create_G3(dimensions, noise_dim, dtype, fuse, init)


def create_G3(dimensions: Dims, noise_dim: int, dtype: Any = jnp.float32,
              fuse: bool = True, init: str = "heuristic") -> Module:
    """create_G3 (models.lua:104-143): z -> Linear -> BN -> ReLU -> reshape
    H/4 x W/4 x 512 -> 2x [NN-upsample x2 + 3x3 conv + BN + ReLU] -> 3x3 conv
    -> Sigmoid. Output in [0, 1].

    ``fuse=True`` (the default) replaces each UpsampleNearest+Conv pair
    with the fused UpsampleConv op — since round 2 the lhs-dilated single
    conv (ops/upsample_conv.py::upsample2_conv3x3_dilated), exact-parity
    with the composition and measured 1.37x faster per stage / 2.34x for
    the whole eval G on v5e (benchmarks/RESULTS.md round 2; the round-1
    pixel-shuffle variant that measured slower is retained as
    variant="shuffle"). Layer indices — and therefore checkpoint pytree
    keys — are identical in both modes; ``fuse=False`` restores the
    literal UpsampleNearest+Conv composition.

    ``init="torch"`` faithful mode: the convs are cudnn.SpatialConvolution
    upstream, so w_init never re-inits them (typename mismatch) — they keep
    torch's default uniform(±1/sqrt(9*Ci)) weights with zeroed (top-level)
    biases; the Linear IS matched (heuristic); BN scales ~ uniform(0,1)."""
    c, h, w = dimensions
    sh, sw = h // 4, w // 4
    torch_init = init == "torch"
    conv_scheme = "torch_default" if torch_init else init
    bn_scale = "torch" if torch_init else "ones"
    dense_scheme = "heuristic" if torch_init else init

    def up_conv(features):
        if fuse:
            return [Identity(), UpsampleConv(features, init_scheme=conv_scheme,
                                             dtype=dtype)]
        return [UpsampleNearest(2),
                Conv(features, 3, init_scheme=conv_scheme, dtype=dtype)]

    return Sequential([
        Dense(512 * sh * sw, init_scheme=dense_scheme, dtype=dtype),
        BatchNorm(512 * sh * sw, scale_init=bn_scale, dtype=dtype),
        _act("relu"),
        Reshape((sh, sw, 512)),
        *up_conv(256),
        BatchNorm(256, scale_init=bn_scale, dtype=dtype),
        _act("relu"),
        *up_conv(128),
        BatchNorm(128, scale_init=bn_scale, dtype=dtype),
        _act("relu"),
        Conv(c, 3, init_scheme=conv_scheme, dtype=dtype),
        _act("sigmoid"),
    ])


def create_G4(dimensions: Dims, noise_dim: int, dtype: Any = jnp.float32,
              init: str = "heuristic") -> Module:
    """create_G4 (models.lua:145-194, unused upstream): 32 parallel branches
    [Linear 16 -> PReLU -> Linear 16*16*16 -> BN -> PReLU -> reshape 16x16x16
    -> upsample -> conv16 -> BN -> PReLU], channel-concat to 512 maps, then
    conv64 + conv-to-C + Sigmoid. Hardcodes 16/32 geometry like the reference
    (only valid for 32x32 outputs).

    ``init="torch"``: every branch module is nested inside the nn.Concat, so
    w_init touches NONE of it — torch defaults everywhere, including
    uniform(±1/sqrt(fan_in)) biases; the two top-level cudnn convs keep
    default weights with zeroed biases; BN scales ~ uniform(0,1)."""
    c, h, w = dimensions
    assert h == 32 and w == 32, "create_G4 hardcodes 32x32 (models.lua:162-167)"
    t = init == "torch"
    bn_scale = "torch" if t else "ones"

    def branch():
        return Sequential([
            Dense(16, init_scheme="torch_default" if t else init,
                  init_zero_bias=not t, dtype=dtype),
            PReLU(),
            Dense(16 * 16 * 16, init_scheme="torch_default" if t else init,
                  init_zero_bias=not t, dtype=dtype),
            BatchNorm(16 * 16 * 16, scale_init=bn_scale, dtype=dtype),
            PReLU(),
            Reshape((16, 16, 16)),
            UpsampleNearest(2),
            Conv(16, 3, init_scheme="torch_default" if t else init,
                 init_zero_bias=not t, dtype=dtype),
            BatchNorm(16, scale_init=bn_scale, dtype=dtype),
            PReLU(),
        ])

    return Sequential([
        ConcatBranches([branch() for _ in range(32)]),
        Conv(64, 3, init_scheme="torch_default" if t else init, dtype=dtype),
        BatchNorm(64, scale_init=bn_scale, dtype=dtype),
        PReLU(),
        Conv(c, 3, init_scheme="torch_default" if t else init, dtype=dtype),
        _act("sigmoid"),
    ])


def create_G_encoder(dimensions: Dims, noise_dim: int,
                     dtype: Any = jnp.float32,
                     init: str = "heuristic") -> Module:
    """create_G_encoder (models.lua:57-102) — the autoencoder encoder used by
    pretrain_g: conv16/avgpool, conv32/maxpool, conv64/maxpool, Linear 512
    + BN + ReLU, Linear noise_dim + Tanh.

    ``init="torch"``: cudnn convs keep torch-default weights (w_init
    typename miss) with zeroed biases; Linears heuristic; BN uniform(0,1)."""
    t = init == "torch"
    cs = "torch_default" if t else init
    ds = "heuristic" if t else init
    bs = "torch" if t else "ones"
    return Sequential([
        Conv(16, 3, init_scheme=cs, dtype=dtype),
        BatchNorm(16, scale_init=bs, dtype=dtype), _act("relu"), AvgPool(2),
        Conv(32, 3, init_scheme=cs, dtype=dtype),
        BatchNorm(32, scale_init=bs, dtype=dtype), _act("relu"), MaxPool(2),
        Conv(64, 3, init_scheme=cs, dtype=dtype),
        BatchNorm(64, scale_init=bs, dtype=dtype), _act("relu"), MaxPool(2),
        Flatten(),
        Dense(512, init_scheme=ds, dtype=dtype),
        BatchNorm(512, scale_init=bs, dtype=dtype), _act("relu"),
        Dense(noise_dim, init_scheme=ds, dtype=dtype), _act("tanh"),
    ])


def create_D(dimensions: Dims, dtype: Any = jnp.float32,
             init: str = "heuristic") -> Module:
    """models.create_D == create_D2 (models.lua:209-211)."""
    return create_D2(dimensions, dtype, init)


def _nxn(features: int, kernel: int, dropout: float, dtype,
         init: str = "heuristic") -> Module:
    """create_D2's createNxN helper (models.lua:273-281). Reference quirk kept:
    the dropout argument only gates *whether* a dropout layer is added; the
    rate is always SpatialDropout(0.25).

    ``init="torch"``: these blocks are sub-Sequentials, so the top-level-only
    w_init never reaches the conv inside — torch default reset survives,
    weight AND bias ~ uniform(±1/sqrt(k*k*Ci))."""
    t = init == "torch"
    layers = [Conv(features, kernel,
                   init_scheme="torch_default" if t else init,
                   init_zero_bias=not t, dtype=dtype), PReLU()]
    if dropout > 0:
        layers.append(SpatialDropout(0.25))
    return Sequential(layers)


def create_D2(dimensions: Dims, dtype: Any = jnp.float32,
              init: str = "heuristic") -> Module:
    """create_D2 (models.lua:272-337): shared stem, then a two-branch
    nn.Concat (left: 5x5 conv path; right: deeper 3x3 path), concat(1024)
    -> Linear 256 -> Linear 1 -> Sigmoid.

    ``init="torch"``: only the two top-level Linears (1024->256, 256->1)
    are heuristic-init with zero bias; every conv (inside createNxN
    sub-Sequentials) and the two 512 branch Linears (inside the Concat)
    keep torch defaults with nonzero uniform biases."""
    c, h, w = dimensions
    t = init == "torch"
    branch_dense = dict(init_scheme="torch_default" if t else init,
                        init_zero_bias=not t)
    top_dense = dict(init_scheme="heuristic" if t else init)
    left = Sequential([
        _nxn(64, 5, 0.2, dtype, init),
        MaxPool(2),
        Flatten(),
        Dense(512, dtype=dtype, **branch_dense),
        PReLU(),
        Dropout(0.25),
    ])
    right = Sequential([
        _nxn(128, 3, 0.2, dtype, init),
        MaxPool(2),
        _nxn(256, 3, 0.2, dtype, init),
        _nxn(256, 3, 0.2, dtype, init),
        MaxPool(2),
        Flatten(),
        Dense(512, dtype=dtype, **branch_dense),
        PReLU(),
    ])
    return Sequential([
        _nxn(128, 3, 0.0, dtype, init),
        _nxn(128, 3, 0.2, dtype, init),
        MaxPool(2),
        ConcatBranches([left, right]),
        Dense(256, dtype=dtype, **top_dense),
        PReLU(),
        Dropout(0.25),
        Dense(1, dtype=dtype, **top_dense),
        _act("sigmoid"),
    ])


def create_D_default(dimensions: Dims, dtype: Any = jnp.float32,
                     init: str = "heuristic") -> Module:
    """create_D_default (models.lua:213-270, unused upstream). All convs/
    linears are plain nn modules at top level, so the faithful
    ``init="torch"`` equals the default heuristic init (``init`` accepted
    for API uniformity)."""
    if init == "torch":
        init = "heuristic"
    return Sequential([
        Conv(32, 3, init_scheme=init, dtype=dtype), PReLU(),
        Conv(64, 3, init_scheme=init, dtype=dtype), PReLU(), SpatialDropout(0.25),
        Conv(128, 3, init_scheme=init, dtype=dtype), PReLU(), SpatialDropout(0.25), AvgPool(2),
        Conv(256, 3, init_scheme=init, dtype=dtype), PReLU(), SpatialDropout(0.25), AvgPool(2),
        Conv(512, 3, init_scheme=init, dtype=dtype), PReLU(), SpatialDropout(0.25), AvgPool(2),
        Flatten(),
        Dense(512, init_scheme=init, dtype=dtype), PReLU(), Dropout(0.5),
        Dense(1, init_scheme=init, dtype=dtype), _act("sigmoid"),
    ])


def create_D_facegen(dimensions: Dims, dtype: Any = jnp.float32,
                     init: str = "heuristic") -> Module:
    """create_D_facegen (models.lua:339-383, unused upstream). Plain nn
    modules at top level: faithful ``init="torch"`` == heuristic (see
    create_D_default)."""
    if init == "torch":
        init = "heuristic"
    return Sequential([
        Conv(64, 3, init_scheme=init, dtype=dtype), PReLU(), SpatialDropout(0.2), AvgPool(2),
        Conv(128, 3, init_scheme=init, dtype=dtype), PReLU(), SpatialDropout(0.2), AvgPool(2),
        Conv(256, 3, init_scheme=init, dtype=dtype), PReLU(), SpatialDropout(0.2), AvgPool(2),
        Conv(512, 3, init_scheme=init, dtype=dtype), PReLU(), SpatialDropout(0.2), AvgPool(2),
        Flatten(),
        Dense(512, init_scheme=init, dtype=dtype), PReLU(), Dropout(0.5),
        Dense(512, init_scheme=init, dtype=dtype), PReLU(), Dropout(0.5),
        Dense(1, init_scheme=init, dtype=dtype), _act("sigmoid"),
    ])


def create_R(dimensions: Dims, noise_dim: int, noise_method: str,
             fixer: bool = False, dtype: Any = jnp.float32,
             init: str = "heuristic", dropout_impl: str = "threefry"
             ) -> Module:
    """models.create_R == create_R_default (models.lua:385-387)."""
    return create_R_default(dimensions, noise_dim, noise_method, fixer,
                            dtype, init, dropout_impl)


def create_R_default(dimensions: Dims, noise_dim: int, noise_method: str,
                     fixer: bool = False, dtype: Any = jnp.float32,
                     init: str = "heuristic",
                     dropout_impl: str = "threefry") -> Module:
    """create_R_default (models.lua:389-464).

    * ``fixer=True`` prepends a Dropout(0.5) that stays active even at
      inference (models.lua:399-406) — implemented via ``always_on``.
    * Tanh output head only for uniform noise (models.lua:452-454); the
      normal-noise R has an unbounded linear output.
    * ``init="torch"``: R is the one active model w_init fully reaches —
      plain nn.SpatialConvolution/nn.Linear, all top-level — so convs and
      linears are heuristic with zero bias in BOTH modes; only the BN
      scales differ (uniform(0,1) faithful vs ones default).
    * ``dropout_impl="kernel"``: element-dropout masks from the in-kernel
      counter hash (ops/dropout_kernel.py) — R's seven dropouts are the
      measured RNG hot spot of the training step (--dropout kernel on
      train_r); 'threefry' (default) keeps the reference mask stream.
    """
    assert noise_method in ("normal", "uniform"), noise_method
    c, h, w = dimensions
    bs = "torch" if init == "torch" else "ones"
    sc = "heuristic" if init == "torch" else init
    di = dropout_impl

    def block(feat):
        return [Conv(feat, 3, init_scheme=sc, dtype=dtype),
                BatchNorm(feat, scale_init=bs, dtype=dtype), _act("elu")]

    layers = []
    if fixer:
        layers.append(Dropout(0.5, always_on=True, impl=di))
    # 3 blocks at 64 channels (models.lua:409-423); nn.Dropout() default 0.5
    layers += [
        *block(64), Dropout(0.5, impl=di),
        *block(64), Dropout(0.5, impl=di),
        *block(64), MaxPool(2), Dropout(0.5, impl=di),
    ]
    # 3 blocks at 128 channels (models.lua:426-440)
    layers += [
        *block(128), Dropout(0.5, impl=di),
        *block(128), Dropout(0.5, impl=di),
        *block(128), SpatialDropout(0.25), MaxPool(2),
    ]
    layers += [
        Flatten(),
        Dense(512, init_scheme=sc, dtype=dtype),
        BatchNorm(512, scale_init=bs, dtype=dtype), _act("elu"),
        Dropout(0.5, impl=di),
        Dense(noise_dim, init_scheme=sc, dtype=dtype),
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
