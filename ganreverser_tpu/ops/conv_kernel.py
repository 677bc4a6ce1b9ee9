"""Pallas TPU kernel: fused 3x3 conv + BatchNorm(eval) + activation.

The inference building block of G/D/R (models.lua's SpatialConvolution +
SpatialBatchNormalization + ReLU/ELU stacks). The conv is expressed as nine
shifted (N*H*W, Ci) x (Ci, Co) MXU matmuls over a VMEM-resident batch tile,
with the eval-mode BatchNorm folded to a per-channel scale/shift epilogue and
the activation applied before the single write-back to HBM — one HBM round
trip for the whole conv+BN+act block.

Eval-mode only (running statistics folded on the host; training BN needs
batch statistics, which stay on the lax path). Parity tests vs the module
composition: tests/test_pallas.py. Like the other Pallas ops this is an
opt-in alternative — XLA's cuDNN-class conv emitter remains the default.

STATUS: the round-1 default (tile_n=8 at 64x64x64: 8.4MB f32 accumulator
plus patch intermediates) overflowed the 16MB scoped-vmem limit; the
default is now tile_n=2 (2.1MB accumulator + ~1.1MB padded bf16 input),
which fits every G/D/R stage shape. Single-layer use is largely superseded
by ops/conv_block_kernel.py (fuses whole conv chains + pool) and
ops/upsample_conv_kernel.py (G's upsample blocks); this kernel remains for
one-off conv+BN+act(+pool) shapes and as the PReLU-epilogue variant.
"""
from __future__ import annotations



import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _make_kernel(h: int, w: int, act: str, pool: bool):
    def kernel(x_ref, w_ref, scale_ref, shift_ref, alpha_ref, out_ref):
        """x_ref: (T, H+2, W+2, Ci) pre-padded; w_ref: (9, Ci, Co);
        scale/shift: (1, Co); alpha: (1, 1) PReLU slope;
        out: (T, H, W, Co) or (T, H/2, W/2, Co) when pooled."""
        t = x_ref.shape[0]
        ci = x_ref.shape[-1]
        co = w_ref.shape[-1]
        acc = jnp.zeros((t * h * w, co), jnp.float32)
        for ky in range(3):
            for kx in range(3):
                patch = x_ref[:, ky:ky + h, kx:kx + w, :]
                acc += jax.lax.dot_general(
                    patch.reshape(t * h * w, ci).astype(jnp.float32),
                    w_ref[ky * 3 + kx].astype(jnp.float32),
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
        y = acc * scale_ref[0] + shift_ref[0]
        if act == "relu":
            y = jnp.maximum(y, 0.0)
        elif act == "elu":
            # expm1 has no Mosaic lowering; exp(y)-1 on the clamped negative
            # side is exact to fp32 rounding for the ELU range
            y = jnp.where(y > 0, y, jnp.exp(jnp.minimum(y, 0.0)) - 1.0)
        elif act == "prelu":
            # nn.PReLU's shared scalar slope (D/R blocks, models.lua:276)
            y = jnp.where(y >= 0, y, alpha_ref[0, 0] * y)
        elif act != "none":
            raise ValueError(act)
        y = y.reshape(t, h, w, co)
        if pool:
            # fused 2x2 maxpool epilogue (nn.SpatialMaxPooling(2,2)):
            # the conv+act+pool block writes H*W/4 instead of H*W to HBM
            y = y.reshape(t, h // 2, 2, w // 2, 2, co)
            y = jnp.max(jnp.max(y, axis=4), axis=2)
        out_ref[:] = y.astype(out_ref.dtype)

    return kernel


def fold_batchnorm(bn_params: dict, bn_state: dict, conv_bias: jax.Array,
                   eps: float = 1e-5):
    """Fold conv bias + eval-mode BN into per-channel (scale, shift):
    y = (conv + bias - mean) * g/sqrt(var+eps) + b."""
    g = bn_params["scale"].astype(jnp.float32)
    b = bn_params["bias"].astype(jnp.float32)
    mean = bn_state["mean"].astype(jnp.float32)
    var = bn_state["var"].astype(jnp.float32)
    inv = g * jax.lax.rsqrt(var + eps)
    scale = inv
    shift = (conv_bias.astype(jnp.float32) - mean) * inv + b
    return scale, shift


def conv3x3_bn_act(x: jax.Array, kernel: jax.Array, scale: jax.Array,
                   shift: jax.Array, *, act: str = "relu",
                   prelu_alpha: float = 0.25, pool: bool = False,
                   tile_n: int = 2, interpret=None,
                   out_dtype=None) -> jax.Array:
    """x: (N, H, W, Ci); kernel: (3, 3, Ci, Co); scale/shift: (Co,).
    N must be a multiple of tile_n. ``act='prelu'`` uses the shared scalar
    slope ``prelu_alpha``; ``pool=True`` fuses a trailing 2x2 maxpool
    (the D/R conv+PReLU+pool block, SURVEY.md §7 step 7)."""
    from .topk_kernel import _auto_interpret
    interpret = _auto_interpret(interpret)
    n, h, w, ci = x.shape
    co = kernel.shape[-1]
    assert n % tile_n == 0, (n, tile_n)
    if pool:
        assert h % 2 == 0 and w % 2 == 0, (h, w)
    out_dtype = out_dtype or x.dtype
    oh, ow = (h // 2, w // 2) if pool else (h, w)

    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    w9 = kernel.reshape(9, ci, co)
    scale2 = scale.reshape(1, co).astype(jnp.float32)
    shift2 = shift.reshape(1, co).astype(jnp.float32)
    alpha2 = jnp.full((1, 1), prelu_alpha, jnp.float32)

    return pl.pallas_call(
        _make_kernel(h, w, act, pool),
        grid=(n // tile_n,),
        in_specs=[
            pl.BlockSpec((tile_n, h + 2, w + 2, ci), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, ci, co), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, co), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, co), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_n, oh, ow, co), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, oh, ow, co), out_dtype),
        interpret=interpret,
        # raise the conservative 16MB scoped-vmem default (v5e: 128MB
        # physical) — see the sibling kernels' measured overflows
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(xp, w9, scale2, shift2, alpha2)
