"""Pallas TPU kernel: a CHAIN of 3x3 conv + BN(eval) + activation layers,
with an optional trailing 2x2 maxpool — one HBM read, one HBM write.

R's backbone is two such blocks (models.lua:409-440: 3x [SpatialConvolution
+ SpatialBatchNormalization + ELU] then SpatialMaxPooling(2,2), at 64 then
128 channels) and it is the inversion hot path — the BASELINE.json headline.
XLA fuses BN+act into each conv's epilogue but CANNOT fuse across convs:
every layer's activation round-trips HBM. Here the whole chain's
activations stay in VMEM; with the pool folded in, the block writes H*W/4
instead of 3x H*W.

SAME-padding correctness across chained layers: each layer's input is
re-zero-padded IN VMEM (jnp.pad) so image-boundary semantics match the
composition exactly — a halo scheme would leak garbage (conv-of-zeros =
bias, then BN/ELU != 0) into the next layer's padding ring.

VMEM budget (per grid step, bf16 acts / f32 accumulator):
R stage 1 (64ch @ 64x64): acc 1.0MB + 2x padded act 0.57MB per image ->
tile_n <= 4. Stage 2 (128ch @ 32x32): half that. Grid is over N only.

Eval-mode only (the Dropout layers between convs are identity in eval,
models.lua:412-439). Parity: tests/test_ops.py::test_conv_block_kernel*.
"""
from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _act(y, kind: str):
    if kind == "relu":
        return jnp.maximum(y, 0.0)
    if kind == "elu":
        # expm1 has no Mosaic lowering; exp on the clamped negative side is
        # exact to fp32 rounding for the ELU range (see conv_kernel.py)
        return jnp.where(y > 0, y, jnp.exp(jnp.minimum(y, 0.0)) - 1.0)
    if kind == "none":
        return y
    raise ValueError(kind)


def _make_kernel(h: int, w: int, n_layers: int, act: str, pool: bool,
                 out_dtype):
    def body(x_ref, *refs):
        """x_ref: (T, H+2, W+2, C0) zero-padded by 1;
        refs: per layer (w9_ref (9, Ci, Co), scale_ref (1, Co),
        shift_ref (1, Co)) triplets, then out_ref."""
        out_ref = refs[-1]
        t = x_ref.shape[0]
        xp = x_ref[:]
        for li in range(n_layers):
            w9 = refs[3 * li]
            scale = refs[3 * li + 1]
            shift = refs[3 * li + 2]
            ci = w9.shape[1]
            co = w9.shape[2]
            acc = jnp.zeros((t * h * w, co), jnp.float32)
            for ky in range(3):
                for kx in range(3):
                    patch = xp[:, ky:ky + h, kx:kx + w, :]
                    acc += jax.lax.dot_general(
                        patch.reshape(t * h * w, ci), w9[ky * 3 + kx],
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
            y = _act(acc * scale[0] + shift[0], act)
            y = y.reshape(t, h, w, co).astype(x_ref.dtype)
            if li + 1 < n_layers:
                # re-zero-pad in VMEM: exact SAME semantics for next layer
                xp = jnp.pad(y, ((0, 0), (1, 1), (1, 1), (0, 0)))
        if pool:
            y = y.reshape(t, h // 2, 2, w // 2, 2, y.shape[-1])
            y = jnp.max(jnp.max(y, axis=4), axis=2)
        out_ref[:] = y.astype(out_dtype)

    return body


@functools.partial(jax.jit,
                   static_argnames=("act", "pool", "tile_n", "interpret",
                                    "out_dtype"))
def conv_block(x: jax.Array, kernels: Sequence[jax.Array],
               scales: Sequence[jax.Array], shifts: Sequence[jax.Array], *,
               act: str = "elu", pool: bool = False, tile_n: int = 2,
               interpret=None, out_dtype=None) -> jax.Array:
    """x: (N,H,W,C0); kernels[i]: (3,3,Ci,Co); scales/shifts[i]: (Co,) from
    fold_batchnorm. Returns (N,H,W,Ck) or (N,H/2,W/2,Ck) with pool."""
    from .topk_kernel import _auto_interpret
    interpret = _auto_interpret(interpret)
    n, h, w, _ = x.shape
    n_layers = len(kernels)
    assert n_layers == len(scales) == len(shifts)
    assert n % tile_n == 0, (n, tile_n)
    if pool:
        assert h % 2 == 0 and w % 2 == 0, (h, w)
    out_dtype = out_dtype or x.dtype
    co_last = kernels[-1].shape[-1]
    oh, ow = (h // 2, w // 2) if pool else (h, w)

    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    in_specs = [pl.BlockSpec((tile_n, h + 2, w + 2, x.shape[-1]),
                             lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM)]
    operands = [xp]
    for k, sc, sh_ in zip(kernels, scales, shifts):
        ci, co = k.shape[2], k.shape[3]
        operands += [k.reshape(9, ci, co).astype(x.dtype),
                     sc.reshape(1, co).astype(jnp.float32),
                     sh_.reshape(1, co).astype(jnp.float32)]
        in_specs += [
            pl.BlockSpec((9, ci, co), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, co), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, co), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ]

    return pl.pallas_call(
        _make_kernel(h, w, n_layers, act, pool, out_dtype),
        grid=(n // tile_n,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tile_n, oh, ow, co_last),
                               lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, oh, ow, co_last), out_dtype),
        interpret=interpret,
        # measured 38.9MB scoped usage at tile_n=4 (R stage 1 @64x64) vs
        # the conservative 16MB default; v5e VMEM is 128MB physical
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(*operands)
