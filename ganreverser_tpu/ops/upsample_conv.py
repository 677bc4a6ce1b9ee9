"""Fused nearest-upsample(2x) + 3x3 conv — G's hot op (models.lua:121-130).

The naive composition materializes the 2x-upsampled activation and convolves
at the doubled resolution: 36·H·W·Ci·Co MACs and 4x the HBM traffic. But a
3x3 window over a nearest-upsampled image only ever sees 2x2 *distinct*
input pixels, with tap weights that depend on the output pixel's parity:

  output row 2r   (py=0): input rows (r-1, r) with y-weights (W0, W1+W2)
  output row 2r+1 (py=1): input rows (r, r+1) with y-weights (W0+W1, W2)

(same along x), so the whole op is four 2x2 convs at the ORIGINAL resolution
with parity-aggregated kernels, pixel-shuffled into the output:
~16·H·W·Ci·Co MACs (2.25x fewer) reading the small input once. The four
kernels are stacked on the output-channel axis so the MXU sees one big
matmul. Exact-equivalence (not approximation) to the naive composition is
tested in tests/test_ops.py.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .precision import conv_f32acc


def upsample2_conv3x3_reference(x, kernel, bias, dtype=jnp.float32):
    """Naive composition: repeat-upsample then SAME 3x3 conv (the baseline
    the fused path is tested against)."""
    up = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
    y = conv_f32acc(up.astype(dtype), kernel.astype(dtype), (1, 1), "SAME",
                    None, ("NHWC", "HWIO", "NHWC"))
    return (y + bias).astype(dtype)


def upsample2_conv3x3_dilated(x, kernel, bias, dtype=jnp.float32):
    """Same op as one lhs-dilated conv — no explicit pixel shuffle.

    conv3x3(SAME) over nearest-up2(x) is, per output parity, a 2-tap conv
    per spatial dim (see module docstring). Zero-insertion (lhs_dilation=2)
    makes BOTH parities expressible with ONE 4-tap kernel, because the
    inserted zeros mask whichever taps the parity doesn't use:

      w4 = [w0, w0+w1, w1+w2, w2]        (per spatial dim)

      even output 2r   (pad 2): hits dilated slots 2r-2, 2r  -> w4[0], w4[2]
      odd  output 2r+1 (pad 2): hits slots 2r, 2r+2          -> w4[1], w4[3]

    which reproduces exactly the parity-aggregated taps. XLA:TPU lowers
    lhs-dilated convs natively (it is the transposed-conv/grad pattern), so
    the interleave never round-trips HBM — the failure mode that made the
    explicit-shuffle variant above 2x slower than naive in round 1.
    Exact equivalence tested in tests/test_ops.py.
    """
    a = jnp.asarray([[1.0, 0.0, 0.0],
                     [1.0, 1.0, 0.0],
                     [0.0, 1.0, 1.0],
                     [0.0, 0.0, 1.0]], jnp.float32)  # (4,3) tap-agg map
    w = kernel.astype(jnp.float32)
    # (3,3,Ci,Co) -> (4,3,Ci,Co) -> (4,4,Ci,Co): aggregate y-taps then
    # x-taps — in f32 regardless of compute dtype so tap sums round ONCE
    # (trace-time constant folding on weights; zero runtime cost)
    w4 = jnp.einsum("ay,yxio->axio", a, w)
    w4 = jnp.einsum("bx,axio->abio", a, w4)
    y = conv_f32acc(x.astype(dtype), w4.astype(dtype), (1, 1),
                    ((2, 2), (2, 2)), (2, 2), ("NHWC", "HWIO", "NHWC"))
    return (y + bias).astype(dtype)


def upsample2_conv3x3(x, kernel, bias, dtype=jnp.float32):
    """Fused path. x: (N,H,W,Ci), kernel: (3,3,Ci,Co), bias: (Co,).
    Returns (N,2H,2W,Co)."""
    n, h, w, ci = x.shape
    co = kernel.shape[-1]
    W = kernel.astype(jnp.float32)  # aggregate taps in f32, cast once below

    # parity-aggregated kernels along y: (2,3,Ci,Co)
    wy0 = jnp.stack([W[0], W[1] + W[2]])          # output rows 2r
    wy1 = jnp.stack([W[0] + W[1], W[2]])          # output rows 2r+1

    def agg_x(wy):
        return (jnp.stack([wy[:, 0], wy[:, 1] + wy[:, 2]], axis=1),
                jnp.stack([wy[:, 0] + wy[:, 1], wy[:, 2]], axis=1))

    k00, k01 = agg_x(wy0)
    k10, k11 = agg_x(wy1)
    k_all = jnp.concatenate([k00, k01, k10, k11],
                            axis=-1).astype(dtype)           # (2,2,Ci,4Co)

    xp = jnp.pad(x.astype(dtype), ((0, 0), (1, 1), (1, 1), (0, 0)))
    y = conv_f32acc(xp, k_all, (1, 1), "VALID", None,
                    ("NHWC", "HWIO", "NHWC"))      # (N, H+1, W+1, 4Co)

    y00 = y[:, :h, :w, 0 * co:1 * co]
    y01 = y[:, :h, 1:, 1 * co:2 * co]
    y10 = y[:, 1:, :w, 2 * co:3 * co]
    y11 = y[:, 1:, 1:, 3 * co:4 * co]
    # pixel shuffle: (N,H,W,2,2,Co) -> (N,2H,2W,Co)
    t = jnp.stack([y00, y01, y10, y11], axis=3).reshape(n, h, w, 2, 2, co)
    out = t.transpose(0, 1, 3, 2, 4, 5).reshape(n, 2 * h, 2 * w, co)
    return (out + bias).astype(dtype)
