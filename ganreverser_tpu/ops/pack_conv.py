"""Lane-packed small-Co convolution — the G output-stage candidate.

G's final stage (models.lua:132-133: 3x3 conv 128->C + Sigmoid) has
Co = 3 (or 1): an MXU pass computes 128 output channels regardless, so
~125/128 of every systolic pass is wasted — the conv's MAC-SLOT cost is
that of a 128-channel conv (~600M slots/img at 64x64) for 14M useful
MACs.

The fix stays pure XLA: SPACE-TO-DEPTH ON THE OUTPUT. A block of
ph x pw output pixels shares one input window of (ph+2) x (pw+2) rows
(SAME 3x3), so the op is exactly expressible as ONE strided conv

  window (ph+2, pw+2), stride (ph, pw), Co' = ph*pw*C

with a block kernel whose (pi, pj, c) output channel holds the original
3x3 kernel shifted to offset (pi, pj):

  W'[ky, kx, ci, (pi, pj, c)] = W[ky-pi, kx-pj, ci, c]   (0 <= ky-pi < 3)

MAC-slots per image at 64x64, Ci=128, C=3:
  naive          64*64 pos * 9*128 taps * 128 lane-slots  = 604M
  pack (4, 8)    16*8  pos * 60*128 taps * 128 (96 used)  = 126M   (4.8x)
  pack (8, 8)    8*8   pos * 100*128 taps * 128 (all used)= 105M   (5.8x)

The packed result unpacks with one reshape/transpose of the tiny output
tensor (24 KB/img bf16 at the flagship shape). Whether the slot win
survives XLA's actual small-channel conv emitter is a MEASUREMENT
(benchmarks/tpu_kernel_check.py s3_packed); this op ships as an opt-in
candidate until the hardware numbers pick a default.

The same reformulation applies to any Co < 128: R's backbone has three
Co=64 conv3x3 blocks (models.lua:409-423 — 378 of R's ~703 MMAC/img at
64x64) that fill only half the MXU lanes — A/B leg:
benchmarks/tpu_kernel_check.py co64_packed. Contraction-pass math for
the (1,2) pack at Ci=Co=64 (128-deep MXU contraction, 128 lanes):
  naive  : H*W positions x ceil(9*64/128)=5 passes, half the lanes idle
  packed : H*W/2 positions x ceil(12*64/128)=6 passes, lanes full
           -> 0.6x the naive pass count, but pays a 2*H*W*64 relayout
           per conv (the unpack transpose — HBM-bound, same order as
           the conv itself at these shapes)
  packed-to-packed (a chain keeping the layout, window (3,3) over
  packed cols, Ci'=Co'=128): only 6 of 12 (tap, j_in, j_out) combos are
  nonzero, so the sparsity moves INTO the contraction -> 9 passes at
  half density = 0.9x naive. Chain bonus: maxpool(2) with pw=2 consumes
  the packing for free (the j blocks ARE the width pool pair).
Neither dominates on paper once XLA's own Co=64 emitter (measured 64%
of peak whole-R) is the baseline — hence measurement first, chain only
on a per-op win that survives the transpose.

Exact equivalence to conv3x3(SAME)+bias (+activation) is pinned in
tests/test_ops.py.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .precision import conv_f32acc


def pack_kernel(kernel: jax.Array, pack: Tuple[int, int]) -> jax.Array:
    """(kh, kw, Ci, Co) -> (kh+ph-1, kw+pw-1, Ci, ph*pw*Co) block kernel
    (f32; built from shifted copies at trace time — constant-folds when
    the weights are constants, and is negligible next to the conv when
    they are arguments)."""
    ph, pw = pack
    kh, kw, ci, co = kernel.shape
    w = kernel.astype(jnp.float32)
    big = jnp.zeros((kh + ph - 1, kw + pw - 1, ci, ph, pw, co),
                    jnp.float32)
    for pi in range(ph):
        for pj in range(pw):
            big = big.at[pi:pi + kh, pj:pj + kw, :, pi, pj, :].add(w)
    return big.reshape(kh + ph - 1, kw + pw - 1, ci, ph * pw * co)


def conv3x3_packed(x: jax.Array, kernel: jax.Array, bias: jax.Array,
                   pack: Tuple[int, int] = (4, 8), act: Optional[str] = None,
                   dtype=jnp.float32) -> jax.Array:
    """SAME 3x3 conv + bias (+ 'sigmoid'/'relu') with the output computed
    in ph x pw pixel blocks so small Co fills MXU lanes.

    x: (N, H, W, Ci) with H % ph == 0 and W % pw == 0;
    kernel: (3, 3, Ci, Co); bias: (Co,). Returns (N, H, W, Co) — exact
    same values as the unpacked composition (tests/test_ops.py)."""
    ph, pw = pack
    n, h, w, ci = x.shape
    kh, kw, _, co = kernel.shape
    if h % ph or w % pw:
        raise ValueError(f"geometry {h}x{w} not divisible by pack {pack}")
    wb = pack_kernel(kernel, pack).astype(dtype)
    y = conv_f32acc(x.astype(dtype), wb, (ph, pw),
                    ((kh // 2, kh // 2), (kw // 2, kw // 2)), None,
                    ("NHWC", "HWIO", "NHWC"))   # (N, H/ph, W/pw, ph*pw*Co)
    y = y + jnp.tile(bias.astype(jnp.float32), ph * pw)
    if act == "sigmoid":
        y = jax.nn.sigmoid(y)
    elif act == "relu":
        y = jnp.maximum(y, 0.0)
    elif act == "elu":
        y = jax.nn.elu(y)
    elif act is not None:
        raise ValueError(act)
    y = y.astype(dtype).reshape(n, h // ph, w // pw, ph, pw, co)
    return y.transpose(0, 1, 3, 2, 4, 5).reshape(n, h, w, co)
