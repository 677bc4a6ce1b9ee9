"""Symmetric int8 quantization helpers — the R-inversion serving candidate.

The headline workload (reference: apply_r.lua:143-153 — invert 10k
generated faces with R) runs R's conv stack in bf16 at 72-74k img/s/chip
(measured, benchmarks/RESULTS.md). The v5e MXU executes int8 x int8 ->
int32 at 2x the bf16 MAC rate (394 TOPs vs 197 TFLOPs peak), so a
weight+activation int8 path is the one remaining >1.5x lever on the
headline number — IF XLA's TPU conv emitter routes int8 convs onto the
int8 MXU path rather than widening. That routing is a MEASUREMENT
(benchmarks/tpu_kernel_check.py int8_r), not an assumption; this module
ships as an opt-in candidate until the hardware numbers decide (same
policy as every other optimized op in ops/).

Scheme (standard symmetric int8, chosen so SAME zero-padding stays
exact: 0.0 quantizes to 0):

  weights      per-output-channel scales, s_w[co] = maxabs/127,
               BN folded into the weights FIRST (eval mode) so the
               quantization grid adapts to the folded magnitudes
  activations  per-tensor dynamic scale, s_x = maxabs/127, computed on
               device per call (one cheap reduction vs the conv it feeds)
  accumulate   int32 (exact); dequantize y * (s_x * s_w[co]) + bias,
               then the nonlinearity in float

Accuracy contract: the int8 path is an approximation; its effect on the
reference-visible output (top-k similarity RANKINGS, apply_r.lua:275)
is measured on device as topk_recall(exact bf16, int8) by the kernel
check, mirroring how the approx_max_k path earned its opt-in flag.
Implementation exactness (the int math itself) is pinned bit-exact
against a numpy int32 reference in tests/test_quant.py.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax

_QMAX = 127.0


def quantize_symmetric(x: jax.Array, axis=None,
                       eps: float = 1e-12) -> Tuple[jax.Array, jax.Array]:
    """Quantize to int8 on a symmetric grid: returns (q, scale) with
    x ~= q * scale, q in [-127, 127] (never -128, keeping the grid
    symmetric so negation and zero-padding are exact).

    ``axis``: None -> one per-tensor scale (shape ()); otherwise the
    axes to REDUCE over, leaving per-slice scales for the rest (e.g.
    axis=(0, 1, 2) on an HWIO conv kernel -> per-output-channel scales).
    """
    a = jnp.abs(x.astype(jnp.float32))
    m = jnp.max(a) if axis is None else jnp.max(a, axis=axis, keepdims=True)
    scale = jnp.maximum(m, eps) / _QMAX
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -_QMAX, _QMAX)
    return q.astype(jnp.int8), scale


def quant_conv3x3_same(xq: jax.Array, x_scale: jax.Array, wq: jax.Array,
                       w_scale: jax.Array, bias: jax.Array) -> jax.Array:
    """int8 3x3 SAME conv with exact int32 accumulation, dequantized to
    f32: conv(xq, wq) * (x_scale * w_scale) + bias.

    xq: (N, H, W, Ci) int8; x_scale: scalar (per-tensor).
    wq: (3, 3, Ci, Co) int8; w_scale: (1, 1, 1, Co) per-channel.
    bias: (Co,) f32 (the folded-BN shift). Returns f32 (N, H, W, Co).
    """
    y = lax.conv_general_dilated(
        xq, wq, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    deq = (x_scale * w_scale).reshape(1, 1, 1, -1)
    return y.astype(jnp.float32) * deq + bias.astype(jnp.float32)


def quant_dense(xq: jax.Array, x_scale: jax.Array, wq: jax.Array,
                w_scale: jax.Array, bias: jax.Array) -> jax.Array:
    """int8 dense with int32 accumulation: (xq @ wq) * scales + bias.

    xq: (N, K) int8; wq: (K, M) int8; w_scale: (1, M) per-column;
    bias: (M,) f32. Returns f32 (N, M).
    """
    y = lax.dot_general(xq, wq, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32)
    return y.astype(jnp.float32) * (x_scale * w_scale) + bias.astype(
        jnp.float32)


def quant_act(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Dynamic per-tensor activation quantization (one maxabs reduction)."""
    return quantize_symmetric(x, axis=None)


def fold_quantize_conv(kernel: jax.Array, scale: jax.Array,
                       shift: jax.Array):
    """Fold eval-BN (scale, shift) from ops.conv_kernel.fold_batchnorm into
    the conv kernel, then quantize per-output-channel. Returns
    (wq int8 HWIO, w_scale (1,1,1,Co), bias f32 (Co,))."""
    w = kernel.astype(jnp.float32) * scale.reshape(1, 1, 1, -1)
    wq, w_scale = quantize_symmetric(w, axis=(0, 1, 2))
    return wq, w_scale, shift.astype(jnp.float32)


def fold_quantize_dense(kernel: jax.Array, scale: jax.Array,
                        shift: jax.Array):
    """Same for a dense kernel (K, M) with per-column scales."""
    w = kernel.astype(jnp.float32) * scale.reshape(1, -1)
    wq, w_scale = quantize_symmetric(w, axis=(0,))
    return wq, w_scale.reshape(1, -1), shift.astype(jnp.float32)
