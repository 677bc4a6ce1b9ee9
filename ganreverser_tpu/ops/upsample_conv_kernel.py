"""Pallas TPU kernel: fused nearest-upsample(2x) + 3x3 conv + BN(eval) + act.

G's hot block (models.lua:121-130: SpatialUpSamplingNearest + 3x3
SpatialConvolution + SpatialBatchNormalization + ReLU), as ONE kernel.

Why a kernel: a 3x3 window over a nearest-upsampled image only ever sees
2x2 *distinct* input pixels, so the op is 16 MACs/output-pixel instead of
the naive 36 — but the lax rewrite of that identity (ops/upsample_conv.py)
measured 2x SLOWER than XLA's naive pipeline on v5e because its
phase-deinterleave (slice/stack/transpose of an odd-size intermediate)
costs several extra HBM round trips. Here the four phase accumulators live
in VMEM and are interleaved on-chip right before the single HBM write:
one read of the low-res input, one write of the high-res output, BN and
activation folded into the epilogue.

Math (exact, not approximate — parity-tested against the composition in
tests/test_ops.py): output row 2i+a reads padded input rows (i+a, i+a+1)
with y-aggregated kernels [[W0, W1+W2], [W0+W1, W2]][a]; same along x.
Phase (a,b) therefore accumulates 4 shifted-patch matmuls with kernels
  K[a,ta,b,tb] = sum_{u in U(a,ta), v in U(b,tb)} W[u,v]
  U(0,0)={0} U(0,1)={1,2} U(1,0)={0,1} U(1,1)={2}.

Grid is over N only (whole spatial extent per block): G's stages are at
most 32x32x256 in / 64x64x128 out, whose f32 accumulators (4 x 0.5MB)
plus the bf16 input tile fit scoped VMEM comfortably at tile_n <= 4.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# per-axis aggregation: M[a, t, u] = 1 iff input tap u feeds phase a slot t
_AGG = np.zeros((2, 2, 3), np.float32)
_AGG[0, 0, 0] = 1.0                    # U(0,0) = {0}
_AGG[0, 1, 1] = _AGG[0, 1, 2] = 1.0    # U(0,1) = {1,2}
_AGG[1, 0, 0] = _AGG[1, 0, 1] = 1.0    # U(1,0) = {0,1}
_AGG[1, 1, 2] = 1.0                    # U(1,1) = {2}


def phase_kernels(kernel: jax.Array) -> jax.Array:
    """(3,3,Ci,Co) -> (2,2,2,2,Ci,Co) phase-aggregated 2x2 kernels,
    indexed [a, ta, b, tb]."""
    m = jnp.asarray(_AGG, kernel.dtype)
    return jnp.einsum("atu,bsv,uvio->atbsio", m, m, kernel)


def _apply_act(y, act):
    if act == "relu":
        return jnp.maximum(y, 0.0)
    if act == "sigmoid":
        return jax.nn.sigmoid(y)
    if act != "none":
        raise ValueError(act)
    return y


def _kernel(h: int, w: int, act: str, out_dtype, final_act: str):
    def body(x_ref, k_ref, scale_ref, shift_ref, *rest):
        """x_ref: (T, H+2, W+2, Ci) zero-padded by 1; k_ref: (16, Ci, Co)
        flattened [a,ta,b,tb]; scale/shift: (1, Co); out: (T, 2H, 2W, Co).
        With a fused final conv, ``rest`` is (fk_ref (9, Co, Cf),
        fb_ref (1, Cf), out_ref (T, 2H, 2W, Cf))."""
        out_ref = rest[-1]
        t = x_ref.shape[0]
        ci = x_ref.shape[-1]
        co = k_ref.shape[-1]
        phases = []
        for a in (0, 1):
            row = []
            for b in (0, 1):
                acc = jnp.zeros((t * h * w, co), jnp.float32)
                for ta in (0, 1):
                    for tb in (0, 1):
                        patch = x_ref[:, a + ta:a + ta + h,
                                      b + tb:b + tb + w, :]
                        acc += jax.lax.dot_general(
                            patch.reshape(t * h * w, ci),
                            k_ref[((a * 2 + ta) * 2 + b) * 2 + tb],
                            dimension_numbers=(((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
                y = _apply_act(acc * scale_ref[0] + shift_ref[0], act)
                row.append(y.reshape(t, h, w, co))
            phases.append(row)
        # on-chip interleave: columns first (w,2)->2w, then rows (h,2)->2h
        rows = []
        for a in (0, 1):
            z = jnp.stack([phases[a][0], phases[a][1]], axis=3)
            rows.append(z.reshape(t, h, 2 * w, co))
        full = jnp.stack(rows, axis=2).reshape(t, 2 * h, 2 * w, co)
        if len(rest) == 1:
            out_ref[:] = full.astype(out_dtype)
            return
        # fused trailing 3x3 SAME conv + bias + final_act (G's 128->C
        # output head, models.lua:132-133) over the VMEM-resident tile —
        # the high-res Co-channel activation never touches HBM
        fk_ref, fb_ref = rest[0], rest[1]
        cf = fk_ref.shape[-1]
        oh, ow = 2 * h, 2 * w
        xp = jnp.pad(full.astype(x_ref.dtype),
                     ((0, 0), (1, 1), (1, 1), (0, 0)))
        acc2 = jnp.zeros((t * oh * ow, cf), jnp.float32)
        for ky in range(3):
            for kx in range(3):
                patch = xp[:, ky:ky + oh, kx:kx + ow, :]
                acc2 += jax.lax.dot_general(
                    patch.reshape(t * oh * ow, co), fk_ref[ky * 3 + kx],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
        y2 = _apply_act(acc2 + fb_ref[0], final_act)
        out_ref[:] = y2.reshape(t, oh, ow, cf).astype(out_dtype)

    return body


@functools.partial(jax.jit, static_argnames=("act", "tile_n", "interpret",
                                             "out_dtype", "final_act"))
def upsample2_conv3x3_bn_act(x: jax.Array, kernel: jax.Array,
                             scale: jax.Array, shift: jax.Array, *,
                             act: str = "relu", tile_n: int = 2,
                             interpret=None, out_dtype=None,
                             final_kernel: jax.Array | None = None,
                             final_bias: jax.Array | None = None,
                             final_act: str = "sigmoid") -> jax.Array:
    """x: (N,H,W,Ci); kernel: (3,3,Ci,Co) — the UNFUSED conv's parameters
    (checkpoint-compatible); scale/shift: (Co,) from fold_batchnorm (pass
    scale=1, shift=bias for a plain conv). Returns (N,2H,2W,Co).

    With ``final_kernel (3,3,Co,Cf)`` / ``final_bias (Cf,)``, a trailing
    3x3 SAME conv + ``final_act`` is fused into the same kernel (G's
    output head, models.lua:132-133) and the return is (N,2H,2W,Cf) —
    the (N,2H,2W,Co) intermediate never leaves VMEM.

    Eval-mode only (BN running stats folded); N % tile_n == 0.
    """
    from .topk_kernel import _auto_interpret
    interpret = _auto_interpret(interpret)
    n, h, w, ci = x.shape
    co = kernel.shape[-1]
    assert n % tile_n == 0, (n, tile_n)
    out_dtype = out_dtype or x.dtype

    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    k16 = phase_kernels(kernel).reshape(16, ci, co).astype(x.dtype)
    scale2 = scale.reshape(1, co).astype(jnp.float32)
    shift2 = shift.reshape(1, co).astype(jnp.float32)

    in_specs = [
        pl.BlockSpec((tile_n, h + 2, w + 2, ci), lambda i: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((16, ci, co), lambda i: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, co), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, co), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    operands = [xp, k16, scale2, shift2]
    c_out = co
    if final_kernel is not None:
        cf = final_kernel.shape[-1]
        operands += [final_kernel.reshape(9, co, cf).astype(x.dtype),
                     final_bias.reshape(1, cf).astype(jnp.float32)]
        in_specs += [
            pl.BlockSpec((9, co, cf), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cf), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ]
        c_out = cf

    return pl.pallas_call(
        _kernel(h, w, act, out_dtype,
                final_act if final_kernel is not None else "none"),
        grid=(n // tile_n,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tile_n, 2 * h, 2 * w, c_out),
                               lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, 2 * h, 2 * w, c_out), out_dtype),
        interpret=interpret,
        # the default 16MB scoped-vmem budget rejects useful tiles (measured
        # 26.7MB at tile_n=4, 256x32x32x512->256); v5e has 128MB physical
        # VMEM — raise the cap and let double buffering use it
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(*operands)
