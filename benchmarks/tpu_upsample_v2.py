"""Experiment: upsample kernel with channel-concatenated tap matmuls.

The shipped kernel (ops/upsample_conv_kernel.py) does 16 small dots —
4 taps x 4 phases of (T*H*W, Ci) x (Ci, Co). This variant concatenates
the 4 shifted patches of each phase on the channel (lane) axis and does
ONE (T*H*W, 4*Ci) x (4*Ci, Co) dot per phase: 4 big MXU ops, deeper K.

Run alone on TPU: timeout 900 python benchmarks/tpu_upsample_v2.py
Prints parity + amortized timing vs the shipped kernel AND the XLA
lhs-dilated form (the current whole-program winner). Productize only on a
measured win.

OUTCOME (2026-08-16, v5e): does not compile — Mosaic rejects the lane
concat of spatially-shifted slices ("Not implemented: result/input offset
mismatch on non-concat dimension"). The channel-stacked-K formulation
needs either materialized copies per tap (defeating the point) or a
future Mosaic. The XLA lhs-dilated form stays the production winner;
kept as a recorded negative result.
"""
from __future__ import annotations

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ganreverser_tpu.ops.upsample_conv_kernel import phase_kernels
from ganreverser_tpu.utils.timing import time_amortized


def _kernel_v2(h: int, w: int, out_dtype):
    def body(x_ref, k_ref, scale_ref, shift_ref, out_ref):
        """x_ref: (T, H+2, W+2, Ci); k_ref: (4, 4*Ci, Co) per-phase
        channel-stacked taps [a*2+b]; out: (T, 2H, 2W, Co)."""
        t = x_ref.shape[0]
        ci = x_ref.shape[-1]
        co = k_ref.shape[-1]
        phases = []
        for a in (0, 1):
            row = []
            for b in (0, 1):
                cat = jnp.concatenate(
                    [x_ref[:, a + ta:a + ta + h, b + tb:b + tb + w, :]
                     for ta in (0, 1) for tb in (0, 1)], axis=-1)
                acc = jax.lax.dot_general(
                    cat.reshape(t * h * w, 4 * ci), k_ref[a * 2 + b],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                y = jnp.maximum(acc * scale_ref[0] + shift_ref[0], 0.0)
                row.append(y.reshape(t, h, w, co))
            phases.append(row)
        rows = []
        for a in (0, 1):
            z = jnp.stack([phases[a][0], phases[a][1]], axis=3)
            rows.append(z.reshape(t, h, 2 * w, co))
        full = jnp.stack(rows, axis=2).reshape(t, 2 * h, 2 * w, co)
        out_ref[:] = full.astype(out_dtype)

    return body


@functools.partial(jax.jit, static_argnames=("tile_n",))
def upsample_v2(x, kernel, scale, shift, tile_n=2):
    n, h, w, ci = x.shape
    co = kernel.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    # (2,2,2,2,Ci,Co)[a,ta,b,tb] -> per-phase channel-stacked (4, 4Ci, Co)
    pk = phase_kernels(kernel)                      # f32
    k4 = jnp.stack([
        jnp.concatenate([pk[a, ta, b, tb]
                         for ta in (0, 1) for tb in (0, 1)], axis=0)
        for a in (0, 1) for b in (0, 1)])           # (4, 4Ci, Co)
    return pl.pallas_call(
        _kernel_v2(h, w, x.dtype),
        grid=(n // tile_n,),
        in_specs=[
            pl.BlockSpec((tile_n, h + 2, w + 2, ci), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, 4 * ci, co), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, co), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, co), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_n, 2 * h, 2 * w, co),
                               lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, 2 * h, 2 * w, co), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(xp, k4.astype(x.dtype), scale.reshape(1, co).astype(jnp.float32),
      shift.reshape(1, co).astype(jnp.float32))


def main():
    from ganreverser_tpu.ops.upsample_conv import upsample2_conv3x3_dilated
    from ganreverser_tpu.ops.upsample_conv_kernel import (
        upsample2_conv3x3_bn_act)
    print("backend:", jax.default_backend())
    for (h, ci, co) in ((16, 512, 256), (32, 256, 128)):
        n = 256
        key = jax.random.PRNGKey(0)
        x = jax.random.normal(jax.random.fold_in(key, 0), (n, h, h, ci),
                              jnp.bfloat16)
        kern = jax.random.normal(jax.random.fold_in(key, 1),
                                 (3, 3, ci, co), jnp.float32) * 0.04
        scale = jnp.ones((co,))
        shift = jnp.zeros((co,))

        v1 = jax.jit(lambda x: upsample2_conv3x3_bn_act(
            x, kern.astype(jnp.bfloat16), scale, shift, act="relu",
            tile_n=2, interpret=False))
        v2 = jax.jit(lambda x: upsample_v2(x, kern, scale, shift, tile_n=2))
        dil = jax.jit(lambda x: jnp.maximum(upsample2_conv3x3_dilated(
            x, kern, jnp.zeros((co,)), jnp.bfloat16), 0.0))

        @jax.jit
        def err(x):
            return jnp.max(jnp.abs(v2(x).astype(jnp.float32)
                                   - v1(x).astype(jnp.float32)))
        e = float(jax.device_get(err(x)))
        t1 = time_amortized(v1, x)
        t2 = time_amortized(v2, x)
        td = time_amortized(dil, x)
        print(f"{n}x{h}x{h}x{ci}->{co}: v1 {t1*1e3:.3f} ms | "
              f"v2(cat-K) {t2*1e3:.3f} ms | xla-dilated {td*1e3:.3f} ms | "
              f"max_err {e}", flush=True)


if __name__ == "__main__":
    main()
