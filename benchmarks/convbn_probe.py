"""Bounded probe: fused conv + TRAINING-mode BN stats for one hot d_step
shape — the round-3 VERDICT's one untried kernel axis for the d+g loop.

Context: d+g training sits at 49-51.5% MFU and the round-3 ablation found
no single removable ingredient (benchmarks/train_ablate.py). The remaining
hypothesis is a fusion ADDITION: in d_step, G's fake-half forward runs
train-mode BatchNorm, and XLA's schedule for conv -> batch mean/var ->
normalize makes one extra full pass over the conv output for the stats
reduction. This probe fuses the stats accumulation into the conv's
epilogue (grid-carried per-channel sum/sumsq accumulators, kmeans_kernel's
revision pattern), so the conv output is written once and read once:

  lax baseline:  x read + y write + y read (stats) + y read (norm) + out write
  fused:         x read + y write            + y read (norm) + out write

Shape: G3's hot conv at the flagship geometry — the 3x3 256->128 conv at
64x64 after the second upsample (models.lua:127-130), batch 256 bf16 =
the largest BN'd activation in the d_step G forward (~268 MB out).

Forward-only by design: the probe bounds the best case. The saved pass is
~268 MB of ~1.6 GB total traffic (~17% of THIS op, far less of the 23.15
ms step), so if the fwd fusion doesn't clearly win here, the training-MFU
kernel axis closes with numbers (RESULTS.md).

Usage: python benchmarks/convbn_probe.py [--cpu] [--smoke]
One JSON line per variant; parity asserted before timing.
"""
from __future__ import annotations

import functools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    if "--cpu" in argv:
        import jax
        jax.config.update("jax_platforms", "cpu")
    smoke = "--smoke" in argv

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from ganreverser_tpu.ops.topk_kernel import _auto_interpret
    from ganreverser_tpu.utils.timing import time_best

    interpret = _auto_interpret(None)
    if smoke:
        n, h, w, ci, co, tile_n, dtype = 4, 8, 8, 16, 32, 2, jnp.float32
    else:
        n, h, w, ci, co, tile_n, dtype = 256, 64, 64, 256, 128, 2, \
            jnp.bfloat16
    eps = 1e-5

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.fold_in(key, 1), (n, h, w, ci),
                          dtype) * 0.5
    k9 = (jax.random.normal(jax.random.fold_in(key, 2), (3, 3, ci, co),
                            jnp.float32) * 0.05).astype(dtype)
    gamma = jax.random.uniform(jax.random.fold_in(key, 3), (co,),
                               jnp.float32, 0.5, 1.5)
    beta = jax.random.normal(jax.random.fold_in(key, 4), (co,),
                             jnp.float32) * 0.1

    # ---- lax baseline: conv -> batch stats -> normalize -> relu ----
    @jax.jit
    def baseline(x, k9, gamma, beta):
        y = jax.lax.conv_general_dilated(
            x, k9.astype(x.dtype), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        mean = jnp.mean(y, axis=(0, 1, 2))
        var = jnp.mean(jnp.square(y), axis=(0, 1, 2)) - jnp.square(mean)
        inv = gamma * jax.lax.rsqrt(var + eps)
        out = jnp.maximum(y * inv + (beta - mean * inv), 0.0)
        return out.astype(x.dtype), mean, var

    # ---- fused kernel 1: conv + grid-carried sum/sumsq accumulation ----
    def conv_stats_kernel(x_ref, w_ref, y_ref, sum_ref, sq_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            sum_ref[:] = jnp.zeros_like(sum_ref)
            sq_ref[:] = jnp.zeros_like(sq_ref)

        t = x_ref.shape[0]
        acc = jnp.zeros((t * h * w, co), jnp.float32)
        for ky in range(3):
            for kx in range(3):
                patch = x_ref[:, ky:ky + h, kx:kx + w, :]
                acc += jax.lax.dot_general(
                    patch.reshape(t * h * w, ci), w_ref[ky * 3 + kx],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
        y_ref[:] = acc.reshape(t, h, w, co)
        sum_ref[:] += jnp.sum(acc, axis=0)[None]
        sq_ref[:] += jnp.sum(acc * acc, axis=0)[None]

    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))

    conv_stats = pl.pallas_call(
        conv_stats_kernel,
        grid=(n // tile_n,),
        in_specs=[
            pl.BlockSpec((tile_n, h + 2, w + 2, ci), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, ci, co), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tile_n, h, w, co), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, co), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, co), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            # f32 conv output: the baseline's conv also produces f32
            # (preferred_element_type) before the normalize consumes it
            jax.ShapeDtypeStruct((n, h, w, co), jnp.float32),
            jax.ShapeDtypeStruct((1, co), jnp.float32),
            jax.ShapeDtypeStruct((1, co), jnp.float32),
        ),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )

    @jax.jit
    def fused(xp, k9, gamma, beta):
        y, s, sq = conv_stats(xp, k9.reshape(9, ci, co).astype(xp.dtype))
        cnt = n * h * w
        mean = s[0] / cnt
        var = sq[0] / cnt - jnp.square(mean)
        inv = gamma * jax.lax.rsqrt(var + eps)
        out = jnp.maximum(y * inv + (beta - mean * inv), 0.0)
        return out.astype(xp.dtype), mean, var

    # ---- parity ----
    import numpy as np
    ob, mb, vb = baseline(x, k9, gamma, beta)
    of, mf, vf = fused(xp, k9, gamma, beta)
    np.testing.assert_allclose(np.asarray(mf), np.asarray(mb),
                               rtol=5e-3, atol=5e-3)
    np.testing.assert_allclose(np.asarray(vf), np.asarray(vb),
                               rtol=5e-3, atol=5e-3)
    err = np.max(np.abs(np.asarray(of, np.float32)
                        - np.asarray(ob, np.float32)))
    assert err < (0.1 if dtype == jnp.bfloat16 else 1e-3), err
    print(f"[convbn] parity ok (max |err| {err:.4g})", file=sys.stderr)

    t_base = time_best(baseline, x, k9, gamma, beta, repeats=3)
    t_fused = time_best(fused, xp, k9, gamma, beta, repeats=3)
    for name, t in (("lax conv+trainBN+relu", t_base),
                    ("fused conv+stats kernel", t_fused)):
        print(json.dumps({
            "metric": f"{name} {ci}->{co} @{h}x{w} b{n} "
                      f"{jnp.dtype(dtype).name}",
            "ms": round(t * 1e3, 3),
            "note": "fwd-only probe; fused saves one full stats read "
                    "of the conv output"}), flush=True)
    print(json.dumps({"metric": "fused/lax speedup",
                      "value": round(t_base / t_fused, 3)}), flush=True)


if __name__ == "__main__":
    main()
