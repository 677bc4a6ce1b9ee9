"""Per-stage timing of the eval G forward — where do its milliseconds live?

Context: the fused e2e pipeline (bench.py --full, analysis/e2e.py) is
G-bound — measured eval G 53-54k img/s vs R 72-74k on v5e (RESULTS.md).
The upsample axis itself is closed (the lhs-dilated single conv won and
is the module default), but the G COMPOSITION has four stages and no
measurement says which one holds the remaining time:

  s0  Dense(nd -> 512*H/4*W/4) + folded BN + ReLU       (tiny FLOPs, big fan-out)
  s1  upsample2+conv3x3 512->256 + BN + ReLU @ H/4      (537 MMAC/img at 64x64)
  s2  upsample2+conv3x3 256->128 + BN + ReLU @ H/2      (537 MMAC/img)
  s3  conv3x3 128->C + sigmoid @ H                      (14 MMAC/img, Co=3
                                                         wastes MXU lanes)

Each stage is timed amortized (utils/timing.py — the tunnel's ~28 ms
dispatch latency swamps single-dispatch numbers) on its own real input
shape, plus the whole assembled G for the cross-check: stages should sum
to ~the whole (XLA fuses BN/act into the convs in both cases; what the
split can't see is inter-stage fusion, which the sum-vs-whole gap
exposes).

Usage: python benchmarks/g_breakdown.py [--cpu] [--smoke]
One JSON line per stage. Reference workload: apply_r.lua:143-147's
createImages leg at the flagship 64x64 geometry.
"""
from __future__ import annotations

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

    from ganreverser_tpu import models as M
    from ganreverser_tpu.models.fastpath import make_fast_generator_xla
    from ganreverser_tpu.ops.conv_kernel import fold_batchnorm
    from ganreverser_tpu.ops.upsample_conv import upsample2_conv3x3_dilated
    from ganreverser_tpu.utils.timing import time_amortized

    dims = (3, 16, 16) if smoke else (3, 64, 64)
    nd, batch = 100, (16 if smoke else 256)
    dtype = jnp.bfloat16
    c, h, w = dims
    sh, sw = h // 4, w // 4

    G = M.create_G(dims, nd, dtype=dtype)
    key = jax.random.PRNGKey(0)
    gv, _ = G.init(key, (nd,))
    p, s = gv["params"], gv["state"]
    z = jax.random.normal(jax.random.fold_in(key, 1), (batch, nd), jnp.float32)

    # stage inputs at their real shapes (values irrelevant for timing)
    x1 = jax.random.normal(jax.random.fold_in(key, 2),
                           (batch, sh, sw, 512)).astype(dtype)
    x2 = jax.random.normal(jax.random.fold_in(key, 3),
                           (batch, 2 * sh, 2 * sw, 256)).astype(dtype)
    x3 = jax.random.normal(jax.random.fold_in(key, 4),
                           (batch, h, w, 128)).astype(dtype)

    sc0, sh0 = fold_batchnorm(p["l1"], s["l1"], p["l0"]["bias"])
    k0 = (p["l0"]["kernel"].astype(jnp.float32) * sc0[None, :]).astype(dtype)
    sc1, sh1 = fold_batchnorm(p["l6"], s["l6"], p["l5"]["bias"])
    k1 = (p["l5"]["kernel"].astype(jnp.float32)
          * sc1[None, None, None, :]).astype(dtype)
    sc2, sh2 = fold_batchnorm(p["l10"], s["l10"], p["l9"]["bias"])
    k2 = (p["l9"]["kernel"].astype(jnp.float32)
          * sc2[None, None, None, :]).astype(dtype)

    def s0(zz):
        y = jnp.dot(zz.astype(dtype), k0,
                    preferred_element_type=jnp.float32) + sh0
        return jnp.maximum(y, 0.0).astype(dtype).reshape(zz.shape[0], sh_,
                                                         sw_, 512)

    sh_, sw_ = sh, sw

    def s1(x):
        y = upsample2_conv3x3_dilated(x, k1, sh1, dtype)
        return jnp.maximum(y, 0.0).astype(dtype)

    def s2(x):
        y = upsample2_conv3x3_dilated(x, k2, sh2, dtype)
        return jnp.maximum(y, 0.0).astype(dtype)

    def s3(x):
        y = jax.lax.conv_general_dilated(
            x, p["l12"]["kernel"].astype(dtype), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        return jax.nn.sigmoid(y + p["l12"]["bias"]).astype(dtype)

    whole = make_fast_generator_xla(dims, nd, dtype=dtype)

    # warm-up fetch synchronizes pending remote compiles (tunnel rule)
    for fn, a in ((s0, z), (s1, x1), (s2, x2), (s3, x3)):
        jax.device_get(jax.jit(fn)(a)[0, 0])
    jax.device_get(whole(gv, z)[0, 0, 0])

    total = 0.0
    for name, fn, a, note in (
            ("s0 dense+bn+relu", s0, z, f"nd={nd} -> {sh}x{sw}x512"),
            ("s1 up+conv 512->256", s1, x1, f"@{sh}x{sw} in"),
            ("s2 up+conv 256->128", s2, x2, f"@{2*sh}x{2*sw} in"),
            ("s3 conv->C+sigmoid", s3, x3, f"Co={c} @{h}x{w}"),
    ):
        t = time_amortized(jax.jit(fn), a) * 1e3
        total += t
        print(json.dumps({"metric": f"G {name} b{batch} {h}x{w} bf16",
                          "ms": round(t, 3), "note": note}))
    tw = time_amortized(whole, gv, z) * 1e3
    print(json.dumps({"metric": f"G whole (fastpath_xla) b{batch} {h}x{w}",
                      "ms": round(tw, 3),
                      "note": "stage sum vs whole gap = inter-stage fusion"}))
    print(json.dumps({"metric": "G stage sum / whole",
                      "value": round(total / tw, 3),
                      "img_per_s_whole": round(batch / (tw / 1e3))}))


if __name__ == "__main__":
    main()
