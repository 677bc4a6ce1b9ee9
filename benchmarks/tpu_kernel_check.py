"""Compiled (interpret=False) kernel parity + timing on real TPU.

The CI suite runs every Pallas kernel in interpret mode on CPU
(tests/conftest.py pins the CPU backend); this script is the TPU-side
complement: it compiles each kernel with Mosaic at production shapes,
asserts parity against the lax/module composition, and times both sides.

Run (one process at a time on this 1-core host!):
    python benchmarks/tpu_kernel_check.py            # all kernels
    python benchmarks/tpu_kernel_check.py upsample   # one kernel

Prints one JSON line per (kernel, shape): pallas_ms, xla_ms, max_err.
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


from ganreverser_tpu.utils.timing import force as _force  # noqa: E402
from ganreverser_tpu.utils.timing import time_amortized as _time_best  # noqa: E402



def _max_err_device(fa, fb, x):
    """max |fa(x)-fb(x)| computed ON DEVICE — only a scalar crosses the
    tunnel (CLAUDE.md: never device_get big arrays)."""
    @jax.jit
    def err(x):
        a = fa(x).astype(jnp.float32)
        b = fb(x).astype(jnp.float32)
        return jnp.max(jnp.abs(a - b))
    return float(jax.device_get(err(x)))


def _emit(kernel, shape, pallas_s, xla_s, max_err, tol=None, **extra):
    rec = {"kernel": kernel, "shape": shape,
           "pallas_ms": round(pallas_s * 1e3, 3),
           "xla_ms": round(xla_s * 1e3, 3),
           "speedup": round(xla_s / pallas_s, 3),
           "max_err": float(max_err)}
    if tol is not None:
        rec["ok"] = bool(max_err <= tol)
    rec.update(extra)
    print(json.dumps(rec), flush=True)
    # the docstring's promise: this script ASSERTS parity, so a compiled
    # kernel that computes garbage can't be adopted on its timing alone
    if tol is not None:
        assert max_err <= tol, (kernel, shape, float(max_err), tol)


def check_upsample_stages(n=256):
    """Both G stages at the 64x64 flagship geometry, a tile_n sweep each:
    stage 1 is 512->256 @16->32, stage 2 is 256->128 @32->64."""
    for (h, ci, co) in ((16, 512, 256), (32, 256, 128)):
        for tile_n in (2, 4, 8):
            try:
                check_upsample(tile_n=tile_n, n=n, h=h, w=h, ci=ci, co=co)
            except Exception as e:  # noqa: BLE001 — record, keep sweeping
                print(json.dumps(
                    {"kernel": "upsample2_conv3x3_bn_relu",
                     "shape": f"{n}x{h}x{h}x{ci}->{co}", "tile_n": tile_n,
                     "error": f"{type(e).__name__}: {str(e)[:200]}"}),
                    flush=True)


def check_upsample(tile_n=2, n=256, h=16, w=16, ci=512, co=256):
    """Defaults to G's REAL stage 1 at the 64x64 flagship: 512->256
    @16->32 (stage 2 is 256->128 @32->64 — see check_upsample_stages)."""
    from ganreverser_tpu.ops.upsample_conv_kernel import (
        upsample2_conv3x3_bn_act)
    from ganreverser_tpu.ops.upsample_conv import upsample2_conv3x3_reference
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 4)
    x = jax.random.normal(ks[0], (n, h, w, ci), jnp.bfloat16)
    kern = (jax.random.normal(ks[1], (3, 3, ci, co), jnp.float32) * 0.05)
    scale = jax.random.uniform(ks[2], (co,), minval=0.5, maxval=1.5)
    shift = jax.random.normal(ks[3], (co,)) * 0.1

    pallas = jax.jit(lambda x: upsample2_conv3x3_bn_act(
        x, kern.astype(jnp.bfloat16), scale, shift, act="relu",
        tile_n=tile_n, interpret=False))

    @jax.jit
    def ref(x):
        y = upsample2_conv3x3_reference(x, kern.astype(jnp.bfloat16),
                                        jnp.zeros((co,)), jnp.bfloat16)
        return jnp.maximum(y.astype(jnp.float32) * scale + shift,
                           0.0).astype(jnp.bfloat16)

    err = _max_err_device(pallas, ref, x)
    tp = _time_best(pallas, x)
    tx = _time_best(ref, x)
    _emit("upsample2_conv3x3_bn_relu", f"{n}x{h}x{w}x{ci}->{co}", tp, tx,
          err, tol=0.5, tile_n=tile_n)  # bf16, |acts| up to ~30


def check_conv_block(tile_n=2, n=128, h=64, w=64, chans=(3, 64, 64, 64),
                     pool=True):
    """R's stage-1 backbone block by default."""
    from ganreverser_tpu.models import modules as M
    from ganreverser_tpu.ops.conv_block_kernel import conv_block
    key = jax.random.PRNGKey(1)
    x = jax.random.uniform(jax.random.fold_in(key, 0),
                           (n, h, w, chans[0]), jnp.bfloat16)
    kernels, scales, shifts = [], [], []
    for li in range(len(chans) - 1):
        ci, co = chans[li], chans[li + 1]
        kernels.append(jax.random.normal(
            jax.random.fold_in(key, 10 + li), (3, 3, ci, co),
            jnp.float32) * (0.5 / np.sqrt(9 * ci)))
        scales.append(jax.random.uniform(jax.random.fold_in(key, 20 + li),
                                         (co,), minval=0.8, maxval=1.2))
        shifts.append(jax.random.normal(jax.random.fold_in(key, 30 + li),
                                        (co,)) * 0.05)

    pallas = jax.jit(lambda x: conv_block(
        x, tuple(k.astype(jnp.bfloat16) for k in kernels), tuple(scales),
        tuple(shifts), act="elu", pool=pool, tile_n=tile_n,
        interpret=False))

    @jax.jit
    def ref(x):
        y = x
        for k, sc, sh in zip(kernels, scales, shifts):
            import jax.lax as lax
            y = lax.conv_general_dilated(
                y, k.astype(jnp.bfloat16), (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32)
            y = jax.nn.elu(y * sc + sh).astype(jnp.bfloat16)
        if pool:
            import jax.lax as lax
            y = lax.reduce_window(y, -jnp.inf, lax.max, (1, 2, 2, 1),
                                  (1, 2, 2, 1), "VALID")
        return y

    err = _max_err_device(pallas, ref, x)
    tp = _time_best(pallas, x)
    tx = _time_best(ref, x)
    _emit("conv_block_bn_elu" + ("_pool" if pool else ""),
          f"{n}x{h}x{w} chans={list(chans)}", tp, tx, err, tol=0.02,
          tile_n=tile_n)


def check_conv3x3(tile_n=2, n=128, h=64, w=64, ci=64, co=64):
    from ganreverser_tpu.ops.conv_kernel import conv3x3_bn_act
    import jax.lax as lax
    key = jax.random.PRNGKey(2)
    x = jax.random.uniform(jax.random.fold_in(key, 0), (n, h, w, ci),
                           jnp.bfloat16)
    kern = jax.random.normal(jax.random.fold_in(key, 1), (3, 3, ci, co),
                             jnp.float32) * 0.04
    scale = jnp.ones((co,))
    shift = jnp.zeros((co,))

    pallas = jax.jit(lambda x: conv3x3_bn_act(
        x, kern.astype(jnp.bfloat16), scale, shift, act="relu",
        tile_n=tile_n, interpret=False))

    @jax.jit
    def ref(x):
        y = lax.conv_general_dilated(
            x, kern.astype(jnp.bfloat16), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        return jnp.maximum(y, 0.0).astype(jnp.bfloat16)

    err = _max_err_device(pallas, ref, x)
    tp = _time_best(pallas, x)
    tx = _time_best(ref, x)
    _emit("conv3x3_bn_relu", f"{n}x{h}x{w}x{ci}->{co}", tp, tx, err,
          tol=0.05, tile_n=tile_n)


def check_upsample_xla(n=256, h=16, w=16, ci=512, co=256):
    """Pure-XLA upsample+conv formulations (no Mosaic — runs even when the
    tunnel's remote compile helper rejects Pallas payloads), at G's real
    stage-1 shape by default: naive repeat+conv, explicit phase shuffle,
    and the lhs-dilated single conv."""
    from ganreverser_tpu.ops.upsample_conv import (
        upsample2_conv3x3, upsample2_conv3x3_dilated,
        upsample2_conv3x3_reference)
    key = jax.random.PRNGKey(3)
    x = jax.random.normal(jax.random.fold_in(key, 0), (n, h, w, ci),
                          jnp.bfloat16)
    kern = jax.random.normal(jax.random.fold_in(key, 1), (3, 3, ci, co),
                             jnp.float32) * 0.02
    bias = jnp.zeros((co,))

    naive = jax.jit(lambda x: upsample2_conv3x3_reference(
        x, kern, bias, jnp.bfloat16))
    shuffle = jax.jit(lambda x: upsample2_conv3x3(x, kern, bias,
                                                  jnp.bfloat16))
    dilated = jax.jit(lambda x: upsample2_conv3x3_dilated(
        x, kern, bias, jnp.bfloat16))

    tn = _time_best(naive, x)
    for name, fn in (("phase_shuffle", shuffle), ("lhs_dilated", dilated)):
        err = _max_err_device(fn, naive, x)
        tv = _time_best(fn, x)
        _emit(f"upsample_xla_{name}", f"{n}x{h}x{w}x{ci}->{co}", tv, tn,
              err, tol=0.25)


def check_conv_block_stages(n=256):
    """R's two backbone blocks at 64x64 with a tile_n sweep (the inversion
    hot path: 3->64->64->64 @64x64 pool, then 64->128->128->128 @32x32
    pool)."""
    for (h, chans) in ((64, (3, 64, 64, 64)), (32, (64, 128, 128, 128))):
        for tile_n in (2, 4, 8):
            try:
                check_conv_block(tile_n=tile_n, n=n, h=h, w=h, chans=chans)
            except Exception as e:  # noqa: BLE001
                print(json.dumps(
                    {"kernel": "conv_block_bn_elu_pool",
                     "shape": f"{n}x{h}x{h} chans={list(chans)}",
                     "tile_n": tile_n,
                     "error": f"{type(e).__name__}: {str(e)[:200]}"}),
                    flush=True)


def check_upsample_xla_stages(n=256):
    """The XLA formulations at the REAL 64x64-flagship G stage shapes."""
    for (h, ci, co) in ((16, 512, 256), (32, 256, 128)):
        try:
            check_upsample_xla(n=n, h=h, w=h, ci=ci, co=co)
        except Exception as e:  # noqa: BLE001 — record, keep sweeping
            print(json.dumps(
                {"kernel": "upsample_xla", "shape": f"{n}x{h}x{h}x{ci}->{co}",
                 "error": f"{type(e).__name__}: {str(e)[:200]}"}),
                flush=True)


def check_pixel_topk(n=10240, hwc=(64, 64, 3), q=256, k=100):
    """The wide-D pixel-similarity search (apply_r.lua:307-314; D=12288 at
    the flagship geometry) — the one shape where lax.top_k's full per-row
    sort plausibly dominates (VERDICT r2 item 8). Compares the production
    lax path against the exact two-pass tiled selection at several tile
    sizes, plus scoring alone so the selection share is visible."""
    from ganreverser_tpu.analysis.similarity import (cosine_scores,
                                                     pixel_cosine_topk)
    from ganreverser_tpu.ops.tiled_topk import pixel_cosine_topk_tiled
    key = jax.random.PRNGKey(7)
    images = jax.random.uniform(key, (n,) + hwc, jnp.bfloat16)
    needles = jnp.arange(q)
    d = int(np.prod(hwc))

    score_only = jax.jit(
        lambda x: cosine_scores(x.reshape(n, -1), needles))
    t_score = _time_best(score_only, images)

    full = jax.jit(lambda x: pixel_cosine_topk(x, needles, k))
    t_full = _time_best(full, images)
    _emit("pixel_topk_scores_only", f"{n}xD{d} q{q}", t_score, t_full, 0.0,
          note="xla_ms here = full lax path (score+full-sort top_k)")

    for tile in (512, 1024, 2048):
        tiled = jax.jit(lambda x, t=tile: pixel_cosine_topk_tiled(
            x, needles, k, tile=t))
        # parity on the VALUES (ties may legally reorder indices)
        err = _max_err_device(lambda x, t=tile: pixel_cosine_topk_tiled(
            x, needles, k, tile=t)[0],
            lambda x: pixel_cosine_topk(x, needles, k)[0], images)
        t_tiled = _time_best(tiled, images)
        _emit(f"pixel_topk_tiled_{tile}", f"{n}xD{d} q{q} k{k}", t_tiled,
              t_full, err, tol=1e-5)


def check_approx_topk(n=10240, d=100, k=100):
    """TPU's native approximate k-selection (jax.lax.approx_max_k) vs the
    exact lax.top_k on the retrieval shapes that dominate the pipelines:
    the all-N e2e search (q=N needles — 105.8 ms measured leg, 28% of the
    fused e2e program) and the q=256 serving query. Emits time AND the
    measured recall vs the exact top-k (computed on device)."""
    from ganreverser_tpu.analysis.e2e import topk_all

    key = jax.random.PRNGKey(11)
    emb = jax.random.normal(key, (n, d), jnp.float32)

    def recall_device(fa, fb, x):
        """mean fraction of exact indices recovered, on device."""
        @jax.jit
        def rec(x):
            ia = fa(x)[1]  # (q, k) approx indices
            ib = fb(x)[1]  # (q, k) exact indices
            hit = (ia[:, :, None] == ib[:, None, :]).any(1)
            return jnp.mean(hit.astype(jnp.float32))
        return float(jax.device_get(rec(x)))

    # --- all-N needle-scan (the e2e leg) --------------------------------
    exact = jax.jit(lambda x: topk_all(x, k, 256))
    t_exact = _time_best(exact, emb)
    for rt in (0.85, 0.95):
        apx = jax.jit(lambda x, r=rt: topk_all(x, k, 256, True, r))
        t_apx = _time_best(apx, emb)
        rec = recall_device(lambda x, r=rt: topk_all(x, k, 256, True, r),
                            lambda x: topk_all(x, k, 256), emb)
        _emit(f"approx_topk_allN_rt{rt}", f"{n}x{n} D{d} k{k}", t_apx,
              t_exact, 0.0, note=f"measured recall={rec:.4f} "
              "(pallas_ms column = approx path)")

    # --- q=256 serving query (SimilarityIndex.topk shape) ---------------
    from ganreverser_tpu.analysis.similarity import cosine_topk
    needles = jnp.arange(256)
    exact_q = jax.jit(lambda x: cosine_topk(x, needles, k))
    t_eq = _time_best(exact_q, emb)
    for rt in (0.85, 0.95):
        apx_q = jax.jit(lambda x, r=rt: cosine_topk(x, needles, k, True, r))
        t_aq = _time_best(apx_q, emb)
        rec = recall_device(
            lambda x, r=rt: cosine_topk(x, needles, k, True, r),
            lambda x: cosine_topk(x, needles, k), emb)
        _emit(f"approx_topk_q256_rt{rt}", f"256x{n} D{d} k{k}", t_aq,
              t_eq, 0.0, note=f"measured recall={rec:.4f}")

    # --- wide-D pixel shape (where selection was 20% of 9.8 ms) ---------
    from ganreverser_tpu.analysis.similarity import pixel_cosine_topk
    imgs = jax.random.uniform(jax.random.PRNGKey(12), (n, 64, 64, 3),
                              jnp.bfloat16)
    px_needles = jnp.arange(256)

    @jax.jit
    def px_apx(x):
        from ganreverser_tpu.analysis.similarity import (cosine_scores,
                                                         _select_topk)
        s = cosine_scores(x.reshape(n, -1), px_needles)
        return _select_topk(s, k, True, 0.95)

    px_exact = jax.jit(lambda x: pixel_cosine_topk(x, px_needles, k))
    t_pe = _time_best(px_exact, imgs)
    t_pa = _time_best(px_apx, imgs)
    rec = recall_device(px_apx, lambda x: pixel_cosine_topk(
        x, px_needles, k), imgs)
    _emit("approx_topk_pixel_rt0.95", f"256xD12288 k{k}", t_pa, t_pe, 0.0,
          note=f"measured recall={rec:.4f}")


def check_s3_packed(n=256, h=64, w=64, ci=128, co=3):
    """G's s3 stage (conv3x3 128->3 + sigmoid, models.lua:132-133): the
    lane-packed strided reformulation (ops/pack_conv.py) vs the plain XLA
    conv, at the flagship shape, plus the WHOLE fast G with/without
    pack_out — only the end-to-end number decides adoption (CLAUDE.md:
    production defaults follow measured e2e, not per-op wins)."""
    from ganreverser_tpu.models.fastpath import make_fast_generator_xla
    from ganreverser_tpu.ops.pack_conv import conv3x3_packed

    dt = jnp.bfloat16
    key = jax.random.PRNGKey(5)
    x = jax.random.normal(key, (n, h, w, ci)).astype(dt)
    kern = (jax.random.normal(jax.random.fold_in(key, 1),
                              (3, 3, ci, co)) * 0.1).astype(jnp.float32)
    bias = jnp.zeros((co,), jnp.float32)

    def naive(xx):
        y = jax.lax.conv_general_dilated(
            xx, kern.astype(dt), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        return jax.nn.sigmoid(y + bias).astype(dt)

    f_naive = jax.jit(naive)
    _force(f_naive(x))
    t_naive = _time_best(f_naive, x)
    for pack in ((1, 8), (2, 8), (4, 8), (8, 8)):
        f_pack = jax.jit(lambda xx, p=pack: conv3x3_packed(
            xx, kern, bias, p, "sigmoid", dt))
        err = _max_err_device(f_pack, f_naive, x)
        t_pack = _time_best(f_pack, x)
        _emit(f"s3_packed_{pack[0]}x{pack[1]}", f"b{n} {h}x{w} {ci}->{co}",
              t_pack, t_naive, err, tol=2e-2)

    # whole-G A/B (the adoption criterion)
    from ganreverser_tpu import models as M
    dims = (co, h, w)
    nd = 100
    G = M.create_G(dims, nd, dtype=dt)
    gv, _ = G.init(jax.random.fold_in(key, 2), (nd,))
    z = jax.random.normal(jax.random.fold_in(key, 3), (n, nd), jnp.float32)
    base = make_fast_generator_xla(dims, nd, dtype=dt)
    _force(base(gv, z))
    t_base = _time_best(base, gv, z)
    for pack in ((2, 8), (4, 8), (8, 8)):
        gen = make_fast_generator_xla(dims, nd, dtype=dt, pack_out=pack)
        err = _max_err_device(lambda v: gen(v, z), lambda v: base(v, z), gv)
        t = _time_best(gen, gv, z)
        _emit(f"fastG_pack{pack[0]}x{pack[1]}", f"b{n} {h}x{w} nd{nd}",
              t, t_base, err, tol=2e-2,
              note=f"img/s packed={round(n / t)} base={round(n / t_base)}")


def check_co64_packed(n=256, h=64, w=64, ci=64, co=64):
    """R's Co=64 backbone convs (models.lua:409-423; 378 of ~703 MMAC/img
    at 64x64) fill only half the MXU lanes. A/B the (1,2)/(2,2) lane-packed
    reformulation (ops/pack_conv.py — Co'=128 at a 12/9 tap overhead; 75%
    slot utilization vs 50%) against the plain XLA conv at the flagship
    shape, eval epilogue (folded BN -> bias + ELU). Per-op signal only: a
    win here motivates building the packed-layout CHAIN (pack once,
    convolve the 64-channel stack packed, unpack once) — the per-conv
    unpack transpose in this sweep is the pessimistic bound."""
    from ganreverser_tpu.ops.pack_conv import conv3x3_packed

    dt = jnp.bfloat16
    key = jax.random.PRNGKey(6)
    x = jax.random.normal(key, (n, h, w, ci)).astype(dt)
    kern = (jax.random.normal(jax.random.fold_in(key, 1),
                              (3, 3, ci, co)) * 0.1).astype(jnp.float32)
    bias = jnp.zeros((co,), jnp.float32)

    def naive(xx):
        y = jax.lax.conv_general_dilated(
            xx, kern.astype(dt), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        return jax.nn.elu(y + bias).astype(dt)

    f_naive = jax.jit(naive)
    _force(f_naive(x))
    t_naive = _time_best(f_naive, x)
    for pack in ((1, 2), (2, 2), (1, 4)):
        f_pack = jax.jit(lambda xx, p=pack: conv3x3_packed(
            xx, kern, bias, p, "elu", dt))
        err = _max_err_device(f_pack, f_naive, x)
        t_pack = _time_best(f_pack, x)
        _emit(f"co64_packed_{pack[0]}x{pack[1]}",
              f"b{n} {h}x{w} {ci}->{co}", t_pack, t_naive, err, tol=2e-2)


def check_int8_r(n=1024, h=64, w=64, c=3, nd=100, k=64, needles=16):
    """int8 weight+activation R eval (models/fastpath.make_fast_inverter_int8,
    ops/quant.py) vs the measured-winner bf16 module path, at the headline
    shape (apply_r.lua:143-153). v5e's MXU does int8 at 2x the bf16 MAC
    rate — whether XLA routes int8 convs onto it is exactly what this leg
    answers. Emits throughput A/B plus the reference-visible quality
    metric: top-k cosine-ranking recall of the int8 latents against the
    bf16 latents (apply_r.lua:275 — rankings are the contract). Adoption
    rule: opt-in flag only, and only on BOTH a >=1.3x throughput win AND
    recall >= 0.95 here."""
    from ganreverser_tpu import models as M
    from ganreverser_tpu.models.fastpath import make_fast_inverter_int8

    dt = jnp.bfloat16
    key = jax.random.PRNGKey(7)
    dims = (c, h, w)
    R = M.create_R(dims, nd, "normal", dtype=dt)
    rv, _ = R.init(key, (h, w, c))
    x = jax.random.uniform(jax.random.fold_in(key, 1), (n, h, w, c),
                           jnp.float32).astype(dt)

    mod = jax.jit(lambda v, xx: R.apply(v, xx, train=False)[0])
    f8 = make_fast_inverter_int8(dims, nd, "normal", dtype=dt)
    _force(mod(rv, x))
    _force(f8(rv, x))
    t_mod = _time_best(mod, rv, x)
    t_int8 = _time_best(f8, rv, x)

    @jax.jit
    def recall(v, xx):
        def ranks(z):
            z = z.astype(jnp.float32)
            zn = z / jnp.linalg.norm(z, axis=1, keepdims=True)
            return jax.lax.top_k(zn[:needles] @ zn.T, k)[1]
        ia, ib = ranks(f8(v, xx)), ranks(mod(v, xx))
        hit = (ia[:, :, None] == ib[:, None, :]).any(-1)
        return jnp.mean(hit.astype(jnp.float32))

    rec = float(jax.device_get(recall(rv, x)))
    _emit("int8_r", f"b{n} {h}x{w} nd{nd}", t_int8, t_mod, 0.0,
          note=(f"img/s int8={round(n / t_int8)} bf16={round(n / t_mod)} "
                f"topk_recall@{k}={rec:.4f}"))


def check_int8_g(n=256, h=64, w=64, c=3, nd=100):
    """int8 G (make_fast_generator_xla_int8 — the lhs-dilated winner
    formulation with int8 operands) vs the bf16 fastpath at the flagship
    shape. e2e is G-bound (G 53-54k vs R 72-74k img/s), so an int8 G win
    moves the fused-e2e headline directly. Quality metric: mean/max abs
    pixel error of the sigmoid outputs (reported, not asserted — this is
    an approximation whose adoption is opt-in on a measured win)."""
    from ganreverser_tpu import models as M
    from ganreverser_tpu.models.fastpath import (make_fast_generator_xla,
                                                 make_fast_generator_xla_int8)

    dt = jnp.bfloat16
    key = jax.random.PRNGKey(8)
    dims = (c, h, w)
    G = M.create_G(dims, nd, dtype=dt)
    gv, _ = G.init(key, (nd,))
    z = jax.random.normal(jax.random.fold_in(key, 1), (n, nd), jnp.float32)

    base = make_fast_generator_xla(dims, nd, dtype=dt)
    g8 = make_fast_generator_xla_int8(dims, nd, dtype=dt)
    _force(base(gv, z))
    _force(g8(gv, z))
    t_base = _time_best(base, gv, z)
    t_int8 = _time_best(g8, gv, z)

    @jax.jit
    def errs(v, zz):
        d = jnp.abs(g8(v, zz).astype(jnp.float32)
                    - base(v, zz).astype(jnp.float32))
        return jnp.mean(d), jnp.max(d)

    me, mx = (float(v) for v in jax.device_get(errs(gv, z)))
    _emit("int8_g", f"b{n} {h}x{w} nd{nd}", t_int8, t_base, mx,
          note=(f"img/s int8={round(n / t_int8)} bf16={round(n / t_base)} "
                f"mean_abs_err={me:.4f}"))


def check_e2e_int8(n=4096, h=64, w=64, c=3, nd=100, k=64, batch=128):
    """The ADOPTION criterion for int8 (CLAUDE.md: production defaults
    follow measured e2e): the whole fused generate->invert->top-k program
    (analysis/e2e.py, the 26.7k img/s headline) with int8 G + int8 R legs
    vs the current best (fast-XLA bf16 G + module bf16 R). Also measures
    the END-TO-END ranking recall of the int8 program's top-k indices
    against the bf16 program's — the reference-visible contract
    (apply_r.lua:265-318) on the composed pipeline, where G and R quant
    errors interact."""
    from ganreverser_tpu import models as M
    from ganreverser_tpu.analysis.e2e import make_e2e_program
    from ganreverser_tpu.models.fastpath import (make_fast_generator_xla,
                                                 make_fast_generator_xla_int8,
                                                 make_fast_inverter_int8)

    dt = jnp.bfloat16
    key = jax.random.PRNGKey(9)
    dims = (c, h, w)
    G = M.create_G(dims, nd, dtype=dt)
    R = M.create_R(dims, nd, "normal", dtype=dt)
    gv, _ = G.init(key, (nd,))
    rv, _ = R.init(jax.random.fold_in(key, 1), (h, w, c))
    # Amplify G: at random init the sigmoid outputs are near-constant
    # across z, so ALL pairwise cosine scores tie (measured top-k spread
    # 6e-8 on CPU) and the recall metric degenerates to noise — which
    # would wrongly veto adoption. 4x weights give trained-like image
    # diversity; the emitted topk_spread makes degeneracy self-diagnosing.
    gv = jax.tree.map(lambda a: a * 4.0, gv)
    z = jax.random.normal(jax.random.fold_in(key, 2), (n, nd), jnp.float32)

    fg = make_fast_generator_xla(dims, nd, dtype=dt)
    base = make_e2e_program(G, R, batch_size=batch, k=k,
                            g_apply=lambda g, zc: fg(g, zc))
    g8 = make_fast_generator_xla_int8(dims, nd, dtype=dt)
    r8 = make_fast_inverter_int8(dims, nd, "normal", dtype=dt)
    prog8 = make_e2e_program(G, R, batch_size=batch, k=k,
                             g_apply=lambda g, zc: g8(g, zc),
                             r_apply=lambda r, im: r8(r, im))
    _force(base(gv, rv, z))
    _force(prog8(gv, rv, z))
    t_base = _time_best(base, gv, rv, z)
    t_int8 = _time_best(prog8, gv, rv, z)

    @jax.jit
    def recall(g, r, zz):
        ia = prog8(g, r, zz)[2]
        vb, ib = base(g, r, zz)[1:3]
        hit = (ia[:, :, None] == ib[:, None, :]).any(-1)
        # mean top-1..top-k score spread of the EXACT program: if this is
        # ~float-eps the rankings are ties and recall is meaningless
        spread = jnp.mean(vb[:, 0] - vb[:, -1])
        return jnp.mean(hit.astype(jnp.float32)), spread

    rec, spread = (float(v) for v in jax.device_get(recall(gv, rv, z)))
    _emit("e2e_int8", f"N{n} b{batch} {h}x{w} nd{nd}", t_int8, t_base, 0.0,
          note=(f"img/s int8={round(n / t_int8)} bf16={round(n / t_base)} "
                f"e2e_topk_recall@{k}={rec:.4f} topk_spread={spread:.2e}"))


def check_recall_guard(n=10240, d=100, k=100, floor=0.95, margin=0.02):
    """REGRESSION GATE (VERDICT r4 item 5): measure approx_max_k recall
    against the exact top-k on the flagship all-N shape and FAIL (raise ->
    rc!=0 in tpu_session.sh) below ``floor - margin``. On CPU approx_max_k
    falls back to an exact sort (recall 1.0 by construction — the CPU test
    in test_analysis.py pins only the plumbing); run on the real chip this
    re-pins the hardware recall figure every session instead of leaving it
    in one round-3 log. Reference contract: apply_r.lua:275 rankings are
    exact, so the opt-in --approx mode ships with a measured floor."""
    from ganreverser_tpu.analysis.e2e import topk_all

    emb = jax.random.normal(jax.random.PRNGKey(11), (n, d), jnp.float32)

    @jax.jit
    def rec(x):
        ia = topk_all(x, k, 256, True, floor)[1]
        ib = topk_all(x, k, 256)[1]
        hit = (ia[:, :, None] == ib[:, None, :]).any(1)
        return jnp.mean(hit.astype(jnp.float32))

    r = float(jax.device_get(rec(emb)))
    backend = jax.default_backend()
    print(f"[recall_guard] backend={backend} shape={n}x{n} D{d} k{k} "
          f"recall_target={floor} measured_recall={r:.4f} "
          f"floor={floor - margin}")
    assert r >= floor - margin, (
        f"approx_max_k recall {r:.4f} < {floor - margin} on {backend} — "
        "the --approx mode no longer meets its documented floor")
    print("[recall_guard] PASS")


CHECKS = {"upsample": check_upsample, "conv_block": check_conv_block,
          "pixel_topk": check_pixel_topk,
          "approx_topk": check_approx_topk,
          "recall_guard": check_recall_guard,
          "s3_packed": check_s3_packed,
          "co64_packed": check_co64_packed,
          "int8_r": check_int8_r, "int8_g": check_int8_g,
          "e2e_int8": check_e2e_int8,
          "conv3x3": check_conv3x3, "upsample_xla": check_upsample_xla,
          "upsample_stages": check_upsample_stages,
          "conv_block_stages": check_conv_block_stages,
          "upsample_xla_stages": check_upsample_xla_stages}


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    picks = argv or list(CHECKS)
    print(f"[kernel_check] backend={jax.default_backend()}",
          file=sys.stderr)
    for name in picks:
        try:
            CHECKS[name]()
        except Exception as e:  # noqa: BLE001 — record, keep going
            import traceback
            traceback.print_exc()  # full error to stderr (vmem numbers etc.)
            print(json.dumps({"kernel": name, "error":
                              f"{type(e).__name__}: {str(e)[:300]}"}),
                  flush=True)


if __name__ == "__main__":
    main()
