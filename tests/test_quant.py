"""int8 quantization tests (ops/quant.py + the int8 fast paths).

Implementation exactness is pinned BIT-EXACT against numpy int32
references — int8 x int8 -> int32 accumulation has no rounding, so any
mismatch is a real bug, not tolerance noise. The approximation quality
(does int8 preserve the reference-visible top-k rankings,
apply_r.lua:275, and at what throughput) is a hardware measurement
(benchmarks/tpu_kernel_check.py int8_r / int8_g); here we only
sanity-bound it on tiny random models.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ganreverser_tpu import models as M
from ganreverser_tpu.ops.quant import (fold_quantize_conv,
                                       fold_quantize_dense, quant_act,
                                       quant_conv3x3_same, quant_dense,
                                       quantize_symmetric)


def _np_conv3x3_same_int32(x, w):
    """Exact integer 3x3 SAME conv: (N,H,W,Ci) int8 x (3,3,Ci,Co) int8."""
    n, h, wd, ci = x.shape
    co = w.shape[-1]
    xp = np.pad(x.astype(np.int32), ((0, 0), (1, 1), (1, 1), (0, 0)))
    out = np.zeros((n, h, wd, co), np.int32)
    for ky in range(3):
        for kx in range(3):
            patch = xp[:, ky:ky + h, kx:kx + wd, :]
            out += np.einsum("nhwc,co->nhwo", patch,
                             w[ky, kx].astype(np.int32))
    return out


def test_quantize_symmetric_properties(key):
    x = jax.random.normal(key, (5, 7)) * 3.0
    q, s = quantize_symmetric(x)
    assert q.dtype == jnp.int8 and s.shape == ()
    assert int(jnp.max(jnp.abs(q.astype(jnp.int32)))) <= 127
    # reconstruction error bounded by half a grid step
    np.testing.assert_array_less(
        np.abs(np.asarray(q, np.float32) * float(s) - np.asarray(x)),
        float(s) / 2 + 1e-7)
    # exact zero stays exact (SAME padding correctness relies on this)
    q0, _ = quantize_symmetric(jnp.zeros((3,)).at[1].set(2.0))
    assert int(q0[0]) == 0
    # per-channel axes leave per-slice scales
    k = jax.random.normal(jax.random.fold_in(key, 1), (3, 3, 4, 6))
    qk, sk = quantize_symmetric(k, axis=(0, 1, 2))
    assert sk.shape == (1, 1, 1, 6)


def test_quant_conv3x3_bitexact_vs_numpy(key):
    """The int32 accumulation path of quant_conv3x3_same is exact: its
    pre-dequant integer result must equal the numpy reference bit for bit
    (dequant then divides the scales back out)."""
    k1, k2 = jax.random.split(key)
    x = jax.random.normal(k1, (2, 6, 5, 7))
    w = jax.random.normal(k2, (3, 3, 7, 4)) * 0.3
    xq, xs = quant_act(x)
    wq, ws = quantize_symmetric(w, axis=(0, 1, 2))
    bias = jnp.zeros((4,))
    out = quant_conv3x3_same(xq, xs, wq, ws, bias)
    ints = np.asarray(out) / np.asarray((xs * ws).reshape(1, 1, 1, -1))
    ref = _np_conv3x3_same_int32(np.asarray(xq), np.asarray(wq))
    np.testing.assert_allclose(ints, ref.astype(np.float64), rtol=1e-6)


def test_quant_dense_bitexact_vs_numpy(key):
    k1, k2 = jax.random.split(key)
    x = jax.random.normal(k1, (3, 9))
    w = jax.random.normal(k2, (9, 5))
    xq, xs = quant_act(x)
    wq, ws, b = fold_quantize_dense(w, jnp.ones((), jnp.float32),
                                    jnp.zeros((5,)))
    out = quant_dense(xq, xs, wq, ws, b)
    ref = np.asarray(xq, np.int32) @ np.asarray(wq, np.int32)
    np.testing.assert_allclose(np.asarray(out) / np.asarray(xs * ws),
                               ref.astype(np.float64), rtol=1e-6)


def test_fold_quantize_conv_folds_bn(key):
    """fold_quantize_conv quantizes the BN-FOLDED kernel so the int8 grid
    adapts to the folded magnitudes (a per-channel 10x BN scale must not
    cost 10x quantization error on the other channels)."""
    k = jax.random.normal(key, (3, 3, 4, 6)) * 0.1
    scale = jnp.ones((6,)).at[0].set(10.0)
    shift = jnp.zeros((6,))
    wq, ws, _ = fold_quantize_conv(k, scale, shift)
    recon = np.asarray(wq, np.float32) * np.asarray(ws)
    folded = np.asarray(k) * np.asarray(scale).reshape(1, 1, 1, -1)
    err = np.abs(recon - folded)
    # error per channel bounded by that channel's own grid step
    assert (err <= np.asarray(ws)[..., :] / 2 + 1e-7).all()


def test_fast_inverter_int8_tracks_f32(key):
    """Whole-R int8 path vs create_R.apply(train=False) f32: per-row cosine
    of the recovered latents stays high on a tiny random R. (The real
    acceptance metric — top-k ranking recall at the flagship geometry —
    is measured on device: tpu_kernel_check int8_r.)"""
    from ganreverser_tpu.models.fastpath import make_fast_inverter_int8
    dims, nd = (3, 8, 8), 6
    R = M.create_R(dims, nd, "normal")
    variables, _ = R.init(key, (8, 8, 3))
    for l in ("l1", "l5", "l9", "l14", "l18", "l22", "l28"):
        variables["state"][l]["mean"] = 0.05 * jnp.ones_like(
            variables["state"][l]["mean"])
        variables["state"][l]["var"] = 0.8 * jnp.ones_like(
            variables["state"][l]["var"])
    x = jax.random.uniform(jax.random.fold_in(key, 1), (4, 8, 8, 3))
    ref, _ = R.apply(variables, x, train=False)
    out = make_fast_inverter_int8(dims, nd, "normal",
                                  dtype=jnp.float32)(variables, x)
    ref_n = np.asarray(ref) / np.linalg.norm(np.asarray(ref), axis=1,
                                             keepdims=True)
    out_n = np.asarray(out) / np.linalg.norm(np.asarray(out), axis=1,
                                             keepdims=True)
    cos = (ref_n * out_n).sum(axis=1)
    assert cos.min() > 0.99, cos


def test_fast_inverter_int8_uniform_tanh(key):
    from ganreverser_tpu.models.fastpath import make_fast_inverter_int8
    dims, nd = (1, 8, 8), 4
    R = M.create_R(dims, nd, "uniform")
    variables, _ = R.init(key, (8, 8, 1))
    x = jax.random.uniform(jax.random.fold_in(key, 1), (2, 8, 8, 1))
    out = make_fast_inverter_int8(dims, nd, "uniform",
                                  dtype=jnp.float32)(variables, x)
    assert float(jnp.max(jnp.abs(out))) <= 1.0


def test_fast_generator_xla_int8_tracks_f32(key):
    """Whole-G int8 (lhs-dilated formulation with int8 operands) vs the f32
    fastpath: sigmoid outputs stay in [0,1] and close elementwise."""
    from ganreverser_tpu.models.fastpath import (make_fast_generator_xla,
                                                 make_fast_generator_xla_int8)
    dims, nd = (3, 16, 16), 6
    G = M.create_G(dims, nd)
    variables, _ = G.init(key, (nd,))
    z = jax.random.normal(jax.random.fold_in(key, 1), (4, nd))
    ref = make_fast_generator_xla(dims, nd, dtype=jnp.float32)(variables, z)
    out = make_fast_generator_xla_int8(dims, nd,
                                       dtype=jnp.float32)(variables, z)
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0
    diff = np.abs(np.asarray(out) - np.asarray(ref))
    assert diff.mean() < 0.02 and diff.max() < 0.15, (diff.mean(),
                                                      diff.max())


def test_e2e_program_int8_composition(key):
    """The COMPOSED serving candidate (tpu_kernel_check e2e_int8's CPU
    mechanics): make_e2e_program with the int8 G and int8 R legs via the
    g_apply/r_apply overrides.  On a tiny random model the int8 program
    must return the right shapes, finite values, and a top-k index set
    that substantially overlaps the f32 program's — the reference-visible
    ranking contract (apply_r.lua:265-318) on the composed pipeline,
    where G and R quantization errors interact."""
    from ganreverser_tpu.analysis.e2e import make_e2e_program
    from ganreverser_tpu.models.fastpath import (make_fast_generator_xla,
                                                 make_fast_generator_xla_int8,
                                                 make_fast_inverter_int8)
    dims, nd, n, k = (3, 8, 8), 6, 64, 8
    G = M.create_G(dims, nd, dtype=jnp.float32)
    R = M.create_R(dims, nd, "normal", dtype=jnp.float32)
    gv, _ = G.init(key, (nd,))
    rv, _ = R.init(jax.random.fold_in(key, 1), (8, 8, 3))
    # Amplify G: at random init sigmoid outputs are near-constant across z,
    # so ALL pairwise cosine scores tie (measured top-k spread 6e-8) and
    # rankings among ties are float noise — recall would be meaningless.
    # 4x weights give img std ~0.32 across the batch and real score gaps.
    gv = jax.tree.map(lambda a: a * 4.0, gv)
    z = jax.random.normal(jax.random.fold_in(key, 2), (n, nd))

    fg = make_fast_generator_xla(dims, nd, dtype=jnp.float32)
    base = make_e2e_program(G, R, batch_size=16, k=k, needle_chunk=16,
                            g_apply=lambda g, zc: fg(g, zc))
    g8 = make_fast_generator_xla_int8(dims, nd, dtype=jnp.float32)
    r8 = make_fast_inverter_int8(dims, nd, "normal", dtype=jnp.float32)
    prog8 = make_e2e_program(G, R, batch_size=16, k=k, needle_chunk=16,
                             g_apply=lambda g, zc: g8(g, zc),
                             r_apply=lambda r, im: r8(r, im))

    emb8, v8, i8 = prog8(gv, rv, z)
    emb, v, i = base(gv, rv, z)
    assert emb8.shape == (n, nd) and i8.shape == i.shape
    assert np.isfinite(np.asarray(emb8)).all()
    assert np.isfinite(np.asarray(v8)).all()
    # composed-pipeline ranking overlap: on a tiny random model the int8
    # error is largest relative to the score gaps, so this floor is loose;
    # the flagship-shape recall gate lives in tpu_kernel_check e2e_int8.
    hit = (np.asarray(i8)[:, :, None] == np.asarray(i)[:, None, :]).any(-1)
    assert hit.mean() > 0.6, hit.mean()
