"""Counter-hash dropout kernel (ops/dropout_kernel.py): statistical
contract (keep rate, scaling), fwd/bwd mask agreement (the backward
REGENERATES the mask from the seed), gradient correctness, the shape gate,
and the module-level wiring. The counter hash is a pure function of
(seed, element index), so interpret mode on CPU computes the EXACT mask
the TPU kernel computes; the TPU timing run is benchmarks/train_ablate.py's
--dropout kernel leg."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ganreverser_tpu.ops import dropout_kernel as dk


def test_keep_rate_and_scaling(key):
    rate = 0.5
    x = jnp.ones((16, 64, 16), jnp.float32)  # 16384 = 16 * 1024
    seed = jnp.int32(123)
    y = np.asarray(dk.fused_dropout(x, seed, rate))
    kept = y != 0.0
    # survivors are exactly x / keep
    np.testing.assert_allclose(y[kept], 1.0 / (1.0 - rate), rtol=1e-6)
    # keep fraction within 4 sigma of the binomial expectation
    n = y.size
    p = kept.mean()
    sigma = (0.5 * 0.5 / n) ** 0.5
    assert abs(p - 0.5) < 4 * sigma, p


def test_rate_quarter(key):
    x = jnp.ones((8, 1024), jnp.float32)
    y = np.asarray(dk.fused_dropout(x, jnp.int32(17), 0.25))
    kept = (y != 0).mean()
    sigma = (0.75 * 0.25 / y.size) ** 0.5
    assert abs(kept - 0.75) < 4 * sigma, kept


def test_seed_determinism_and_variation():
    x = jnp.ones((8, 1024), jnp.bfloat16)
    a = np.asarray(dk.fused_dropout(x, jnp.int32(7), 0.5).astype(jnp.float32))
    b = np.asarray(dk.fused_dropout(x, jnp.int32(7), 0.5).astype(jnp.float32))
    c = np.asarray(dk.fused_dropout(x, jnp.int32(8), 0.5).astype(jnp.float32))
    assert np.array_equal(a, b)  # same seed -> same mask
    assert not np.array_equal(a, c)  # different seed -> different mask


def test_mask_matches_reference_hash():
    """The kernel's mask equals the murmur3-fmix32 reference computed in
    numpy — the stream is pinned by SOURCE, the determinism contract that
    distinguishes --dropout kernel from --prng rbg."""
    # 24 rows -> tile_r=8, a 3-tile grid: also validates the per-tile
    # global row offset
    rows, cols, seed, rate = 24, 1024, 42, 0.5
    idx = (np.arange(rows, dtype=np.uint32)[:, None] * np.uint32(cols)
           + np.arange(cols, dtype=np.uint32)[None, :])
    with np.errstate(over="ignore"):
        h = idx ^ (np.uint32(seed) * np.uint32(0x9E3779B9))
        h ^= h >> np.uint32(16)
        h *= np.uint32(0x85EBCA6B)
        h ^= h >> np.uint32(13)
        h *= np.uint32(0xC2B2AE35)
        h ^= h >> np.uint32(16)
    expect_keep = h < np.uint32(int(round(0.5 * 2**32)))

    x = jnp.ones((rows, cols), jnp.float32)
    y = np.asarray(dk.fused_dropout(x, jnp.int32(seed), rate))
    np.testing.assert_array_equal(y != 0, expect_keep)


def test_backward_regenerates_forward_mask(key):
    """grad(sum(fused_dropout(x))) must equal mask/keep for the SAME mask
    the forward used — the whole point of the seed-residual custom_vjp."""
    rate = 0.5
    x = jax.random.normal(key, (16, 1024), jnp.float32) + 3.0  # all nonzero
    seed = jnp.int32(99)
    y = dk.fused_dropout(x, seed, rate)
    g = jax.grad(lambda x_: jnp.sum(dk.fused_dropout(x_, seed, rate)))(x)
    fwd_mask = np.asarray(y) != 0.0
    np.testing.assert_allclose(np.asarray(g),
                               fwd_mask.astype(np.float32) / (1.0 - rate),
                               rtol=1e-6)


def test_supports_gate():
    assert dk.supports((16, 64, 16))        # 16384 % 8192 == 0
    assert not dk.supports((10, 100))       # not 1024-divisible
    assert not dk.supports((1, 1024))       # only 1 row of 1024 (< 8)


def test_seed_from_key_variants():
    k_old = jax.random.PRNGKey(3, impl="threefry2x32")
    k_new = jax.random.key(3, impl="rbg")
    s1 = dk.seed_from_key(k_old)
    s2 = dk.seed_from_key(jax.random.fold_in(k_old, 1))
    assert s1.dtype == jnp.int32 and s1.shape == ()
    assert int(s1) != int(s2)  # per-layer keys stay distinct
    s3 = dk.seed_from_key(k_new)
    assert s3.dtype == jnp.int32 and s3.shape == ()


def test_module_falls_back_off_tpu(key):
    """Dropout(impl='kernel') off-TPU uses the threefry path — identical to
    the default module (the kernel only engages on the tpu backend)."""
    from ganreverser_tpu.models.modules import Dropout
    x = jnp.ones((16, 64, 16), jnp.float32)
    y_k, _ = Dropout(0.5, impl="kernel").apply({}, x, train=True, rng=key)
    y_tf, _ = Dropout(0.5).apply({}, x, train=True, rng=key)
    np.testing.assert_array_equal(np.asarray(y_k), np.asarray(y_tf))


def test_create_r_dropout_impl_plumbing(key):
    """create_R(dropout_impl='kernel') builds (and off-TPU falls back to
    identical math as) the default R — same params, same forward."""
    from ganreverser_tpu import models as M
    R0 = M.create_R((1, 8, 8), 8, "normal")
    R1 = M.create_R((1, 8, 8), 8, "normal", dropout_impl="kernel")
    v0, _ = R0.init(key, (8, 8, 1))
    v1, _ = R1.init(key, (8, 8, 1))
    x = jax.random.normal(jax.random.fold_in(key, 1), (4, 8, 8, 1))
    y0, _ = R0.apply(v0, x, train=True, rng=jax.random.fold_in(key, 2))
    y1, _ = R1.apply(v1, x, train=True, rng=jax.random.fold_in(key, 2))
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), rtol=1e-6)


def test_kernel_bf16_r_shape(key):
    """bf16 inputs at an R-like activation shape: survivors scale right,
    keep-rate is sane, multi-tile grid (rows > one tile) stays coherent."""
    x = (jax.random.normal(key, (8, 16, 16, 64)) + 2.0).astype(jnp.bfloat16)
    y = dk._run(x, jnp.int32(5), 0.25, interpret=True)
    y = np.asarray(y.astype(jnp.float32))
    xr = np.asarray(x.astype(jnp.float32))
    kept = y != 0.0
    np.testing.assert_allclose(y[kept], (xr / 0.75)[kept], rtol=2e-2)
    sigma = (0.75 * 0.25 / y.size) ** 0.5
    assert abs(kept.mean() - 0.75) < 4 * sigma
