"""Pallas kernel parity tests vs the lax reference implementations
(SURVEY.md §7 step 7: 'each lands only with a lax-composition reference
test'). On CPU these run in interpret mode; the same code compiles on TPU."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ganreverser_tpu import analysis as A
from ganreverser_tpu.ops.topk_kernel import (cosine_scores_pallas,
                                             cosine_topk_pallas)
from ganreverser_tpu.ops.kmeans_kernel import kmeans_step_pallas


def test_cosine_scores_kernel_matches_lax(key):
    emb = jax.random.normal(key, (1024, 128))
    needles = jnp.array([0, 17, 512])
    ref = A.cosine_scores(emb, needles)
    out = cosine_scores_pallas(emb, needles, tile_n=256, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_cosine_topk_kernel_with_padding(key):
    emb = jax.random.normal(key, (700, 64))  # not a tile multiple
    needles = jnp.array([3, 99])
    ref_v, ref_i = A.cosine_topk(emb, needles, 10)
    v, i = cosine_topk_pallas(emb, needles, 10, tile_n=256, interpret=True)
    np.testing.assert_allclose(np.asarray(v), np.asarray(ref_v),
                               rtol=1e-5, atol=1e-5)
    assert np.array_equal(np.asarray(i), np.asarray(ref_i))


def test_kmeans_step_kernel_matches_lax(key):
    k1, k2 = jax.random.split(key)
    x = jax.random.normal(k1, (1024, 32))
    centroids = jax.random.normal(k2, (8, 32))

    # lax reference: one Lloyd update
    d = (jnp.sum(x * x, 1, keepdims=True)
         - 2 * x @ centroids.T + jnp.sum(centroids * centroids, 1)[None])
    assign = jnp.argmin(d, axis=1)
    onehot = jax.nn.one_hot(assign, 8)
    counts_ref = onehot.sum(0)
    sums = onehot.T @ x
    ref = jnp.where(counts_ref[:, None] > 0,
                    sums / jnp.maximum(counts_ref, 1.0)[:, None], centroids)

    new_c, counts = kmeans_step_pallas(x, centroids, tile_n=256,
                                       interpret=True)
    np.testing.assert_allclose(np.asarray(counts), np.asarray(counts_ref))
    np.testing.assert_allclose(np.asarray(new_c), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_conv_bn_act_kernel_matches_modules(key):
    """Fused conv3x3+BN(eval)+act vs the Conv -> BatchNorm -> Activation
    module composition with the same parameters."""
    from ganreverser_tpu.ops.conv_kernel import conv3x3_bn_act, fold_batchnorm
    from ganreverser_tpu import models as M

    seq = M.Sequential([M.Conv(16, 3), M.BatchNorm(16), M.Activation("elu")])
    variables, _ = seq.init(key, (8, 8, 4))
    # non-trivial BN stats
    variables["state"]["l1"]["mean"] = jax.random.normal(
        jax.random.fold_in(key, 9), (16,)) * 0.1
    variables["state"]["l1"]["var"] = jnp.abs(jax.random.normal(
        jax.random.fold_in(key, 10), (16,))) + 0.5

    x = jax.random.normal(jax.random.fold_in(key, 1), (4, 8, 8, 4))
    ref, _ = seq.apply(variables, x, train=False)

    scale, shift = fold_batchnorm(variables["params"]["l1"],
                                  variables["state"]["l1"],
                                  variables["params"]["l0"]["bias"])
    out = conv3x3_bn_act(x, variables["params"]["l0"]["kernel"],
                         scale, shift, act="elu", tile_n=2, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_conv_prelu_pool_kernel_matches_modules(key):
    """Fused conv+PReLU+maxpool vs the D/R block composition
    (createNxN + nn.SpatialMaxPooling, models.lua:273-291)."""
    from ganreverser_tpu.ops.conv_kernel import conv3x3_bn_act
    from ganreverser_tpu import models as M

    seq = M.Sequential([M.Conv(8, 3), M.PReLU(), M.MaxPool(2)])
    variables, _ = seq.init(key, (8, 8, 4))
    alpha = float(variables["params"]["l1"]["alpha"][0])
    x = jax.random.normal(jax.random.fold_in(key, 1), (4, 8, 8, 4))
    ref, _ = seq.apply(variables, x, train=False)

    out = conv3x3_bn_act(
        x, variables["params"]["l0"]["kernel"],
        jnp.ones((8,)), variables["params"]["l0"]["bias"].astype(jnp.float32),
        act="prelu", prelu_alpha=alpha, pool=True, tile_n=2, interpret=True)
    assert out.shape == (4, 4, 4, 8)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_conv_bn_act_kernel_relu(key):
    from ganreverser_tpu.ops.conv_kernel import conv3x3_bn_act
    x = jax.random.normal(key, (2, 4, 4, 3))
    kern = jax.random.normal(jax.random.fold_in(key, 1), (3, 3, 3, 8))
    out = conv3x3_bn_act(x, kern, jnp.ones((8,)), jnp.zeros((8,)),
                         act="relu", tile_n=2, interpret=True)
    assert out.shape == (2, 4, 4, 8)
    assert float(out.min()) >= 0.0


def test_kmeans_step_kernel_empty_cluster(key):
    """A centroid far from all points keeps its position."""
    x = jax.random.normal(key, (256, 16))
    centroids = jnp.concatenate([jnp.zeros((1, 16)),
                                 jnp.full((1, 16), 1e6)])
    new_c, counts = kmeans_step_pallas(x, centroids, tile_n=256,
                                       interpret=True)
    assert float(counts[1]) == 0.0
    np.testing.assert_allclose(np.asarray(new_c[1]), 1e6)


def test_cosine_topk_pixel_dim_auto_tile(key):
    """PIXEL-similarity shapes (D = H*W*C = 12288 at 64x64 RGB) must not
    blow the per-block VMEM budget: auto_tile shrinks the corpus tile
    (found live on TPU — apply_r --pallas crashed at the pixel search)."""
    from ganreverser_tpu.ops.topk_kernel import auto_tile, cosine_topk_pallas
    from ganreverser_tpu.analysis import cosine_topk
    # tile shrinks (in 128-row steps) for big D, stays put for latent D,
    # and signals lax-fallback (0) when even 128 rows exceed the budget
    assert auto_tile(512, 12288, 2) == 256
    assert auto_tile(512, 100, 4) == 512
    assert auto_tile(512, 49152, 2) == 0   # 128x128 RGB pixel similarity
    # the fallback path must produce lax results verbatim
    wide = jax.random.normal(jax.random.fold_in(key, 9), (32, 49152),
                             jnp.float32)
    vf, jf = cosine_topk_pallas(wide, jnp.array([0, 3]), 4, interpret=True)
    vl, jl = cosine_topk(wide, jnp.array([0, 3]), 4)
    np.testing.assert_array_equal(np.asarray(jf), np.asarray(jl))
    emb = jax.random.normal(key, (256, 12288), jnp.float32)
    needles = jnp.array([0, 100])
    v_pal, i_pal = cosine_topk_pallas(emb, needles, 5, interpret=True)
    v_lax, i_lax = cosine_topk(emb, needles, 5)
    np.testing.assert_array_equal(np.asarray(i_pal), np.asarray(i_lax))
    np.testing.assert_allclose(np.asarray(v_pal), np.asarray(v_lax),
                               rtol=1e-5, atol=1e-5)
