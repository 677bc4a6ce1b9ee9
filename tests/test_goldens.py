"""Numeric parity goldens (SURVEY.md §4): fp32 G/R forward outputs and
cosine-sim rankings vs a frozen-weight golden file. Goldens were generated
once from this framework's math on the CPU backend (the Torch7 reference is
not runnable here; parity is defined on identical weights + identical ops,
BASELINE.json correctness bar) — these tests pin today's numerics against
future regressions in init, layers, or the similarity kernels."""
import os

import jax
import jax.numpy as jnp
import numpy as np

from ganreverser_tpu import models as M
from ganreverser_tpu.analysis import cosine_topk
from ganreverser_tpu.core.prng import seed_key, noise_inputs

GOLDEN = os.path.join(os.path.dirname(__file__), "goldens",
                      "forward_golden.npz")


def test_forward_golden():
    g = np.load(GOLDEN)
    key = seed_key(1234)
    G = M.create_G((1, 16, 16), 8)
    R = M.create_R((1, 16, 16), 8, "normal")
    gv, _ = G.init(jax.random.fold_in(key, 1), (8,))
    rv, _ = R.init(jax.random.fold_in(key, 2), (16, 16, 1))

    flat_g = np.concatenate([
        np.asarray(x).ravel()[:5]
        for x in jax.tree_util.tree_leaves(gv["params"])])
    np.testing.assert_allclose(flat_g, g["g_param_sample"], rtol=1e-6)

    z = noise_inputs(jax.random.fold_in(key, 3), 16, 8, "normal")
    np.testing.assert_allclose(np.asarray(z), g["z"], rtol=1e-6)
    imgs, _ = G.apply(gv, z, train=False)
    np.testing.assert_allclose(np.asarray(imgs), g["images"],
                               rtol=2e-5, atol=2e-6)
    zh, _ = R.apply(rv, jnp.asarray(g["images"]), train=False)
    np.testing.assert_allclose(np.asarray(zh), g["zhat"],
                               rtol=2e-5, atol=2e-5)


def test_topk_ranking_golden():
    g = np.load(GOLDEN)
    sv, si = cosine_topk(jnp.asarray(g["emb"]), jnp.array([0, 5, 9]), 10)
    assert np.array_equal(np.asarray(si), g["topk_idx"])
    np.testing.assert_allclose(np.asarray(sv), g["topk_scores"],
                               rtol=1e-5, atol=1e-6)
