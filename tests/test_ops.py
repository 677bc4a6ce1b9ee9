"""ops parity tests: every optimized op lands only with a reference-
composition equivalence test (SURVEY.md §7 step 7)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ganreverser_tpu import models as M
from ganreverser_tpu.ops import (upsample2_conv3x3,
                                 upsample2_conv3x3_reference)


@pytest.mark.parametrize("h,w,ci,co", [(4, 4, 3, 5), (8, 6, 7, 4),
                                       (16, 16, 8, 8)])
def test_upsample_conv_exact(key, h, w, ci, co):
    k1, k2, k3 = jax.random.split(key, 3)
    x = jax.random.normal(k1, (2, h, w, ci))
    kernel = jax.random.normal(k2, (3, 3, ci, co))
    bias = jax.random.normal(k3, (co,))
    ref = upsample2_conv3x3_reference(x, kernel, bias)
    out = upsample2_conv3x3(x, kernel, bias)
    assert out.shape == (2, 2 * h, 2 * w, co)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_fused_G_matches_unfused(key):
    """create_G(fuse=True) and fuse=False share the same param pytree and
    produce the same outputs."""
    dims, nd = (1, 8, 8), 8
    Gf = M.create_G(dims, nd, fuse=True)
    Gu = M.create_G(dims, nd, fuse=False)
    vf, _ = Gf.init(key, (nd,))
    vu, _ = Gu.init(key, (nd,))
    # identical initialization (same layer indices -> same fold_in keys)
    for a, b in zip(jax.tree_util.tree_leaves(vf),
                    jax.tree_util.tree_leaves(vu)):
        assert np.allclose(np.asarray(a), np.asarray(b))
    z = jax.random.normal(jax.random.fold_in(key, 1), (4, nd))
    yf, _ = Gf.apply(vf, z, train=False)
    yu, _ = Gu.apply(vu, z, train=False)
    np.testing.assert_allclose(np.asarray(yf), np.asarray(yu),
                               rtol=1e-5, atol=1e-5)
