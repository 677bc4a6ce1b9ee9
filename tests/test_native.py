"""Native C++ image-ops parity tests vs the numpy paths."""
import numpy as np
import pytest

from ganreverser_tpu import native
from ganreverser_tpu.data import colorspace as cs
from ganreverser_tpu.native.imageops import _resize_numpy


def test_native_builds():
    assert native.available(), "g++ build of imageops.cc failed"


def test_resize_matches_numpy(rng):
    x = rng.random((3, 17, 13, 3), np.float32)
    a = native.resize_bilinear_batch(x, 8, 8)
    b = _resize_numpy(x, 8, 8)
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)
    up = native.resize_bilinear_batch(x, 32, 32)
    assert up.shape == (3, 32, 32, 3)


def test_colorspace_matches_numpy(rng):
    x = rng.random((2, 8, 8, 3), np.float32)
    np.testing.assert_allclose(native.rgb2y_native(x), cs.rgb2y(x),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(native.rgb2yuv_native(x), cs.rgb2yuv(x),
                               rtol=1e-5, atol=1e-6)
    yuv = cs.rgb2yuv(x)
    np.testing.assert_allclose(native.yuv2rgb_native(yuv), cs.yuv2rgb(yuv),
                               rtol=1e-4, atol=1e-5)


def test_normalize_inplace(rng):
    x = rng.random((4, 4), np.float32) * 1.2  # some values > 1 to clamp
    ref = np.clip(x * 2.0 - 1.0, -1.0, 1.0)
    ok = native.normalize_pm1_inplace(x)
    assert ok
    np.testing.assert_allclose(x, ref, rtol=1e-6)


def test_assemble_grid_matches_python(rng):
    from ganreverser_tpu.utils.grids import images_to_grid
    imgs = rng.random((5, 4, 4, 3), np.float32)
    a = native.assemble_grid(imgs, 2, 3, strip=0)
    b = images_to_grid(imgs, 2, 3)  # python path, no epoch strip
    np.testing.assert_allclose(a, b)
