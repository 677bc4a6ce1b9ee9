"""Data pipeline tests: color-space conversions (incl. the custom 0.21/0.72/
0.07 rgb2y, nn_utils.lua:221-246), round trips, normalize, directory scan
ordering (dataset.lua:67-93), synthetic faces, prefetcher, grid renderer with
the epoch bitmap stamp (nn_utils.lua:429-535), config round-trips."""
import os

import numpy as np
import pytest

from ganreverser_tpu import data as D
from ganreverser_tpu.core.config import GanConfig, RConfig
from ganreverser_tpu.utils import grids


def test_rgb2y_custom_weights(rng):
    x = rng.random((2, 4, 4, 3), np.float32)
    y = D.rgb2y(x)
    ref = 0.21 * x[..., 0] + 0.72 * x[..., 1] + 0.07 * x[..., 2]
    np.testing.assert_allclose(y[..., 0], ref, rtol=1e-6)
    y3 = D.rgb2y(x, three_channels=True)
    assert y3.shape == (2, 4, 4, 3)


def test_yuv_roundtrip(rng):
    x = rng.random((2, 4, 4, 3), np.float32)
    back = D.yuv2rgb(D.rgb2yuv(x))
    np.testing.assert_allclose(back, x, atol=1e-4)


def test_hsl_roundtrip(rng):
    x = rng.random((2, 8, 8, 3), np.float32)
    back = D.hsl2rgb(D.rgb2hsl(x))
    np.testing.assert_allclose(back, x, atol=1e-5)
    # known values: pure red -> h=0, s=1, l=0.5
    red = np.zeros((1, 1, 1, 3), np.float32)
    red[..., 0] = 1.0
    hsl = D.rgb2hsl(red)[0, 0, 0]
    assert hsl[0] == pytest.approx(0.0)
    assert hsl[1] == pytest.approx(1.0)
    assert hsl[2] == pytest.approx(0.5)


def test_switch_colorspace(rng):
    x = rng.random((2, 4, 4, 3), np.float32)
    out = D.switch_colorspace(D.rgb_to_colorspace(x, "yuv"), "yuv", "y")
    assert out.shape == (2, 4, 4, 1)


def test_normalize_pm1(rng):
    x = (rng.random((3, 4), np.float32) * 1.5).astype(np.float32)
    orig = x.copy()
    mean, std = D.normalize_images(x)
    assert (mean, std) == (0.5, 0.5)  # reference dummy values
    np.testing.assert_allclose(x, np.clip(orig * 2 - 1, -1, 1), rtol=1e-6)


def test_scan_sorted(tmp_path):
    for name in ["c.jpg", "a.jpg", "b.jpg", "skip.png"]:
        (tmp_path / name).write_bytes(b"x")
    paths = D.scan_image_paths([str(tmp_path)], "jpg")
    assert [os.path.basename(p) for p in paths] == ["a.jpg", "b.jpg", "c.jpg"]
    with pytest.raises(FileNotFoundError):
        D.scan_image_paths([str(tmp_path)], "gif")


def test_dataset_jpg_loading(tmp_path, rng):
    from PIL import Image
    for i in range(4):
        arr = (rng.random((16, 16, 3)) * 255).astype(np.uint8)
        Image.fromarray(arr).save(tmp_path / f"img_{i}.jpg")
    ds = D.Dataset([str(tmp_path)], height=8, width=8, colorspace="y")
    assert ds.size() == 4
    imgs = ds.load_images(0, 3)
    assert imgs.shape == (3, 8, 8, 1)
    assert imgs.min() >= 0.0 and imgs.max() <= 1.0
    rnd = ds.load_random_images(10)  # capped at dataset size
    assert rnd.shape == (4, 8, 8, 1)


def test_synthetic_faces(rng):
    faces = D.synthetic_faces(6, 16, 16, rng)
    assert faces.shape == (6, 16, 16, 3)
    assert faces.min() >= 0.0 and faces.max() <= 1.0
    # faces vary
    assert np.std(faces, axis=0).mean() > 0.01


def test_prefetch(rng):
    import jax
    batches = list(D.prefetch_to_device(
        lambda i: np.full((2, 2), i, np.float32), 5))
    assert len(batches) == 5
    assert float(batches[3][0, 0]) == 3.0


def test_prefetch_worker_error_propagates(rng):
    """A batch_fn failure on the worker thread must re-raise in the consumer
    (fail-fast) instead of leaving it blocked on q.get() forever."""
    def bad_batch(i):
        if i == 2:
            raise ValueError("corrupt JPEG at batch 2")
        return np.zeros((2, 2), np.float32)

    it = D.prefetch_to_device(bad_batch, 5)
    import pytest
    with pytest.raises(ValueError, match="corrupt JPEG"):
        list(it)


def test_grid_epoch_stamp():
    imgs = np.ones((4, 8, 8, 1), np.float32) * 0.5
    g = grids.images_to_grid(imgs, 2, 2, epoch=42)
    assert g.shape == (2 * 8 + 7, 2 * 8, 1)
    # digit pixels of '42' present in the bottom strip
    strip = g[-6:-1]
    assert strip.max() == 1.0
    # '4' and '2' bitmaps appear right-to-left: rightmost digit is 2
    x0 = g.shape[1] - 1 - 5 - 1
    np.testing.assert_allclose(strip[:, x0:x0 + 3, 0],
                               grids.CHAR_TENSORS[2])


def test_add_border():
    img = np.zeros((4, 4, 3), np.float32)
    out = grids.add_border(img, grids.BLUE)
    assert out[0, 0, 2] == 1.0 and out[0, 0, 0] == 0.0
    assert out[2, 2].sum() == 0.0  # interior untouched
    gray = np.zeros((4, 4, 1), np.float32)
    outg = grids.add_border(gray, grids.RED)
    assert outg.shape == (4, 4, 1)


def test_config_roundtrip():
    cfg = GanConfig(noiseDim=64, colorSpace="y", height=16, width=16)
    cfg2 = GanConfig.from_json(cfg.to_json())
    assert cfg2 == cfg
    assert cfg2.img_dims() == (1, 16, 16)
    r = RConfig.from_dict({"noiseDim": 7, "unknown_key": 1})
    assert r.noiseDim == 7  # unknown keys ignored (forward compat)


def test_config_argparse():
    cfg = GanConfig.from_args(["--noiseDim", "12", "--nopretraining"])
    assert cfg.noiseDim == 12 and cfg.nopretraining is True
    assert cfg.batchSize == 32  # reference default (train.lua:27)


def test_hostmem_madvise_toggle(tmp_path):
    """Dataset construction disables numpy's MADV_HUGEPAGE hint (the
    measured 72x ingest fault-stall fix, data/hostmem.py) idempotently,
    and allocation behaviour stays correct afterwards."""
    from ganreverser_tpu.data import hostmem

    hostmem.disable_hugepage_madvise()
    hostmem.disable_hugepage_madvise()  # idempotent
    assert hostmem._applied
    try:
        from numpy._core import multiarray as m
    except ImportError:
        from numpy.core import multiarray as m
    # previous value False proves the toggle really was applied
    assert m._set_madvise_hugepage(False) is False
    big = np.empty((2048, 64, 64, 3), np.float32)  # >4MB threshold path
    big[:] = 1.0
    assert float(big.sum()) == big.size


def test_decode_draft_scaling(tmp_path):
    """DCT-scaled JPEG decode (dataset.py::_decode_resize draft mode):
    originals < 2x the target decode bit-identically to the full path;
    >= 2x originals use libjpeg's scaled decode, which must stay close to
    full-decode+bilinear (it is an approximation, flagged in the
    docstring) and exact in shape/range."""
    from PIL import Image
    from ganreverser_tpu.data.dataset import _decode_resize
    from ganreverser_tpu.native import resize_bilinear_batch
    y, x = np.mgrid[0:256, 0:256] / 256.0
    smooth = np.stack([np.sin(4 * y) * 0.5 + 0.5, x, y * x], -1)
    for size in (96, 256):
        img = smooth[:size, :size]
        p = tmp_path / f"s{size}.jpg"
        Image.fromarray((img * 255).astype(np.uint8)).save(p, quality=95)
        out = _decode_resize(str(p), 64, 64)
        with Image.open(p) as im:
            full = np.asarray(im.convert("RGB"), np.float32) / 255.0
        ref = resize_bilinear_batch(full[None], 64, 64)[0]
        assert out.shape == (64, 64, 3)
        if size < 128:  # draft can't scale: identical to the full path
            np.testing.assert_array_equal(out, ref)
        else:
            assert np.abs(out - ref).max() < 0.05


def test_decode_draft_opt_out(tmp_path):
    """Dataset(decode_draft=False) — the CLIs' --exact_decode — restores
    the reference's full-size decode (dataset.lua:148) exactly: the loaded
    batch is bit-identical to full-decode + bilinear, for a >=2x original
    where draft mode WOULD deviate."""
    from PIL import Image
    from ganreverser_tpu.data.dataset import Dataset
    from ganreverser_tpu.native import resize_bilinear_batch
    y, x = np.mgrid[0:256, 0:256] / 256.0
    smooth = np.stack([np.sin(4 * y) * 0.5 + 0.5, x, y * x], -1)
    p = tmp_path / "big.jpg"
    Image.fromarray((smooth * 255).astype(np.uint8)).save(p, quality=95)
    with Image.open(p) as im:
        full = np.asarray(im.convert("RGB"), np.float32) / 255.0
    ref = resize_bilinear_batch(full[None], 64, 64)
    kw = dict(height=64, width=64, colorspace="rgb")
    exact = Dataset([str(tmp_path)], decode_draft=False, **kw)
    np.testing.assert_array_equal(exact.load_images(0, 1), ref)
    draft = Dataset([str(tmp_path)], **kw)  # default stays draft
    assert not np.array_equal(draft.load_images(0, 1), ref)


def test_decode_workers_parity(tmp_path, rng):
    """Thread-pool decode (decode_workers>1) produces bit-identical
    batches to the serial loop — each worker writes a disjoint row."""
    from PIL import Image
    for i in range(12):
        arr = (rng.random((24, 24, 3)) * 255).astype(np.uint8)
        Image.fromarray(arr).save(tmp_path / f"img_{i}.jpg")
    kw = dict(height=16, width=16, colorspace="rgb")
    serial = D.Dataset([str(tmp_path)], decode_workers=1, **kw)
    pooled = D.Dataset([str(tmp_path)], decode_workers=4, **kw)
    np.testing.assert_array_equal(serial.load_images(0, 12),
                                  pooled.load_images(0, 12))
    assert pooled.decode_workers == 4


def test_prefetch_with_pooled_decode(tmp_path, rng):
    """The combined production ingest path: prefetch worker thread calling
    Dataset.load_images with the persistent decode pool (threads inside a
    thread) — batches arrive in order and bit-match the direct path."""
    from PIL import Image
    for i in range(16):
        arr = (rng.random((16, 16, 3)) * 255).astype(np.uint8)
        Image.fromarray(arr).save(tmp_path / f"img_{i}.jpg")
    ds = D.Dataset([str(tmp_path)], height=8, width=8, colorspace="rgb",
                   decode_workers=3)
    bs = 4
    batches = list(D.prefetch_to_device(
        lambda i: ds.load_images(i * bs, bs), 4, host_only=True))
    assert len(batches) == 4
    direct = ds.load_images(0, 16)
    got = np.concatenate([np.asarray(b) for b in batches])
    np.testing.assert_array_equal(got, direct)


def _cache_racer(cache_dir, paths, lo, hi, q):
    """Child-process body for the concurrent-creation test (module level:
    must pickle under the spawn start method)."""
    try:
        import numpy as _np

        from ganreverser_tpu.data.cache import DecodedCache
        cache = DecodedCache(cache_dir, paths, 8, 8)
        for i in range(lo, hi):
            cache.put(i, _np.full((8, 8, 3), i / 32.0, _np.float32))
        got = sum(cache.hit(i) for i in range(lo, hi))
        q.put(("ok", got))
    except BaseException as e:  # noqa: BLE001 — report to the parent
        q.put(("err", repr(e)))


def test_decode_cache_concurrent_creation(tmp_path):
    """Two real processes construct the SAME DecodedCache simultaneously
    (multi-process ranks share --decode_cache): the rename-based creation
    must never truncate a slab the other process already mapped (worst
    case is a spurious re-decode, never a crash or a garbage row)."""
    import multiprocessing as mp
    paths = [f"/fake/img_{i}.jpg" for i in range(32)]
    ctx = mp.get_context("spawn")
    q = ctx.Queue()
    procs = [ctx.Process(target=_cache_racer,
                         args=(str(tmp_path / "c"), paths, lo, hi, q))
             for lo, hi in ((0, 16), (16, 32))]
    for p in procs:
        p.start()
    results = [q.get(timeout=120) for _ in procs]
    for p in procs:
        p.join(timeout=120)
        assert p.exitcode == 0
    assert all(tag == "ok" for tag, _ in results), results
    # each writer saw its own rows present in ITS mapping
    assert [n for _, n in results] == [16, 16]
    # the surviving canonical slab serves whatever rows it has with the
    # written values (losers' rows may be absent — that is the contract)
    from ganreverser_tpu.data.cache import DecodedCache
    cache = DecodedCache(str(tmp_path / "c"), paths, 8, 8)
    for i in range(32):
        if cache.hit(i):
            np.testing.assert_allclose(cache.get(i)[0, 0, 0], i / 32.0,
                                       atol=1 / 255)


def test_decode_cache_warm_hits_and_quantization(tmp_path, rng):
    """Decoded-tensor disk cache (data/cache.py): a second epoch serves
    every row from the slab (fill_count pinned), warm loads match cold
    loads within the documented uint8 quantization bound (1/510), and the
    cache key changes with geometry (no stale hits). The reference
    re-decodes every epoch (dataset.lua:137-173) — the cache is the
    opt-in deviation, so its accuracy contract is pinned here."""
    from PIL import Image
    for i in range(10):
        arr = (rng.random((24, 24, 3)) * 255).astype(np.uint8)
        Image.fromarray(arr).save(tmp_path / f"img_{i}.jpg")
    cache_dir = str(tmp_path / "cache")
    kw = dict(height=16, width=16, colorspace="rgb", decode_workers=2)
    plain = D.Dataset([str(tmp_path)], **kw)
    cached = D.Dataset([str(tmp_path)], cache_dir=cache_dir, **kw)
    ref = plain.load_images(0, 10)
    cold = cached.load_images(0, 10)          # fills the slab
    np.testing.assert_allclose(cold, ref, atol=1 / 510 + 1e-7)
    assert cached._cache.fill_count == 10
    warm = cached.load_images(0, 10)          # every row from the slab
    np.testing.assert_allclose(warm, ref, atol=1 / 510 + 1e-7)
    # the warm epoch is uint8-roundtrip-stable: re-reading the slab gives
    # bit-identical rows (quantize once, not per epoch)
    np.testing.assert_array_equal(warm, cached.load_images(0, 10))
    # a second Dataset over the same dir reuses the slab from disk
    reopened = D.Dataset([str(tmp_path)], cache_dir=cache_dir, **kw)
    reopened.load_images(0, 10)
    assert reopened._cache.fill_count == 10
    # random-order loads hit the same rows
    rand = cached.load_random_images(10)
    assert sorted(map(tuple, rand.reshape(10, -1).round(3).tolist())) == \
        sorted(map(tuple, warm.reshape(10, -1).round(3).tolist()))
    # geometry change -> different key -> cold cache, correct shape
    other = D.Dataset([str(tmp_path)], height=8, width=8, colorspace="rgb",
                      cache_dir=cache_dir)
    assert other.load_images(0, 10).shape == (10, 8, 8, 3)
    assert other._cache.fill_count == 10
    assert other._cache._slab.shape == (10, 8, 8, 3)


def test_decode_cache_key_includes_decode_mode(tmp_path, rng):
    """A slab warmed by draft decodes must not serve --exact_decode loads
    (draft pixels differ up to ~0.05 at >=2x originals): decode_draft is
    part of the cache key, so exact and draft never share a slab."""
    from PIL import Image
    for i in range(4):
        arr = (rng.random((32, 32, 3)) * 255).astype(np.uint8)
        Image.fromarray(arr).save(tmp_path / f"img_{i}.jpg")
    cache_dir = str(tmp_path / "cache")
    kw = dict(height=16, width=16, colorspace="rgb")
    draft = D.Dataset([str(tmp_path)], cache_dir=cache_dir,
                      decode_draft=True, **kw)
    draft.load_images(0, 4)                      # warms the DRAFT slab
    exact = D.Dataset([str(tmp_path)], cache_dir=cache_dir,
                      decode_draft=False, **kw)
    assert exact._get_cache().fill_count == 0    # cold: different key
    ref = D.Dataset([str(tmp_path)], decode_draft=False, **kw)
    np.testing.assert_allclose(exact.load_images(0, 4),
                               ref.load_images(0, 4), atol=1 / 510 + 1e-7)
    assert draft._cache._slab_path != exact._cache._slab_path
