"""Host data-ingest throughput — can the loader feed the TPU? (VERDICT r2
item 4; SURVEY §7 hard part (e): "data loading at TPU speed").

The training consumers draw 3.5-5k img/s on v5e (RESULTS.md config 2/6);
this measures what the HOST side of the pipeline actually delivers from
real JPEG files on this machine:

  * decode+resize+colorspace img/s — the dataset.load_images path
    (PIL decode -> native C++ bilinear resize -> colorspace), the rebuild
    of dataset.lua:99-131/137-173's image.load+scale chain;
  * the C++ resize/colorspace kernels vs their numpy fallbacks in
    isolation (native/imageops.cc);
  * the prefetch-thread pipeline (data/prefetch.py) overlapping load with
    a simulated consumer, end to end.

A fixture directory of generated JPEGs is created under /tmp on first use
(flagged in the output). One JSON line per measurement.

Usage: python benchmarks/ingest.py [--n 2048] [--hw 64] [--src 96]
                                   [--workers N]

``--src`` sets the fixture JPEG size: at >= 2x the target, the decoder's
DCT-scaled draft mode (dataset.py::_decode_resize) kicks in — pass e.g.
--src 192 or 256 to measure the CelebA-shaped case.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _emit(metric, value, unit, **extra):
    rec = {"metric": metric, "value": round(value, 1), "unit": unit}
    rec.update(extra)
    print(json.dumps(rec), flush=True)


def make_fixture(n: int, src_hw: int = 96, path: str = None) -> str:
    """Generate n JPEGs (synthetic faces at src_hw, a realistic decode
    size) once; reused across runs."""
    from PIL import Image
    from ganreverser_tpu.data.synthetic import synthetic_faces
    path = path or f"/tmp/ingest_fixture_{n}_{src_hw}"
    marker = os.path.join(path, "DONE")
    if os.path.isfile(marker):
        return path
    os.makedirs(path, exist_ok=True)
    rng = np.random.default_rng(0)
    chunk = 256
    idx = 0
    for start in range(0, n, chunk):
        imgs = synthetic_faces(min(chunk, n - start), src_hw, src_hw, rng)
        for im in imgs:
            arr = (np.clip(im, 0, 1) * 255).astype(np.uint8)
            Image.fromarray(arr).save(
                os.path.join(path, f"img_{idx:06d}.jpg"), quality=90)
            idx += 1
    with open(marker, "w") as f:
        f.write(str(n))
    return path


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    n = int(argv[argv.index("--n") + 1]) if "--n" in argv else 2048
    hw = int(argv[argv.index("--hw") + 1]) if "--hw" in argv else 64
    src = int(argv[argv.index("--src") + 1]) if "--src" in argv else 96
    # decode thread pool (Dataset decode_workers); default = cpu count
    workers = (int(argv[argv.index("--workers") + 1])
               if "--workers" in argv else None)

    from ganreverser_tpu.data.dataset import Dataset
    from ganreverser_tpu.data.colorspace import rgb_to_colorspace
    from ganreverser_tpu import native

    fixture = make_fixture(n, src)
    print(f"[ingest] fixture: {fixture} ({n} JPEGs @{src}x{src}), "
          f"target {hw}x{hw}, "
          f"native C++ imageops available: {native.available()}",
          file=sys.stderr)

    # --- the real loader path: decode + C++ resize + colorspace ---------
    for cs in ("rgb", "yuv"):
        ds = Dataset([fixture], height=hw, width=hw, colorspace=cs,
                     decode_workers=workers)
        ds.load_images(0, 32)  # warm the path cache / page cache
        t0 = time.perf_counter()
        out = ds.load_images(0, n)
        t = time.perf_counter() - t0
        assert out.shape == (n, hw, hw, 3), out.shape
        _emit(f"jpeg decode+resize+{cs} (dataset.load_images)", n / t,
              "img/s", ms_total=round(t * 1e3, 1))

    # --- isolate the post-decode kernels: C++ vs numpy ------------------
    rng = np.random.default_rng(1)
    batch = rng.random((512, src, src, 3), np.float32)
    from ganreverser_tpu.native import imageops as io_native

    def timeit(fn, reps=5):
        fn()  # warm
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        return best

    t_cpp = timeit(lambda: native.resize_bilinear_batch(batch, hw, hw))
    _emit(f"resize {src}->{hw} C++ batch512"
          if native.available() else f"resize {src}->{hw} (numpy; no C++ lib)",
          512 / t_cpp, "img/s")
    if native.available():
        t_np = timeit(lambda: io_native._resize_numpy(batch, hw, hw))
        _emit(f"resize {src}->{hw} numpy batch512", 512 / t_np, "img/s",
              cpp_speedup=round(t_np / t_cpp, 2))

    small = rng.random((512, hw, hw, 3), np.float32)
    t_cs = timeit(lambda: rgb_to_colorspace(small, "yuv"))
    _emit(f"rgb->yuv {hw}x{hw} batch512", 512 / t_cs, "img/s")

    # --- decoded-tensor disk cache: cold (fill) vs warm epochs ----------
    # the reference re-decodes every epoch (dataset.lua:137-173); the
    # cache (data/cache.py) lifts epochs 2..N past the decode bound
    if "--cache" in argv:
        import shutil
        import tempfile
        cache_dir = tempfile.mkdtemp(prefix="ingest_cache_")
        try:
            ds = Dataset([fixture], height=hw, width=hw, colorspace="rgb",
                         decode_workers=workers, cache_dir=cache_dir)
            ds.load_images(0, 32)  # warm path/page caches (also fills 32)
            t0 = time.perf_counter()
            ds.load_images(0, n)
            t_cold = time.perf_counter() - t0
            _emit("epoch 1 decode+fill cache (dataset.load_images)",
                  n / t_cold, "img/s", ms_total=round(t_cold * 1e3, 1))
            t0 = time.perf_counter()
            ds.load_images(0, n)
            t_warm = time.perf_counter() - t0
            _emit("epoch 2 cache-hit (dataset.load_images)", n / t_warm,
                  "img/s", ms_total=round(t_warm * 1e3, 1),
                  warm_speedup=round(t_cold / t_warm, 2))
        finally:
            shutil.rmtree(cache_dir, ignore_errors=True)

    # --- prefetch pipeline: loader thread + simulated consumer ----------
    from ganreverser_tpu.data.prefetch import prefetch_to_device
    ds = Dataset([fixture], height=hw, width=hw, colorspace="rgb",
                 decode_workers=workers)
    bs = 128
    n_batches = n // bs
    ds.load_images(0, 32)  # page-cache warm
    t0 = time.perf_counter()
    for batch_arr in prefetch_to_device(
            lambda i: ds.load_images(i * bs, bs), n_batches,
            host_only=True):  # host pipeline only: no device/backend init
        pass  # consumer cost ~0: measures pure pipeline delivery
    t = time.perf_counter() - t0
    _emit(f"prefetch pipeline delivery b{bs}", n_batches * bs / t, "img/s",
          note="loader thread + zero-cost consumer; compare against the "
               "3.5-5k img/s training consumption (RESULTS.md)")


if __name__ == "__main__":
    main()
