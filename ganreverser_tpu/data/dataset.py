"""Image directory pipeline — dataset.lua, host-side (PIL + numpy), NHWC.

Differences from the reference, by design:
* returns whole NHWC float32 arrays (device-friendly) instead of per-image
  tables with metatables;
* decoding is the host hot loop (dataset.lua:148-151's image.load/scale);
  batches then move to device via the prefetcher (data/prefetch.py);
* 'synthetic' as a dataset directory selects the built-in procedural face
  generator so every pipeline runs without real data.
"""
from __future__ import annotations

import os
from typing import List, Optional, Sequence

import numpy as np

from .colorspace import rgb_to_colorspace
from .hostmem import disable_hugepage_madvise
from .synthetic import synthetic_faces


def scan_image_paths(dirs: Sequence[str], ext: str = "jpg") -> List[str]:
    """dataset.loadPaths (dataset.lua:67-93): all files matching the
    extension, sorted for reproducibility; errors when a directory yields
    nothing."""
    files: List[str] = []
    for d in dirs:
        if not os.path.isdir(d):
            raise FileNotFoundError(
                f"dataset directory {d!r} does not exist (pass a directory "
                "of *.jpg images, or 'synthetic')")
        # match the real extension ('.jpg', case-insensitive; also '.jpeg'
        # for ext='jpg') — a bare endswith matched non-extension suffixes
        # like 'thumbsjpg' and missed '.JPG' camera exports.
        # DELIBERATE divergence from the reference (dataset.lua:77,
        # file:find(ext..'$')): that match is case-sensitive and dot-free,
        # so it accepts 'thumbsjpg' but rejects '.jpeg'/'.JPG' — a
        # parity-audit run over a mixed-case directory loads a different
        # file set here, by design (flagged per repo convention).
        suffixes = ("." + ext.lower(),)
        if ext.lower() == "jpg":
            suffixes += (".jpeg",)
        found = [os.path.join(d, name) for name in os.listdir(d)
                 if name.lower().endswith(suffixes)]
        if not found:
            raise FileNotFoundError(
                f"directory {d!r} doesn't contain any files of type: {ext}")
        files.extend(found)
    files.sort()
    return files


def _decode_resize(path: str, height: int, width: int,
                   draft: bool = True) -> np.ndarray:
    """JPEG decode (PIL's libjpeg-turbo codec) + bilinear resize via the
    C++ image-ops library (native/imageops.cc; numpy fallback inside).

    ``draft`` asks libjpeg for DCT-domain scaled decoding (1/2, 1/4, 1/8)
    down to the smallest scale still >= the target — for originals larger
    than 2x the target (e.g. CelebA 178x218 -> 64x64) most of the IDCT
    and all of the full-size pixel traffic is skipped, then the final
    bilinear pass does the exact geometry. Decoding is the measured host
    ingest bottleneck (RESULTS.md round 3: ~0.4 ms/img of the ~0.5 ms
    total); the reference decodes full-size always (dataset.lua:148).
    Draft decode changes pixel values slightly for >=2x originals
    (|err| < 0.05 tested); ``draft=False`` (Dataset(decode_draft=False) /
    the CLIs' --exact_decode) restores full-size decode for parity
    audits."""
    from PIL import Image
    from ..native import resize_bilinear_batch
    with Image.open(path) as im:
        if draft and im.format == "JPEG":
            im.draft("RGB", (width, height))
        im = im.convert("RGB")
        arr = np.asarray(im, np.float32) / 255.0
    if arr.shape[:2] != (height, width):
        arr = resize_bilinear_batch(arr[None], height, width)[0]
    return arr


class Dataset:
    """The dataset.lua module as an object (its setters become ctor args)."""

    def __init__(self, dirs: Sequence[str], *, height: int = 32,
                 width: int = 32, colorspace: str = "rgb",
                 file_extension: str = "jpg", seed: int = 1,
                 decode_workers: Optional[int] = None,
                 decode_draft: bool = True,
                 cache_dir: Optional[str] = None):
        disable_hugepage_madvise()  # measured 72x fault-stall fix (hostmem.py)
        self.dirs = list(dirs)
        self.height = height
        self.width = width
        self.colorspace = colorspace
        self.file_extension = file_extension
        self._rng = np.random.default_rng(seed)
        self._paths: Optional[List[str]] = None
        self.synthetic = len(self.dirs) == 1 and self.dirs[0] == "synthetic"
        # JPEG decode is the measured ingest bottleneck (RESULTS.md round
        # 3: ~0.4 ms/img of ~0.5 total) and PIL releases the GIL inside
        # libjpeg, so a thread pool scales decode on multi-core TPU hosts.
        # Defaults to the core count; a 1-core host (like the bench host)
        # stays on the serial loop.
        if decode_workers is None:
            decode_workers = os.cpu_count() or 1
        self.decode_workers = max(1, int(decode_workers))
        self.decode_draft = decode_draft
        # opt-in decoded-tensor disk cache (data/cache.py): the reference
        # re-decodes every epoch (dataset.lua:137-173); repeated epochs on
        # the same files are decode-bound on 1-core hosts
        self.cache_dir = cache_dir
        self._cache = None
        self._pool = None  # lazy persistent decode pool (see _decode_pool)

    def _decode_pool(self):
        """One executor per Dataset, created lazily and reused — spawning
        a fresh pool per load_images call would put thread create/teardown
        on the ingest hot path. A weakref finalizer shuts the idle workers
        down when the Dataset is collected (they'd otherwise linger until
        interpreter exit)."""
        if self._pool is None:
            import weakref
            from concurrent.futures import ThreadPoolExecutor
            self._pool = ThreadPoolExecutor(
                self.decode_workers, thread_name_prefix="jpeg-decode")
            weakref.finalize(self, self._pool.shutdown, wait=False)
        return self._pool

    @property
    def paths(self) -> List[str]:
        if self._paths is None:
            self._paths = scan_image_paths(self.dirs, self.file_extension)
        return self._paths

    def size(self) -> int:
        return 100000 if self.synthetic else len(self.paths)

    def _finish(self, images: np.ndarray) -> np.ndarray:
        return rgb_to_colorspace(images, self.colorspace)

    def _get_cache(self):
        if self.cache_dir is not None and self._cache is None:
            from .cache import DecodedCache
            self._cache = DecodedCache(self.cache_dir, self.paths,
                                       self.height, self.width,
                                       decode_draft=self.decode_draft)
        return self._cache

    def _decode_into(self, indices: Sequence[int]) -> np.ndarray:
        """Decode each file straight into one preallocated batch tensor
        (no per-image array list + np.stack copy — the decode loop is the
        host hot path, dataset.lua:148-151). With ``decode_workers > 1``
        the files decode in a thread pool: each worker writes its own
        row of ``out`` (disjoint — no synchronization needed) and PIL's
        libjpeg call releases the GIL, so decode parallelizes on real
        multi-core hosts. ``indices`` are positions into self.paths; with
        ``cache_dir`` set, already-decoded rows come from the disk slab
        and fresh decodes warm it (data/cache.py)."""
        out = np.empty((len(indices), self.height, self.width, 3),
                       np.float32)
        cache = self._get_cache()

        def decode_row(i):
            gi = indices[i]
            if cache is not None and cache.hit(gi):
                out[i] = cache.get(gi)
                return
            out[i] = _decode_resize(self.paths[gi], self.height, self.width,
                                    self.decode_draft)
            if cache is not None:
                cache.put(gi, out[i])

        if self.decode_workers > 1 and len(indices) > 1:
            # list(...) drains the iterator so worker exceptions
            # propagate here instead of being silently dropped
            list(self._decode_pool().map(decode_row, range(len(indices))))
        else:
            for i in range(len(indices)):
                decode_row(i)
        return out

    def load_images(self, start_at: int, count: int) -> np.ndarray:
        """dataset.loadImages (dataset.lua:99-131): sequential, 0-based
        start index (the reference is 1-based)."""
        if self.synthetic:
            return self._finish(synthetic_faces(
                count, self.height, self.width,
                np.random.default_rng(start_at)))
        n = min(count, len(self.paths) - start_at)
        imgs = self._decode_into(range(start_at, start_at + n))
        return self._finish(imgs)

    def load_random_images(self, count: int) -> np.ndarray:
        """dataset.loadRandomImages (dataset.lua:137-173): a fresh random
        permutation per call, count capped at the dataset size."""
        if self.synthetic:
            return self._finish(synthetic_faces(
                count, self.height, self.width, self._rng))
        perm = self._rng.permutation(len(self.paths))
        n = min(count, len(perm))
        imgs = self._decode_into([int(perm[i]) for i in range(n)])
        return self._finish(imgs)


def normalize_images(images: np.ndarray):
    """NN_UTILS.normalize (nn_utils.lua:324-379): map [0,1] -> [-1,1], clamp
    in place; returns the reference's dummy (0.5, 0.5)."""
    if not images.flags.writeable:
        # e.g. np.asarray over a jax array: the native path would silently
        # write through into device-owned memory; fail loudly instead
        raise ValueError("normalize_images mutates in place — pass a "
                         "writable array (np.array(...), not a view)")
    from ..native import normalize_pm1_inplace
    if not normalize_pm1_inplace(images):
        images *= 2.0
        images -= 1.0
        np.clip(images, -1.0, 1.0, out=images)
    return 0.5, 0.5
