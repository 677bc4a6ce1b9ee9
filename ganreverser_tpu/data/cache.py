"""Disk cache of decoded+resized images — the epoch-slab schedule probe.

The reference re-decodes fresh JPEGs every epoch (dataset.lua:137-173:
loadRandomImages runs image.load + image.scale per file, every call).
On this framework's measured 1-core bench host that decode loop sustains
~2k img/s against a 3.5-5k img/s training consumption rate (RESULTS.md
round 3 ingest) — the host is the bound for real-data epochs. Repeated
epochs re-pay the decode for the SAME files, so a decoded-tensor cache
keyed on (file list, geometry, decode mode) lifts every epoch after the
first to memmap-read speed.

Layout per (paths, H, W, draft) key: ONE directory under ``cache_dir``
(published atomically, see below) containing
  manifest.json   the file list + geometry + dtype + decode mode
                  (staleness check: any change -> a different key ->
                  cold cache)
  slab.npy        (N, H, W, 3) uint8 memmap, row i = paths[i]
  present.npy     (N,) uint8 memmap, 1 = row i is filled

Rows fill LAZILY on first access (an epoch's random subset warms only what
it touched), so first-epoch cost is unchanged and later epochs hit.

Precision: rows are stored as uint8 (quantized post-resize; max abs error
1/510 ≈ 0.002 vs the float pipeline) — 4x smaller than f32 and well below
JPEG's own loss. The cache is OPT-IN (`Dataset(cache_dir=...)` / the CLIs'
--decode_cache) because cached loads are not bit-identical to uncached
ones; parity audits leave it off. A/B numbers: benchmarks/ingest.py
--cache.
"""
from __future__ import annotations

import hashlib
import json
import os
import shutil
from typing import List, Optional, Sequence

import numpy as np


class DecodedCache:
    def __init__(self, cache_dir: str, paths: Sequence[str], height: int,
                 width: int, decode_draft: bool = True):
        os.makedirs(cache_dir, exist_ok=True)
        self.height, self.width = height, width
        self.n = len(paths)
        # decode_draft is part of the key: a slab warmed by DCT-scaled
        # draft decodes must never serve a Dataset built with
        # --exact_decode (draft rows differ by up to ~0.05 at >=2x
        # originals) — exact and draft pixels never share a slab.
        key_src = json.dumps([list(paths), height, width,
                              bool(decode_draft)]).encode()
        key = hashlib.sha1(key_src).hexdigest()[:16]
        mode = "draft" if decode_draft else "exact"
        d = os.path.join(cache_dir,
                         f"decoded_{key}_{height}x{width}_{mode}")
        self._slab_path = os.path.join(d, "slab.npy")
        self._present_path = os.path.join(d, "present.npy")
        if not os.path.isdir(d):
            # Staleness needs no create-then-rename (the key hash makes a
            # stale manifest impossible: any input change = new key), but
            # CONCURRENT creators do: multi-process ranks share cache_dir,
            # and a second mode="w+" open would truncate a slab the first
            # rank already mmap'd (SIGBUS on its next touch). All three
            # files are created inside ONE pid-unique temp directory and
            # published with a single atomic os.rename of the directory —
            # so slab and present can never pair across two creators (the
            # failure a per-file rename allows: creator A's present inode
            # next to creator C's zeroed slab reads as a garbage hit).
            # Losers' mmaps keep their own inodes alive — worst case is a
            # spurious re-decode of rows the winner didn't see, never
            # corruption.
            tmp = f"{d}.{os.getpid()}.tmp"
            os.makedirs(tmp, exist_ok=True)
            np.lib.format.open_memmap(
                os.path.join(tmp, "slab.npy"), mode="w+", dtype=np.uint8,
                shape=(self.n, height, width, 3)).flush()
            np.lib.format.open_memmap(
                os.path.join(tmp, "present.npy"), mode="w+",
                dtype=np.uint8, shape=(self.n,)).flush()
            with open(os.path.join(tmp, "manifest.json"), "w") as f:
                json.dump({"paths": list(paths), "height": height,
                           "width": width, "dtype": "uint8",
                           "decode_draft": bool(decode_draft)}, f)
            try:
                os.rename(tmp, d)
            except OSError:
                # another creator published first (rename onto a
                # non-empty directory fails) — use theirs
                shutil.rmtree(tmp, ignore_errors=True)
        self._slab = np.lib.format.open_memmap(self._slab_path, mode="r+")
        self._present = np.lib.format.open_memmap(self._present_path,
                                                  mode="r+")

    def hit(self, idx: int) -> bool:
        return bool(self._present[idx])

    def get(self, idx: int) -> np.ndarray:
        """Cached row as float32 in [0,1] (uint8-quantized)."""
        return self._slab[idx].astype(np.float32) / 255.0

    def put(self, idx: int, img: np.ndarray) -> None:
        """Store a decoded float32 [0,1] (H, W, 3) row. Disjoint-row
        writes — safe from the decode thread pool (same argument as
        Dataset._decode_into); the presence flag is set LAST so a torn
        write can only cause a spurious re-decode, never a garbage hit."""
        self._slab[idx] = np.clip(img * 255.0 + 0.5, 0, 255).astype(
            np.uint8)
        self._present[idx] = 1

    @property
    def fill_count(self) -> int:
        return int(self._present.sum())
