"""Metrics / observability — replaces the reference's browser `display`
dashboards, stdout prints, and xlua.progress (SURVEY.md §5.5, §5.1).

* scalars -> JSONL event file (one line per record, greppable/plottable);
* image grids -> PNG artifacts under <save>/images* like the reference
  (train.lua:312-314, logs/images/README.md);
* per-step timing -> the step-timing logger replacing xlua.progress;
* optional jax.profiler trace context for real TPU traces.
"""
from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Optional

import numpy as np


class MetricsWriter:
    """JSONL scalars + image-grid artifacts. In multi-process runs only
    process 0 writes (every rank computes identical replicated values;
    concurrent same-file appends would interleave)."""

    def __init__(self, save_dir: str, name: str = "events"):
        import jax
        self.active = jax.process_index() == 0
        self.save_dir = save_dir
        self.path = os.path.join(save_dir, f"{name}.jsonl")
        self._f = None
        if self.active:
            os.makedirs(save_dir, exist_ok=True)
            self._f = open(self.path, "a")
        self._t0 = time.time()

    def scalar(self, tag: str, value, step: Optional[int] = None, **extra):
        if not self.active:
            return
        rec = {"tag": tag, "value": float(value),
               "wall": round(time.time() - self._t0, 3)}
        if step is not None:
            rec["step"] = int(step)
        rec.update(extra)
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()

    def image_grid(self, tag: str, images, grid_h: int, grid_w: int,
                   epoch: Optional[int] = None,
                   subdir: str = "images") -> Optional[str]:
        if not self.active:
            return None
        from ..utils.grids import save_images_as_grid
        out_dir = os.path.join(self.save_dir, subdir)
        fname = f"{tag}_{epoch:06d}.png" if epoch is not None else f"{tag}.png"
        path = os.path.join(out_dir, fname)
        save_images_as_grid(path, np.asarray(images), grid_h, grid_w, epoch)
        return path

    def chart(self, tag: str, rows, labels, *, title: str = "",
              subdir: str = "images") -> Optional[str]:
        """Render a DISP.plot-style loss chart (io/plots.py) to
        ``<save>/<subdir>/<tag>.png``, overwritten each call — the
        file is the live 'window', like the reference's display plots
        (train_r.lua:204, pretrain_g.lua:244). Empty ``rows`` still write
        the empty-axes chart, so the artifact exists from the first call."""
        if not self.active:
            return None
        from .plots import save_chart
        path = os.path.join(self.save_dir, subdir, f"{tag}.png")
        return save_chart(path, rows, labels, title=title)

    def close(self):
        if self._f is not None:
            self._f.close()


class StepTimer:
    """Step-timing logger (replaces xlua.progress, adversarial.lua:194)."""

    def __init__(self, writer: Optional[MetricsWriter] = None,
                 log_every: int = 100, tag: str = "step_time"):
        self.writer = writer
        self.log_every = log_every
        self.tag = tag
        self._last = time.perf_counter()
        self._count = 0
        self._acc = 0.0

    def tick(self, step: Optional[int] = None) -> float:
        now = time.perf_counter()
        dt = now - self._last
        self._last = now
        self._count += 1
        self._acc += dt
        if self.writer and self._count % self.log_every == 0:
            self.writer.scalar(self.tag, self._acc / self.log_every,
                               step=step)
            self._acc = 0.0
        return dt


@contextlib.contextmanager
def profiler_trace(log_dir: Optional[str]):
    """jax.profiler trace context (SURVEY.md §5.1); no-op when disabled."""
    if not log_dir:
        yield
        return
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def nan_guard(tree, where: str = "") -> bool:
    """The reference's NaN scan on generated images (train.lua:303-305),
    generalized to any pytree. Returns True if NaN/Inf found."""
    import jax
    bad = False
    for leaf in jax.tree_util.tree_leaves(tree):
        arr = np.asarray(leaf)
        if not np.isfinite(arr).all():
            bad = True
            break
    return bad
