"""io.metrics tests: JSONL writer, image artifacts, step timer, NaN guard."""
import json
import os

import jax.numpy as jnp
import numpy as np

from ganreverser_tpu.io.metrics import (MetricsWriter, StepTimer, nan_guard,
                                        profiler_trace)


def test_writer_scalars_and_grids(tmp_path):
    w = MetricsWriter(str(tmp_path))
    w.scalar("loss", 0.5, step=3, phase="d")
    w.scalar("loss", 0.25, step=4)
    path = w.image_grid("samples", np.zeros((4, 8, 8, 1), np.float32),
                        2, 2, epoch=7)
    w.close()
    recs = [json.loads(l) for l in open(tmp_path / "events.jsonl")]
    assert recs[0] == {**recs[0], "tag": "loss", "value": 0.5, "step": 3,
                       "phase": "d"}
    assert os.path.isfile(path)
    assert path.endswith("samples_000007.png")


def test_step_timer(tmp_path):
    w = MetricsWriter(str(tmp_path), name="t")
    t = StepTimer(w, log_every=2, tag="st")
    for i in range(4):
        t.tick(i)
    w.close()
    recs = [json.loads(l) for l in open(tmp_path / "t.jsonl")]
    assert len(recs) == 2 and all(r["tag"] == "st" for r in recs)


def test_nan_guard():
    assert not nan_guard({"a": jnp.ones((2,))})
    assert nan_guard({"a": jnp.array([1.0, float("nan")])})
    assert nan_guard([jnp.array([float("inf")])])


def test_profiler_trace_noop():
    with profiler_trace(None):
        pass
    with profiler_trace(""):
        pass


def test_render_chart_basic():
    """io/plots.py: DISP.plot-style rows -> uint8 RGB raster with the
    series actually drawn (non-background pixels present)."""
    from ganreverser_tpu.io.plots import render_chart
    rows = [[e, 1.0 / e, 0.5 + 0.1 * e, 2.0] for e in range(1, 20)]
    img = render_chart(rows, ["epoch", "D loss", "G loss", "D acc"],
                       title="t", width=320, height=200)
    assert img.shape == (200, 320, 3) and img.dtype == "uint8"
    assert (img != 255).any(axis=-1).sum() > 500  # axes+grid+3 polylines


def test_render_chart_degenerate():
    """Empty rows, a single point, and NaN samples must not crash or
    blank the chart (the NaN point is skipped, the rest drawn)."""
    from ganreverser_tpu.io.plots import render_chart
    for rows in ([], [[1, 0.5]],
                 [[1, 0.5], [2, float("nan")], [3, 0.25]],
                 [[1, 1.0], [2, 1.0]]):  # constant y -> padded range
        img = render_chart(rows, ["epoch", "loss"])
        assert img.shape == (360, 640, 3)


def test_writer_chart_artifact(tmp_path):
    """MetricsWriter.chart writes (and overwrites) the PNG window."""
    from ganreverser_tpu.io.metrics import MetricsWriter
    w = MetricsWriter(str(tmp_path), name="t")
    p = w.chart("plot_loss", [[1, 0.9], [2, 0.5]], ["epoch", "loss"])
    assert p and (tmp_path / "images" / "plot_loss.png").exists()
    # empty rows still write the empty-axes chart (artifact always exists)
    assert w.chart("plot_empty", [], ["epoch", "loss"]) is not None
    assert (tmp_path / "images" / "plot_empty.png").exists()
    w.close()


def test_render_chart_nan_breaks_line():
    """A NaN sample must leave a visible GAP, not a fabricated segment:
    the broken series draws strictly fewer series-colored pixels than the
    same series with the middle point present."""
    from ganreverser_tpu.io.plots import render_chart, _COLORS
    rows_gap = [[1, 0.0], [2, float("nan")], [3, 0.0]]
    rows_full = [[1, 0.0], [2, 0.0], [3, 0.0]]
    c = np.array(_COLORS[0], np.uint8)

    def series_pixels(rows):
        img = render_chart(rows, ["x", "y"], width=320, height=200)
        return int((img == c).all(axis=-1).sum())

    n_gap, n_full = series_pixels(rows_gap), series_pixels(rows_full)
    assert 0 < n_gap < n_full  # two dots vs a full horizontal line
