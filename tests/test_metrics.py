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
