"""Checkpoint round-trip: params + optimizer state + config + epoch survive;
.old backup semantics (train.lua:250-252); §3.6 filename conventions."""
import os

import jax
import jax.numpy as jnp
import numpy as np

from ganreverser_tpu import io as gio
from ganreverser_tpu import models as M
from ganreverser_tpu import optim as O
from ganreverser_tpu import train as T
from ganreverser_tpu.core.config import RConfig


def _tree_equal(a, b):
    fa = jax.tree_util.tree_leaves(a)
    fb = jax.tree_util.tree_leaves(b)
    return len(fa) == len(fb) and all(
        np.allclose(np.asarray(x), np.asarray(y)) for x, y in zip(fa, fb))


def test_roundtrip(tmp_path, key):
    R = M.create_R((1, 8, 8), 8, "normal")
    variables, _ = R.init(key, (8, 8, 1))
    ts = T.TrainState.create(variables, O.adam())
    tree = {"params": ts.params, "state": ts.state,
            "opt_state": ts.opt_state, "step": ts.step}
    cfg = RConfig(noiseDim=8, height=8, width=8)
    path = str(tmp_path / "ckpt")
    gio.save_checkpoint(path, tree, config=cfg.to_dict(),
                        extra={"epoch": 7})
    tree2, cfg2, extra = gio.load_checkpoint(path)
    assert _tree_equal(tree, tree2)
    assert cfg2["noiseDim"] == 8
    assert extra["epoch"] == 7
    # config round-trips through the dataclass (checkpoint carries opt,
    # §3.6 contract)
    rc = RConfig.from_dict(cfg2)
    assert rc.height == 8


def test_old_backup(tmp_path):
    path = str(tmp_path / "adversarial")
    gio.save_checkpoint(path, {"x": jnp.array([1.0])}, extra={"v": 1})
    gio.save_checkpoint(path, {"x": jnp.array([2.0])}, extra={"v": 2})
    assert os.path.isdir(path + ".old")
    _, _, e_old = gio.load_checkpoint(path + ".old")
    _, _, e_new = gio.load_checkpoint(path)
    assert e_old["v"] == 1 and e_new["v"] == 2


def test_filenames():
    assert gio.r_name("logs", 3, 32, 32, 32, "normal", False).endswith(
        "r_3x32x32_nd32_normal")
    assert gio.r_name("logs", 1, 16, 16, 8, "uniform", True).endswith(
        "r_1x16x16_nd8_uniform_fixer")
    assert gio.g_pretrained_name("logs", 3, 32, 32, 100).endswith(
        "g_pretrained_3x32x32_nd100")
    assert gio.pretrained_name("logs", 3, 32, 32, 100).endswith(
        "pretrained_3x32x32_nd100")


def test_tuple_and_scalar_leaves(tmp_path):
    tree = {"t": (jnp.zeros((2,)), {"n": 3}), "s": "hello", "f": 1.5,
            "none": None, "lst": [jnp.ones((1,)), 2]}
    path = str(tmp_path / "misc")
    gio.save_checkpoint(path, tree)
    tree2, _, _ = gio.load_checkpoint(path)
    assert isinstance(tree2["t"], tuple)
    assert tree2["t"][1]["n"] == 3
    assert tree2["s"] == "hello" and tree2["f"] == 1.5
    assert tree2["none"] is None
    assert np.allclose(tree2["lst"][0], 1.0) and tree2["lst"][1] == 2


def test_async_save(tmp_path):
    """save_checkpoint_async: round-trip parity, serialized ordering
    (.old backup holds the previous async save's content), and error
    propagation through wait_for_saves()."""
    import pytest

    path = str(tmp_path / "ckpt_async")
    t1 = {"w": np.arange(4, dtype=np.float32)}
    t2 = {"w": np.arange(4, dtype=np.float32) * 10}
    gio.save_checkpoint_async(path, t1, extra={"gen": 1})
    gio.save_checkpoint_async(path, t2, extra={"gen": 2})  # joins the first
    gio.wait_for_saves()

    tree, _, extra = gio.load_checkpoint(path)
    assert extra["gen"] == 2 and _tree_equal(tree, t2)
    old_tree, _, old_extra = gio.load_checkpoint(path + ".old")
    assert old_extra["gen"] == 1 and _tree_equal(old_tree, t1)

    # a failing background write surfaces on the next join, then clears
    # (parent is a regular FILE -> the worker's makedirs raises; chmod
    # tricks don't work here because tests run as root)
    blocker = tmp_path / "afile"
    blocker.write_text("not a directory")
    bad = str(blocker / "ckpt")
    gio.save_checkpoint_async(bad, t1)
    with pytest.raises((NotADirectoryError, FileExistsError)):
        gio.wait_for_saves()
    gio.wait_for_saves()  # error consumed; subsequent joins are clean


def test_show_plot_renders_history(tmp_path, capsys):
    """show --plot renders the checkpoint's persisted plot_data; without
    history it degrades gracefully."""
    from ganreverser_tpu.io.checkpoint import save_checkpoint
    from ganreverser_tpu.cli import show
    ck = str(tmp_path / "ck")
    save_checkpoint(ck, {"R": {"params": {}, "state": {}}},
                    config={}, extra={"plot_data": [[1, 0.9], [2, 0.4]]})
    out_png = str(tmp_path / "h.png")
    show.main([ck, "--plot", out_png])
    assert (tmp_path / "h.png").exists()
    assert "<2 rows>" in capsys.readouterr().out

    ck2 = str(tmp_path / "ck2")
    save_checkpoint(ck2, {"R": {"params": {}, "state": {}}}, config={})
    show.main([ck2, "--plot", str(tmp_path / "none.png")])
    assert not (tmp_path / "none.png").exists()
    assert "nothing to plot" in capsys.readouterr().out


def test_roundtrip_tricky_pytrees(tmp_path):
    """Encoder/decoder edge shapes: nested tuples (decoded as tuples, not
    lists), None, bools, ints/floats, 0-d and bool arrays, empty dicts,
    mixed lists — the structures optimizer states actually contain."""
    tree = {
        "t": (np.float32(1.5) * np.ones((2, 3)), (np.arange(4), None)),
        "scalars": {"b": True, "i": 7, "f": 0.25, "s": "adam", "n": None},
        "zero_d": np.array(3.0, np.float32),
        "bool_arr": np.array([True, False]),
        "empty": {},
        "mixed_list": [np.ones((1,)), {"x": (np.zeros((2,)),)}],
        "i64": np.array([1, 2], np.int64),
    }
    path = str(tmp_path / "ck")
    gio.save_checkpoint(path, tree)
    out, _, _ = gio.load_checkpoint(path)
    assert isinstance(out["t"], tuple) and isinstance(out["t"][1], tuple)
    assert out["t"][1][1] is None
    assert out["scalars"] == tree["scalars"]
    assert out["empty"] == {}
    assert isinstance(out["mixed_list"], list)
    assert out["bool_arr"].dtype == np.bool_
    assert out["i64"].dtype == np.int64
    np.testing.assert_array_equal(out["zero_d"], tree["zero_d"])
    np.testing.assert_array_equal(out["t"][0], tree["t"][0])
    np.testing.assert_array_equal(out["mixed_list"][1]["x"][0],
                                  np.zeros((2,)))
