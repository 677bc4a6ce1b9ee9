"""Regression tests for the round-1 code-review findings."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ganreverser_tpu import io as gio
from ganreverser_tpu import models as M
from ganreverser_tpu.data import scan_image_paths
from ganreverser_tpu.ops.kmeans_kernel import kmeans_pallas
from ganreverser_tpu.analysis import kmeans as kmeans_lax


def test_batchnorm_unbiased_running_var(key):
    """torch updates running_var with the UNBIASED batch variance."""
    bn = M.BatchNorm(2)
    v, _ = bn.init(key, (2,))
    x = jnp.asarray([[0.0, 0.0], [2.0, 2.0]])  # n=2: biased var 1, unbiased 2
    _, new_state = bn.apply(v, x, train=True)
    # running_var = 0.9*1 + 0.1*unbiased(2) = 1.1
    np.testing.assert_allclose(np.asarray(new_state["var"]), 1.1, rtol=1e-6)


def test_scan_paths_multi_dir(tmp_path):
    d1 = tmp_path / "a"
    d2 = tmp_path / "b"
    d1.mkdir(), d2.mkdir()
    (d2 / "x.jpg").write_bytes(b"x")
    # empty first dir must raise (it contains nothing)
    with pytest.raises(FileNotFoundError):
        scan_image_paths([str(d1), str(d2)])
    # empty later dir must also raise
    with pytest.raises(FileNotFoundError):
        scan_image_paths([str(d2), str(d1)])
    (d1 / "y.jpg").write_bytes(b"y")
    paths = scan_image_paths([str(d1), str(d2)])
    assert len(paths) == 2


def test_retain_numeric_sort(tmp_path):
    base = str(tmp_path / "ck")
    for step in [9, 10, 11]:
        gio.save_checkpoint(f"{base}.step{step}", {"s": jnp.array([step])})
    gio.save_checkpoint(base, {"s": jnp.array([12])}, keep=2)
    left = sorted(d for d in os.listdir(tmp_path) if ".step" in d)
    assert left == ["ck.step10", "ck.step11"]  # newest kept, step9 gone


def test_kmeans_pallas_padding_exact(key):
    """Padded pallas kmeans == lax kmeans for N not a tile multiple."""
    k1, k2 = jax.random.split(key)
    x = jax.random.normal(k1, (300, 16))  # 300 % 256 != 0
    c_lax, n_lax = kmeans_lax(k2, x, 4, 5)
    c_pal, n_pal = kmeans_pallas(k2, x, 4, 5, tile_n=256, interpret=True)
    np.testing.assert_allclose(np.asarray(n_pal), np.asarray(n_lax))
    np.testing.assert_allclose(np.asarray(c_pal), np.asarray(c_lax),
                               rtol=1e-4, atol=1e-5)
    assert float(jnp.sum(n_pal)) == 300.0  # padding removed from counts


def test_pretrain_g_resume(tmp_path, key):
    """--network resumes the decoder from a g_pretrained checkpoint."""
    from ganreverser_tpu.cli import pretrain_g
    save = str(tmp_path)
    args = ["--save", save, "--epochs", "1", "--N_epoch", "1",
            "--batchSize", "4", "--noiseDim", "8", "--saveFreq", "1",
            "--colorSpace", "y", "--height", "8", "--width", "8",
            "--dataset", "synthetic"]
    pretrain_g.main(args)
    ck = os.path.join(save, "g_pretrained_1x8x8_nd8")
    tree1, _, _ = gio.load_checkpoint(ck)
    # run 2 resumes from run 1's decoder with a DIFFERENT seed: a working
    # --network means tree2 = tree1 + one small adam epoch (max drift
    # ~1e-3); a broken resume would re-init from seed 123 and land far
    # from tree1 (heuristic-init scale ~0.1)
    pretrain_g.main(args + ["--network", ck, "--seed", "123"])
    tree2, _, _ = gio.load_checkpoint(ck)
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(np.max(np.abs(np.asarray(a, np.float32)
                                         - np.asarray(b, np.float32)))),
        tree1["params"], tree2["params"])
    assert max(jax.tree_util.tree_leaves(diffs)) < 0.05, diffs


def test_scan_image_paths_extension_matching(tmp_path):
    """Filter matches the real '.jpg'/'.jpeg'/'.JPG' extension and rejects
    non-extension suffixes like 'thumbsjpg' (round-2 review fix)."""
    from ganreverser_tpu.data.dataset import scan_image_paths
    d = tmp_path / "imgs"
    d.mkdir()
    for name in ("a.jpg", "b.JPG", "c.jpeg", "thumbsjpg", "d.png"):
        (d / name).write_bytes(b"x")
    found = {os.path.basename(p) for p in scan_image_paths([str(d)])}
    assert found == {"a.jpg", "b.JPG", "c.jpeg"}


def test_make_mesh_rejects_oversized_model_axis():
    """model axis > device count errors immediately, not at first use."""
    import pytest
    from ganreverser_tpu import parallel as par
    with pytest.raises(ValueError, match="model axis"):
        par.make_mesh(data=0, model=1024)


def test_resize_batch_preserves_negative_chroma():
    """pretrain_prev's host resize keeps float range (no [0,1] clip /
    uint8 quantization) — YUV chroma is negative (round-2 review fix)."""
    from ganreverser_tpu.cli.pretrain_prev import _resize_batch
    rng = np.random.default_rng(0)
    imgs = rng.uniform(-0.5, 0.5, (2, 8, 8, 3)).astype(np.float32)
    out = _resize_batch(imgs, 16, 16)
    assert out.shape == (2, 16, 16, 3)
    assert out.min() < -0.05  # negative values survive
    # identity when the geometry already matches
    assert _resize_batch(imgs, 8, 8) is imgs
