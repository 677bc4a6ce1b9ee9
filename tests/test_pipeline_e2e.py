"""End-to-end pipeline integration test (SURVEY.md §4): tiny grayscale
8x8 run of train -> train_r (plain + fixer) -> apply_r -> sample -> show ->
pretrain_g -> pretrain_prev, asserting artifacts exist and metrics are
finite. Everything runs through the real CLI mains on synthetic data."""
import json
import os

import numpy as np
import pytest

pytestmark = pytest.mark.e2e

GEOM = ["--colorSpace", "y", "--height", "8", "--width", "8",
        "--dataset", "synthetic"]


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    return str(tmp_path_factory.mktemp("e2e"))


@pytest.fixture(scope="module")
def trained_gan(workdir):
    from ganreverser_tpu.cli import train
    save = os.path.join(workdir, "logs")
    # --async_save here exercises the background-write path (ordering +
    # exit join) through the real CLI; io semantics unit-tested in
    # tests/test_checkpoint.py::test_async_save
    train.main(["--save", save, "--epochs", "2", "--N_epoch", "2",
                "--batchSize", "8", "--noiseDim", "8", "--saveFreq", "1",
                "--nopretraining", "--async_save"] + GEOM)
    assert os.path.isfile(os.path.join(save, "adversarial", "manifest.json"))
    # the display-analogue loss chart (io/plots.py) is part of the train
    # artifact contract unless --noplot
    assert os.path.isfile(os.path.join(save, "images", "plot_loss.png"))
    return save


def test_full_pipeline(workdir, trained_gan):
    from ganreverser_tpu.cli import train_r, apply_r, sample, show
    save = trained_gan
    g_ckpt = os.path.join(save, "adversarial")

    # --- train R (plain and fixer) on the frozen G ---
    for fixer in ([], ["--fixer"]):
        train_r.main(["--save", save, "--G", g_ckpt, "--nbBatches", "5",
                      "--batchSize", "8", "--saveFreq", "5",
                      "--dataset", "synthetic"] + fixer)
    assert os.path.isfile(os.path.join(
        save, "r_1x8x8_nd8_normal", "manifest.json"))
    assert os.path.isfile(os.path.join(
        save, "r_1x8x8_nd8_normal_fixer", "manifest.json"))

    # --- apply_r full analysis suite + gradient refinement ---
    out = os.path.join(workdir, "apply_out")
    apply_r.main(["--save", save, "--G", g_ckpt, "--writeto", out,
                  "--N", "250", "--clusters", "4", "--kmeans_iters", "3",
                  "--needles", "2", "--anomalies_n", "64",
                  "--batchSize", "32", "--refine_steps", "3"])
    for f in ["variations.jpg", "similar_attributes_01.jpg",
              "similar_pixelwise_02.jpg", "fixed_pairs.jpg",
              "fixed_images_528.jpg", "fixed_images_528_unfixed.jpg",
              "anomalies.jpg"]:
        assert os.path.isfile(os.path.join(out, f)), f
    clusters = [f for f in os.listdir(out) if f.startswith("cluster_")]
    assert len(clusters) >= 1

    # same suite through the Pallas kernels (interpret mode on CPU)
    out_p = os.path.join(workdir, "apply_out_pallas")
    apply_r.main(["--save", save, "--G", g_ckpt, "--writeto", out_p,
                  "--N", "250", "--clusters", "4", "--kmeans_iters", "2",
                  "--needles", "2", "--anomalies_n", "64",
                  "--batchSize", "32", "--pallas"])
    assert os.path.isfile(os.path.join(out_p, "similar_attributes_01.jpg"))

    # the search section via TPU-native approximate k-selection (--approx;
    # exact sort-fallback on CPU, hardware recall measured in benchmarks)
    out_a = os.path.join(workdir, "apply_out_approx")
    apply_r.main(["--save", save, "--G", g_ckpt, "--writeto", out_a,
                  "--N", "250", "--clusters", "4", "--kmeans_iters", "2",
                  "--needles", "2", "--anomalies_n", "64",
                  "--batchSize", "32", "--approx"])
    assert os.path.isfile(os.path.join(out_a, "similar_pixelwise_02.jpg"))

    # the generate+invert stage through the int8 serving path (--int8;
    # quality contract measured on device: tpu_kernel_check e2e_int8)
    out_i = os.path.join(workdir, "apply_out_int8")
    apply_r.main(["--save", save, "--G", g_ckpt, "--writeto", out_i,
                  "--N", "250", "--clusters", "4", "--kmeans_iters", "2",
                  "--needles", "2", "--anomalies_n", "64",
                  "--batchSize", "32", "--int8"])
    assert os.path.isfile(os.path.join(out_i, "similar_attributes_01.jpg"))
    assert os.path.isfile(os.path.join(out_i, "anomalies.jpg"))

    # compile-once serving artifacts (cli/export.py): every program kind
    # exports, reloads, and matches the live program on this backend
    from ganreverser_tpu.cli import export as export_cli
    for what, extra in (("invert", []), ("generate", []),
                        ("e2e", ["--N", "64", "--k", "4"]),
                        ("invert", ["--int8"])):
        out_s = os.path.join(workdir, f"serve_{what}{len(extra)}")
        export_cli.main(["--G", g_ckpt, "--save", save, "--out", out_s,
                        "--what", what, "--batch", "16",
                        "--platforms", "cpu", "--check"] + extra)
        assert os.path.isfile(os.path.join(out_s, "program.stablehlo"))

    # dp+tp training over the 8 virtual devices (--mesh flags)
    from ganreverser_tpu.cli import train
    train.main(["--save", os.path.join(workdir, "mesh_logs"),
                "--epochs", "1", "--N_epoch", "1", "--batchSize", "16",
                "--noiseDim", "8", "--saveFreq", "1", "--nopretraining",
                "--mesh_data", "4", "--mesh_model", "2"] + GEOM)
    assert os.path.isfile(os.path.join(workdir, "mesh_logs", "adversarial",
                                       "manifest.json"))
    train_r.main(["--save", os.path.join(workdir, "mesh_logs"),
                  "--G", os.path.join(workdir, "mesh_logs", "adversarial"),
                  "--nbBatches", "3", "--batchSize", "16", "--saveFreq", "3",
                  "--dataset", "synthetic", "--mesh_data", "8"])

    # sharded large-N path over the 8 virtual devices
    out_m = os.path.join(workdir, "apply_out_mesh")
    apply_r.main(["--save", save, "--G", g_ckpt, "--writeto", out_m,
                  "--N", "256", "--clusters", "4", "--kmeans_iters", "2",
                  "--needles", "2", "--anomalies_n", "64",
                  "--batchSize", "32", "--mesh_data", "8"])
    assert os.path.isfile(os.path.join(out_m, "anomalies.jpg"))

    # --- sample.lua equivalent ---
    sout = os.path.join(workdir, "samples")
    sample.main(["--network", g_ckpt, "--writeto", sout,
                 "--dataset", "synthetic", "--neighbours",
                 "--neighbours_max", "256"])
    for f in ["trainset.jpg", "samples_256.jpg", "samples_1024.jpg",
              "best_64.jpg", "worst_64.jpg", "random_64.jpg",
              "neighbours.jpg"]:
        assert os.path.isfile(os.path.join(sout, f)), f

    # --runs loops the whole artifact set with run-stamped filenames
    # (sample.lua:17,75-121)
    sout2 = os.path.join(workdir, "samples_runs")
    sample.main(["--network", g_ckpt, "--writeto", sout2,
                 "--dataset", "synthetic", "--runs", "2"])
    for run in ("0001", "0002"):
        for f in [f"samples_256_{run}.jpg", f"best_64_{run}.jpg",
                  f"trainset_{run}.jpg"]:
            assert os.path.isfile(os.path.join(sout2, f)), f

    # --- checkpoint inspector ---
    show.main([g_ckpt])

    # --- metrics written and finite ---
    events = os.path.join(save, "events.jsonl")
    assert os.path.isfile(events)
    with open(events) as f:
        records = [json.loads(l) for l in f]
    assert records
    assert all(np.isfinite(r["value"]) for r in records)


def test_train_resume(workdir, trained_gan):
    """--network resume restores epoch+1, the fixed vis noise, AND the loss
    history: plot_data travels in the checkpoint (train.lua:256) and keeps
    accumulating across the resume. Must run before test_pretrainers, which
    overwrites the shared adversarial checkpoint with a different geometry."""
    from ganreverser_tpu.cli import train
    from ganreverser_tpu import io as gio
    save = trained_gan
    ck = os.path.join(save, "adversarial")
    _, cfgd, extra0 = gio.load_checkpoint(ck)
    pd0 = extra0["plot_data"]
    assert len(pd0) == int(extra0["epoch"])  # one row per completed epoch
    train.main(["--save", save, "--network", ck, "--epochs",
                str(int(extra0["epoch"]) + 1), "--N_epoch", "1",
                "--batchSize", "8", "--noiseDim", "8", "--saveFreq", "1",
                "--nopretraining"] + GEOM)
    _, _, extra1 = gio.load_checkpoint(ck)
    assert int(extra1["epoch"]) == int(extra0["epoch"]) + 1
    pd1 = extra1["plot_data"]
    assert pd1[:len(pd0)] == pd0 and len(pd1) == len(pd0) + 1
    assert all(np.isfinite(v) for row in pd1 for v in row)


def test_train_normalize_roundtrip(workdir):
    """--normalize maps training data to [-1,1] and the (dummy 0.5/0.5,
    nn_utils.lua:377-378) mean/std travel in the checkpoint
    (train.lua:256) and are restored on resume (train.lua:117-119)."""
    from ganreverser_tpu.cli import train
    from ganreverser_tpu import io as gio
    save = os.path.join(workdir, "norm_logs")
    train.main(["--save", save, "--epochs", "1", "--N_epoch", "1",
                "--batchSize", "8", "--noiseDim", "8", "--saveFreq", "1",
                "--nopretraining", "--normalize"] + GEOM)
    ck = os.path.join(save, "adversarial")
    _, cfgd, extra = gio.load_checkpoint(ck)
    assert cfgd["normalize"] is True
    assert extra["normalize_mean"] == 0.5 and extra["normalize_std"] == 0.5
    # resume path restores the stats without recomputation
    train.main(["--save", save, "--network", ck, "--epochs", "2",
                "--N_epoch", "1", "--batchSize", "8", "--noiseDim", "8",
                "--saveFreq", "1", "--nopretraining", "--normalize"] + GEOM)
    _, _, extra2 = gio.load_checkpoint(ck)
    assert extra2["normalize_mean"] == 0.5


def test_pretrainers(workdir, trained_gan):
    from ganreverser_tpu.cli import pretrain_g, pretrain_prev, train
    save = trained_gan

    # autoencoder warm start (decoder-only checkpoint)
    pretrain_g.main(["--save", save, "--epochs", "1", "--N_epoch", "2",
                     "--batchSize", "8", "--noiseDim", "8",
                     "--saveFreq", "1"] + GEOM)
    gpt = os.path.join(save, "g_pretrained_1x8x8_nd8")
    assert os.path.isfile(os.path.join(gpt, "manifest.json"))

    # net2net distillation to a larger geometry (8x8 y -> 8x8 rgb, nd 8->12)
    pretrain_prev.main(["--save", save,
                        "--network", os.path.join(save, "adversarial"),
                        "--N_batches", "2", "--batchSize", "8",
                        "--saveFreq", "5", "--noiseDim", "12",
                        "--colorSpace", "rgb", "--height", "8",
                        "--width", "8", "--dataset", "synthetic"])
    pt = os.path.join(save, "pretrained_3x8x8_nd12")
    assert os.path.isfile(os.path.join(pt, "manifest.json"))

    # train.lua auto-loads the pretrained pair (train.lua:127-138)
    train.main(["--save", save, "--epochs", "1", "--N_epoch", "1",
                "--batchSize", "8", "--noiseDim", "12", "--saveFreq", "1",
                "--colorSpace", "rgb", "--height", "8", "--width", "8",
                "--dataset", "synthetic"])


def test_uniform_noise_pipeline(workdir):
    """The uniform-noise mode end to end (train.lua --noiseMethod uniform):
    G trains on U(-1,1) z, R gets the Tanh head (models.lua:452-454), and
    the whole train -> train_r -> apply_r chain holds together. Recovered
    latents must respect the Tanh bound."""
    from ganreverser_tpu.cli import train, train_r, apply_r
    from ganreverser_tpu import io as gio
    save = os.path.join(workdir, "logs_uniform")
    train.main(["--save", save, "--epochs", "1", "--N_epoch", "2",
                "--batchSize", "8", "--noiseDim", "8", "--saveFreq", "1",
                "--noiseMethod", "uniform", "--nopretraining"] + GEOM)
    g_ckpt = os.path.join(save, "adversarial")
    train_r.main(["--save", save, "--G", g_ckpt, "--nbBatches", "5",
                  "--batchSize", "8", "--saveFreq", "5",
                  "--dataset", "synthetic"])
    r_ckpt = os.path.join(save, "r_1x8x8_nd8_uniform")
    assert os.path.isfile(os.path.join(r_ckpt, "manifest.json"))
    # checkpoint carries the inherited noiseMethod (train_r.lua:71-75)
    _, r_cfg, _ = gio.load_checkpoint(r_ckpt)
    assert r_cfg["noiseMethod"] == "uniform"

    out = os.path.join(workdir, "apply_uniform")
    apply_r.main(["--save", save, "--G", g_ckpt, "--writeto", out,
                  "--N", "250", "--clusters", "3", "--kmeans_iters", "2",
                  "--needles", "2", "--anomalies_n", "64",
                  "--batchSize", "32"])
    assert os.path.isfile(os.path.join(out, "variations.jpg"))

    # the Tanh head bounds recovered latents to [-1, 1]
    import jax, jax.numpy as jnp
    from ganreverser_tpu import models as M
    r_tree, _, _ = gio.load_checkpoint(r_ckpt)
    R = M.create_R((1, 8, 8), 8, "uniform")
    rv = {"params": r_tree["R"]["params"], "state": r_tree["R"]["state"]}
    x = jax.random.uniform(jax.random.PRNGKey(0), (4, 8, 8, 1))
    z, _ = R.apply(rv, x, train=False)
    assert float(jnp.max(jnp.abs(z))) <= 1.0
