"""Adversarial G/D training CLI — train.lua.

Flow (train.lua:103-239): resume or create G+D (auto-loading the
pretrained / g_pretrained warm starts unless --nopretraining), then per
epoch: load fresh random images -> visualization artifacts ->
ADVERSARIAL.train -> checkpoint every saveFreq epochs.

Usage:  python -m ganreverser_tpu.cli.train --dataset synthetic --epochs 3
"""
from __future__ import annotations

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

from .. import io as gio
from .. import models as M
from .. import optim as O
from .. import train as T
from ..core.config import GanConfig
from ..core.prng import noise_inputs, seed_key
from ..io.metrics import MetricsWriter, StepTimer, nan_guard
from . import common


def visualize_progress(writer: MetricsWriter, gen, rate, gs, vis_noise, cfg,
                       epoch: int, train_data):
    """train.lua:268-319: grids of 50 random samples, 50 best and 8 worst by
    D's score, plus a D-sanity ranking with injected non-face patterns.
    ``gen``/``rate`` are jitted ONCE in main — defining them here would
    retrace every epoch."""
    images = gen(gs.g.variables, vis_noise)
    if nan_guard(images):
        print("<trainer> WARNING: generated images contain NaN/Inf "
              "(train.lua:303-305 equivalent)")
    preds = np.asarray(rate(gs.d.variables, images))
    order = np.argsort(-preds, kind="stable")
    rgb = common.to_nhwc_rgb(images, cfg.colorSpace)
    writer.image_grid("samples", rgb[:50], 5, 10, epoch)
    writer.image_grid("best", rgb[order[:50]], 5, 10, epoch)
    writer.image_grid("worst", rgb[order[::-1][:8]], 2, 4, epoch)
    # sanity ranking (train.lua:275-299): a diagonal pattern + one real face
    h, w, c = rgb.shape[1:3] + (images.shape[-1],)
    diag = np.zeros((h, w, c), np.float32)
    idx = np.arange(min(h, w))
    diag[idx, idx] = 1.0
    sanity = np.stack([diag, np.asarray(train_data[0], np.float32)])
    sp = np.asarray(rate(gs.d.variables, jnp.asarray(sanity)))
    writer.scalar("sanity_diag_pred", sp[0], step=epoch)
    writer.scalar("sanity_face_pred", sp[1], step=epoch)


def main(argv=None):
    common.configure_platform()
    cfg = GanConfig.from_args(argv, "adversarial G/D training (train.lua)")
    common.ensure_backend_alive(cfg)
    common.maybe_distributed(cfg)
    dtype = common.compute_dtype(cfg)
    key = seed_key(cfg.seed, getattr(cfg, "prng", "threefry"))
    dataset = common.make_dataset(cfg)
    G, D, dims = common.build_gan_models(cfg, dtype)
    c, h, w = dims

    ckpt_path = gio.adversarial_name(cfg.save)
    epoch = 1
    vis_noise = None

    if cfg.network == "latest" and gio.exists(ckpt_path):
        # resume-from-latest convenience (SURVEY.md §5.3)
        cfg.network = ckpt_path
    elif cfg.network == "latest":
        cfg.network = ""
    plot_data: list = []
    normalize_stats = None  # (mean, std) — dummy 0.5/0.5 (nn_utils.lua:377)
    if cfg.network:
        # resume (train.lua:110-125): restores epoch+1 and the fixed vis noise
        tree, saved_cfg, extra = gio.load_checkpoint(
            os.path.join(cfg.save, cfg.network) if not os.path.isdir(
                cfg.network) else cfg.network)
        gs = common.gan_from_tree(tree)
        epoch = int(extra.get("epoch", 0)) + 1
        vis_noise = jnp.asarray(tree["vis_noise_inputs"])
        # loss-history continuity: plot_data travels in the checkpoint
        # (train.lua:256) — and, improving on the reference (which resets
        # PLOT_DATA on resume, train.lua:203), is restored here
        plot_data = list(extra.get("plot_data", []))
        if cfg.normalize and extra.get("normalize_mean") is not None:
            normalize_stats = (extra["normalize_mean"],
                               extra["normalize_std"])  # train.lua:117-119
        print(f"<trainer> reloaded network, continuing at epoch {epoch}")
    else:
        gs = None
        if not cfg.nopretraining:
            # pretrained G+D via pretrain_with_previous_net (train.lua:127-138)
            pt = gio.pretrained_name(cfg.save, c, h, w, cfg.noiseDim)
            if gio.exists(pt):
                tree, _, _ = gio.load_checkpoint(pt)
                g_opt = O.make_optimizer(cfg.G_optmethod, sgd_lr=cfg.G_sgd_lr,
                                         sgd_momentum=cfg.G_sgd_momentum)
                d_opt = O.make_optimizer(cfg.D_optmethod, sgd_lr=cfg.D_sgd_lr,
                                         sgd_momentum=cfg.D_sgd_momentum)
                gs = T.GanState(
                    g=T.TrainState.create(
                        {"params": tree["G"]["params"],
                         "state": tree["G"]["state"]}, g_opt),
                    d=T.TrainState.create(
                        {"params": tree["D"]["params"],
                         "state": tree["D"]["state"]}, d_opt))
                print(f"<trainer> loaded pretrained G+D from {pt}")
        if gs is None:
            gs = common.init_gan_state(cfg, G, D, dims, key)
            if not cfg.nopretraining:
                # pretrained G decoder via pretrain_g (train.lua:148-157)
                gpt = gio.g_pretrained_name(cfg.G_pretrained_dir, c, h, w,
                                            cfg.noiseDim)
                if gio.exists(gpt):
                    tree, _, _ = gio.load_checkpoint(gpt)
                    g_opt = O.make_optimizer(
                        cfg.G_optmethod, sgd_lr=cfg.G_sgd_lr,
                        sgd_momentum=cfg.G_sgd_momentum)
                    gs = T.GanState(
                        g=T.TrainState.create(
                            {"params": tree["params"],
                             "state": tree["state"]}, g_opt),
                        d=gs.d)
                    print("<trainer> loading pretrained G...")
                else:
                    print("<trainer> Note: Did not find pretrained G")

    n_params_g = M.count_parameters(gs.g.params)
    n_params_d = M.count_parameters(gs.d.params)
    print(f"Number of free parameters in D: {n_params_d}")
    print(f"Number of free parameters in G: {n_params_g}")

    mesh = None
    if cfg.mesh_data != 1 or cfg.mesh_model != 1 or jax.process_count() > 1:
        # dp: batch sharded over 'data'; tp: big kernels over 'model'
        from .. import parallel as par
        mesh = par.make_mesh(data=cfg.mesh_data, model=cfg.mesh_model)
        print(f"<trainer> mesh: {dict(mesh.shape)}")
        gs = common.place_gan_on_mesh(gs, mesh)

    if vis_noise is None:
        vis_noise = noise_inputs(jax.random.fold_in(key, 100), 100,
                                 cfg.noiseDim, cfg.noiseMethod)

    # the whole epoch compiles to ONE program (lax.scan over batches):
    # a single device dispatch per epoch instead of 2+ per batch —
    # preemption consequently checkpoints at epoch granularity
    epoch_program = T.make_epoch_program(
        G, D, batch_size=cfg.batchSize, noise_dim=cfg.noiseDim,
        noise_method=cfg.noiseMethod, n_batches=cfg.N_epoch,
        d_iterations=cfg.D_iterations, g_iterations=cfg.G_iterations,
        d_l1=cfg.D_L1, d_l2=cfg.D_L2, g_l1=cfg.G_L1, g_l2=cfg.G_L2,
        d_clamp=cfg.D_clamp, g_clamp=cfg.G_clamp,
        d_optimizer=O.make_optimizer(cfg.D_optmethod, sgd_lr=cfg.D_sgd_lr,
                                     sgd_momentum=cfg.D_sgd_momentum),
        g_optimizer=O.make_optimizer(cfg.G_optmethod, sgd_lr=cfg.G_sgd_lr,
                                     sgd_momentum=cfg.G_sgd_momentum),
        mesh=mesh)

    writer = MetricsWriter(cfg.save)
    timer = StepTimer(writer, log_every=10, tag="epoch_time")
    guard = gio.PreemptionGuard()  # SIGTERM -> checkpoint + clean exit
    last_saved = None

    @jax.jit
    def vis_gen(gv, z):
        return G.apply(gv, z, train=False)[0]

    @jax.jit
    def vis_rate(dv, images):
        return D.apply(dv, images, train=False)[0].reshape(-1)

    def save(completed_epoch):
        nonlocal last_saved
        last_saved = completed_epoch
        tree = common.gan_to_tree(gs, {"vis_noise_inputs": vis_noise})
        if jax.process_count() > 1:
            # collective: TP-sharded params span non-addressable devices;
            # ALL ranks must enter the gather, then only rank 0 writes
            # (same-path rename race otherwise)
            from .. import parallel as par
            tree = par.gather_replicated(tree, mesh)
            if jax.process_index() != 0:
                return
        # checkpoint schema of train.lua:256: epoch + plot_data (loss
        # history) + normalize_mean/std all travel with the weights
        extra = {"epoch": completed_epoch, "plot_data": plot_data,
                 "normalize_mean": (normalize_stats[0] if normalize_stats
                                    else None),
                 "normalize_std": (normalize_stats[1] if normalize_stats
                                   else None)}
        saver = (gio.save_checkpoint_async if cfg.async_save
                 else gio.save_checkpoint)
        saver(ckpt_path, tree, config=cfg.to_dict(), extra=extra)
        if cfg.keep_history > 0:
            # step-stamped history with keep-N retention (SURVEY.md §5.3)
            saver(f"{ckpt_path}.step{completed_epoch}", tree,
                  config=cfg.to_dict(), extra=extra, backup_old=False)
            if cfg.async_save:
                gio.wait_for_saves()  # step dir must exist for retention
            from ..io.checkpoint import _retain
            _retain(ckpt_path, cfg.keep_history)
        last_saved = completed_epoch
        print(f"<trainer> saving network to {ckpt_path}")

    # background prefetch: the host decodes the NEXT epoch's images while
    # the device trains on the current ones (data/prefetch.py)
    from ..data import prefetch_to_device
    n_load = (cfg.N_epoch * cfg.batchSize // 2) * cfg.D_iterations
    if jax.process_count() > 1:
        # host-local loading: each process decodes only its share of the
        # global batch (per-rank RNG streams, see common.make_dataset);
        # arrays stay on host — the global sharded array is assembled per
        # epoch below, a local device_put would just round-trip HBM
        from .. import parallel as par
        n_local = par.process_slice(n_load)
        data_iter = prefetch_to_device(
            lambda i: dataset.load_random_images(n_local.stop
                                                 - n_local.start), -1,
            host_only=True)
    else:
        # single process: place batches directly in their final sharding
        # from the prefetch thread (device 0 then shard_batch would move
        # the whole epoch twice and peak on one chip). The --normalize
        # path mutates on host afterwards, so it keeps host placement.
        sharding = None
        if mesh is not None and not cfg.normalize:
            from .. import parallel as par
            sharding = par.data_sharding(mesh, 4)
        data_iter = prefetch_to_device(
            lambda i: dataset.load_random_images(n_load), -1,
            sharding=sharding)

    while True:
        # fixed: the reference's inverted --epochs check stops immediately
        # (train.lua:208; SURVEY.md quirk) — here it runs exactly N epochs
        if 0 <= cfg.epochs < epoch:
            print("<trainer> Last epoch reached.")
            if last_saved != epoch - 1:
                save(epoch - 1)
            break
        print(f"<trainer> Loading {n_load} new training images...")
        train_data = next(data_iter)
        if cfg.normalize:
            # [0,1] -> [-1,1] (train.lua:217-218); the stored mean/std are
            # the reference's dummy 0.5/0.5 (nn_utils.lua:377-378). Kept
            # quirk: G's sigmoid output stays in [0,1], so normalized real
            # data is distinguishable by range alone — reference default is
            # off for the same reason. np.array (not asarray): a view of a
            # jax array is read-only and normalize_images writes in place.
            from ..data import normalize_images
            host = np.array(train_data, np.float32)
            normalize_stats = normalize_images(host)
            train_data = jnp.asarray(host)
        if mesh is not None:
            from .. import parallel as par
            if jax.process_count() > 1:
                train_data = par.global_batch_from_local(
                    np.asarray(train_data), mesh)
            else:
                train_data = par.shard_batch(train_data, mesh)

        if not cfg.noplot and jax.process_count() == 1:
            # multi-process: rendering needs host fetches of global arrays;
            # artifacts come from rank-0 checkpoints via the sample CLI
            visualize_progress(writer, vis_gen, vis_rate, gs, vis_noise,
                               cfg, epoch, train_data)

        key, sub = jax.random.split(key)
        from ..io.metrics import profiler_trace
        with profiler_trace(cfg.profile_dir if epoch == 2 else None):
            gs, confusion, (d_losses, g_losses) = epoch_program(
                gs, T.Confusion.zero(), train_data, sub)
        acc = float(confusion.total_valid)
        print(f"<trainer> Epoch #{epoch} [batchSize = {cfg.batchSize}] "
              f"d_loss: {float(d_losses.mean()):.4f} "
              f"g_loss: {float(g_losses.mean()):.4f}")
        print(confusion.render())  # adversarial.lua:199-203
        writer.scalar("d_loss", float(d_losses.mean()), step=epoch)
        writer.scalar("g_loss", float(g_losses.mean()), step=epoch)
        writer.scalar("d_accuracy", acc, step=epoch)
        # loss history carried in the checkpoint (PLOT_DATA, train.lua:256)
        plot_data.append([epoch, float(d_losses.mean()),
                          float(g_losses.mean()), acc])
        if not cfg.noplot:
            # the display loss window, as a PNG artifact (io/plots.py)
            writer.chart("plot_loss", plot_data,
                         ["epoch", "D loss", "G loss", "D acc"],
                         title="Adversarial training")
        timer.tick(epoch)

        if epoch % cfg.saveFreq == 0 or guard.should_stop:
            save(epoch)
        if guard.should_stop:
            break
        epoch += 1
    gio.wait_for_saves()  # join any in-flight async write before exit

if __name__ == "__main__":
    main()
