"""Autoencoder pretrainer CLI — pretrain_g.lua.

Trains G_encoder ∘ G as an autoencoder (MSE reconstruction, adam) on real
images and saves the DECODER ONLY as g_pretrained_<dims>_nd<z>
(pretrain_g.lua:85-89, 148-180, 191-202). train.lua auto-loads that file.

Usage:  python -m ganreverser_tpu.cli.pretrain_g --dataset synthetic --epochs 2
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .. import io as gio
from .. import models as M
from .. import optim as O
from .. import train as T
from ..core.config import PretrainGConfig
from ..core.prng import seed_key
from ..io.metrics import MetricsWriter
from . import common


def main(argv=None):
    common.configure_platform()
    cfg = PretrainGConfig.from_args(argv, "autoencoder G pretraining "
                                          "(pretrain_g.lua)")
    common.ensure_backend_alive(cfg)
    dtype = common.compute_dtype(cfg)
    key = seed_key(cfg.seed)
    dataset = common.make_dataset(cfg)
    dims = cfg.img_dims()
    c, h, w = dims

    enc = M.create_G_encoder(dims, cfg.noiseDim, dtype=dtype)
    dec = M.create_G(dims, cfg.noiseDim, dtype=dtype)
    AE = T.make_autoencoder(enc, dec)
    ae_vars, _ = AE.init(jax.random.fold_in(key, 1), (h, w, c))
    resumed_plot_data: list = []
    if cfg.network:
        # resume the DECODER from a previous g_pretrained checkpoint (the
        # reference declares --network but never reads it,
        # pretrain_g.lua:16 — implemented properly here; the encoder is
        # fresh because the checkpoint stores the decoder only)
        dec_tree, _, net_extra = gio.load_checkpoint(cfg.network)
        ae_vars["params"]["l1"] = dec_tree["params"]
        ae_vars["state"]["l1"] = dec_tree["state"]
        # restore the persisted loss history too — overwriting it with
        # rows restarting at epoch 1 would destroy the saved curve
        resumed_plot_data = list(net_extra.get("plot_data", []))
        print(f"<trainer> resumed decoder from {cfg.network} "
              "(fresh encoder)")
    opt = (O.adagrad() if cfg.G_optmethod == "adagrad" else O.adam())
    ts = T.TrainState.create(ae_vars, opt)
    print(f"Number of free parameters in G (total): "
          f"{M.count_parameters(ts.params)}")

    step = T.make_ae_train_step(AE, g_l1=cfg.G_L1, g_l2=cfg.G_L2,
                                g_clamp=cfg.G_clamp, opt=opt)
    writer = MetricsWriter(cfg.save, name="events_pretrain_g")
    ckpt_path = gio.g_pretrained_name(cfg.save, c, h, w, cfg.noiseDim)
    last_saved = None

    @jax.jit
    def recon(v, x):
        y, _ = AE.apply(v, x, train=False)
        return y

    def save(epoch):
        nonlocal last_saved
        dec_vars = T.decoder_variables(
            {"params": ts.params, "state": ts.state})
        gio.save_checkpoint(ckpt_path, dec_vars, config=cfg.to_dict(),
                            extra={"epoch": epoch + 1,
                                   "plot_data": plot_data})
        last_saved = epoch
        print(f"<trainer> saving network to {ckpt_path}")

    epoch = 1
    # [epoch, loss] rows (PLOT_DATA, pretrain_g.lua:239-244); continues
    # from the checkpoint under --network (new rows offset past the tail —
    # the epoch counter restarts at 1)
    plot_data = resumed_plot_data
    plot_base = int(plot_data[-1][0]) if plot_data else 0
    while True:
        if 0 <= cfg.epochs < epoch:  # fixed inverted check (pretrain_g.lua:112)
            print("<trainer> Last epoch reached.")
            break
        print(f"<trainer> Epoch {epoch}")
        data = dataset.load_random_images(cfg.N_epoch * cfg.batchSize)
        data = jnp.asarray(data)
        if data.shape[0] < cfg.batchSize:
            raise SystemExit(
                f"Dataset holds only {data.shape[0]} images — need at "
                f"least one full batch of {cfg.batchSize}")
        loss = None
        for b in range(cfg.N_epoch):
            batch = data[b * cfg.batchSize:(b + 1) * cfg.batchSize]
            if batch.shape[0] < cfg.batchSize:
                break
            key, sub = jax.random.split(key)
            ts, loss = step(ts, batch, sub)
        print(f"<trainer> last batch loss: {float(loss):.4f}")
        writer.scalar("ae_loss", float(loss), step=epoch)
        plot_data.append([plot_base + epoch, float(loss)])
        if not cfg.noplot:
            # pretrain_g.lua:244's 'G Loss' display window, as a PNG
            writer.chart("plot_g_loss", plot_data, ["epoch", "G Loss"],
                         title="G Loss", subdir="images_pretrain_g")

        if not cfg.noplot:
            sample = data[:32]
            out = recon(ts.variables, sample)
            both = np.concatenate([
                common.to_nhwc_rgb(sample, cfg.colorSpace),
                common.to_nhwc_rgb(out, cfg.colorSpace)])
            writer.image_grid("ae_recon", both, 8, 8, epoch,
                              subdir="images_pretrain_g")
        if epoch % cfg.saveFreq == 0:
            save(epoch)
        epoch += 1
    if last_saved != epoch - 1:
        save(epoch - 1)


if __name__ == "__main__":
    main()
