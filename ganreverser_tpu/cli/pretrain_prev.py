"""Net2net distillation pretrainer CLI — pretrain_with_previous_net.lua.

Loads an old {G, D} pair and trains a fresh G (MSE vs G_prev outputs, shared
leading noise dims copied) and fresh D (BCE vs D_prev's soft predictions on
half-real/half-G_prev batches), handling color-space changes between the old
and new nets. Saves pretrained_<dims>_nd<z> consumed by train.lua:127-138.

Usage:  python -m ganreverser_tpu.cli.pretrain_prev --network logs/adversarial \
            --dataset synthetic --height 64 --width 64 --noiseDim 100
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .. import io as gio
from .. import models as M
from .. import optim as O
from .. import train as T
from ..core.config import PretrainPrevConfig
from ..core.prng import seed_key
from ..data import switch_colorspace
from ..io.metrics import MetricsWriter
from . import common


def _resize_batch(images: np.ndarray, h: int, w: int) -> np.ndarray:
    """Resize NHWC on the host when geometries differ — the C++ (or numpy
    fallback) bilinear path, float32 end-to-end. The previous PIL/uint8
    implementation clipped to [0,1] and quantized through 8-bit images,
    which destroyed negative YUV chroma in cross-colorspace distillation
    targets (U in [-0.436,0.436]) and lost float precision."""
    if images.shape[1] == h and images.shape[2] == w:
        return images
    from ..native import resize_bilinear_batch
    return resize_bilinear_batch(
        np.ascontiguousarray(images, np.float32), h, w)


def main(argv=None):
    common.configure_platform()
    cfg = PretrainPrevConfig.from_args(
        argv, "net2net distillation pretraining "
              "(pretrain_with_previous_net.lua)")
    common.ensure_backend_alive(cfg)
    dtype = common.compute_dtype(cfg)
    key = seed_key(cfg.seed)
    dataset = common.make_dataset(cfg)
    dims = cfg.img_dims()
    c, h, w = dims

    # previous nets + their geometry (pretrain_with_previous_net.lua:94-110)
    prev_tree, prev_cfg, _ = gio.load_checkpoint(cfg.network)
    prev_nd = prev_cfg["noiseDim"]
    prev_method = prev_cfg["noiseMethod"]
    prev_cs = prev_cfg["colorSpace"]
    prev_h, prev_w = prev_cfg["height"], prev_cfg["width"]
    prev_c = 1 if prev_cs == "y" else 3
    prev_dims = (prev_c, prev_h, prev_w)

    G_prev = M.create_G(prev_dims, prev_nd, dtype=dtype)
    D_prev = M.create_D(prev_dims, dtype=dtype)
    gp_vars = {"params": prev_tree["G"]["params"],
               "state": prev_tree["G"]["state"]}
    dp_vars = {"params": prev_tree["D"]["params"],
               "state": prev_tree["D"]["state"]}

    G = M.create_G(dims, cfg.noiseDim, dtype=dtype)
    D = M.create_D(dims, dtype=dtype)
    g_vars, _ = G.init(jax.random.fold_in(key, 1), (cfg.noiseDim,))
    d_vars, _ = D.init(jax.random.fold_in(key, 2), (h, w, c))
    g_ts = T.TrainState.create(g_vars, O.adam())
    d_ts = T.TrainState.create(d_vars, O.adam())

    g_step = T.make_distill_g_step(G, g_l1=cfg.G_L1, g_l2=cfg.G_L2,
                                   g_clamp=cfg.G_clamp)
    d_step = T.make_distill_d_step(D, d_l1=cfg.D_L1, d_l2=cfg.D_L2,
                                   d_clamp=cfg.D_clamp)

    @jax.jit
    def g_prev_fwd(z):
        return G_prev.apply(gp_vars, z, train=False)[0]

    @jax.jit
    def d_prev_fwd(x):
        return D_prev.apply(dp_vars, x, train=False)[0].reshape(-1)

    writer = MetricsWriter(cfg.save, name="events_pretrain_prev")
    ckpt_path = gio.pretrained_name(cfg.save, c, h, w, cfg.noiseDim)

    def save():
        tree = {"G": common.ts_to_tree(g_ts), "D": common.ts_to_tree(d_ts)}
        gio.save_checkpoint(ckpt_path, tree, config=cfg.to_dict(),
                            extra={"batches": int(g_ts.step)})
        print(f"<trainer> saving network to {ckpt_path}")

    half = cfg.batchSize // 2
    for i in range(1, cfg.N_batches + 1):
        key, k_noise, k_g, k_d = jax.random.split(key, 4)
        prev_z, new_z = T.paired_noise(k_noise, cfg.batchSize, cfg.noiseDim,
                                       cfg.noiseMethod, prev_nd, prev_method)
        # G_prev outputs -> new geometry/colorspace (host hop for the
        # colorspace/resize conversion, lua:167)
        gp_imgs = np.asarray(jax.device_get(g_prev_fwd(prev_z)), np.float32)
        gp_imgs = switch_colorspace(gp_imgs, prev_cs, cfg.colorSpace)
        gp_imgs = _resize_batch(gp_imgs, h, w)
        g_ts, g_loss = g_step(g_ts, new_z, jnp.asarray(gp_imgs), k_g)

        # D distillation batch: half real, half G_prev images (lua:161-183)
        real = dataset.load_random_images(half)
        d_inputs = np.concatenate([real, gp_imgs[:half]])
        # D_prev sees its own colorspace/geometry (lua:182)
        d_prev_in = _resize_batch(
            switch_colorspace(d_inputs, cfg.colorSpace, prev_cs),
            prev_h, prev_w)
        soft = d_prev_fwd(jnp.asarray(d_prev_in))
        d_ts, d_loss = d_step(d_ts, jnp.asarray(d_inputs), soft, k_d)

        if i % 10 == 0:
            print(f"<batch {i} of {cfg.N_batches}> loss G: "
                  f"{float(g_loss):.4f}, loss D: {float(d_loss):.4f}")
            writer.scalar("distill_g_loss", float(g_loss), step=i)
            writer.scalar("distill_d_loss", float(d_loss), step=i)
        if i % cfg.saveFreq == 0:
            save()
    save()


if __name__ == "__main__":
    main()
