"""Offline sampling/eval CLI — sample.lua.

Per run (sample.lua:68-125): a grid of 64 training images, 1024 G samples
(saved as 256- and 1024-image grids), the 64 best/worst/random samples by
D's score, and optionally (--neighbours) the L2-nearest training neighbours
of the 16 best samples — the latter as one on-device distance matmul instead
of the reference's O(16*N_train) host loop (sample.lua:130-148).
"""
from __future__ import annotations

import math
import os

import jax
import jax.numpy as jnp
import numpy as np

from .. import io as gio
from .. import models as M
from ..core.config import SampleConfig
from ..core.prng import noise_inputs, seed_key
from ..utils.grids import images_to_grid, save_image
from . import common


def main(argv=None):
    common.configure_platform()
    cfg = SampleConfig.from_args(argv, "offline sampling (sample.lua)")
    dtype = common.compute_dtype(cfg)
    key = seed_key(cfg.seed)
    os.makedirs(cfg.writeto, exist_ok=True)

    tree, g_cfg, _ = gio.load_checkpoint(cfg.network)
    noise_dim = g_cfg["noiseDim"]
    noise_method = g_cfg["noiseMethod"]
    colorspace = g_cfg["colorSpace"]
    h, w = g_cfg["height"], g_cfg["width"]
    c = 1 if colorspace == "y" else 3
    dims = (c, h, w)
    # warn on run-config mismatch like sample.lua:210-217 (the checkpoint's
    # geometry always wins)
    for attr in ("colorSpace", "height", "width"):
        mine = getattr(cfg, attr, None)
        theirs = g_cfg.get(attr)
        if mine not in (None, theirs) and str(mine) != str(theirs):
            print(f"[sample] WARNING: --{attr}={mine} differs from the "
                  f"checkpoint's {attr}={theirs}; using the checkpoint's")

    G = M.create_G(dims, noise_dim, dtype=dtype)
    D = M.create_D(dims, dtype=dtype)
    g_vars = {"params": tree["G"]["params"], "state": tree["G"]["state"]}
    d_vars = {"params": tree["D"]["params"], "state": tree["D"]["state"]}

    cfg.height, cfg.width, cfg.colorSpace = h, w, colorspace
    dataset = common.make_dataset(cfg)
    train_imgs = dataset.load_random_images(64)

    def rgb(x):
        return common.to_nhwc_rgb(x, colorspace)

    save_image(os.path.join(cfg.writeto, "trainset.jpg"),
               images_to_grid(np.asarray(
                   common.to_nhwc_rgb(jnp.asarray(train_imgs), colorspace)),
                   8, 8))

    @jax.jit
    def gen(z):
        return G.apply(g_vars, z, train=False)[0]

    @jax.jit
    def rate(images):
        return D.apply(d_vars, images, train=False)[0].reshape(-1)

    z = noise_inputs(jax.random.fold_in(key, 1), 1024, noise_dim,
                     noise_method)
    images = gen(z)
    images_host = rgb(images)
    save_image(os.path.join(cfg.writeto, "samples_256.jpg"),
               images_to_grid(images_host[:256], 16, 16))
    save_image(os.path.join(cfg.writeto, "samples_1024.jpg"),
               images_to_grid(images_host, 32, 32))

    preds = np.asarray(rate(images))
    order = np.argsort(-preds, kind="stable")
    save_image(os.path.join(cfg.writeto, "best_64.jpg"),
               images_to_grid(images_host[order[:64]], 8, 8))
    save_image(os.path.join(cfg.writeto, "worst_64.jpg"),
               images_to_grid(images_host[order[::-1][:64]], 8, 8))
    save_image(os.path.join(cfg.writeto, "random_64.jpg"),
               images_to_grid(images_host[:64], 8, 8))

    if cfg.neighbours:
        # L2 nearest neighbour in the training set for the 16 best samples,
        # one distance matmul on device (replaces sample.lua:130-148)
        n_train = min(dataset.size(), 4096)
        train_all = jnp.asarray(dataset.load_random_images(n_train))

        @jax.jit
        def nearest(best, train):
            b = best.reshape(best.shape[0], -1).astype(jnp.float32)
            t = train.reshape(train.shape[0], -1).astype(jnp.float32)
            d = (jnp.sum(b * b, 1)[:, None] - 2 * b @ t.T
                 + jnp.sum(t * t, 1)[None, :])
            return jnp.argmin(d, axis=1)

        best16 = images[np.asarray(order[:16])]
        nn_idx = np.asarray(nearest(best16, train_all))
        tiles = np.concatenate([rgb(best16), rgb(train_all[nn_idx])])
        save_image(os.path.join(cfg.writeto, "neighbours.jpg"),
                   images_to_grid(tiles, 4, 8))
    print(f"[sample] artifacts written to {cfg.writeto}/")


if __name__ == "__main__":
    main()
