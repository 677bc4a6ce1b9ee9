"""Offline sampling/eval CLI — sample.lua.

Per run (sample.lua:68-125, repeated ``--runs`` times with run-stamped
filenames like the reference's '%04d' patterns): a grid of 64 training
images, 1024 G samples (saved as 256- and 1024-image grids), the 64
best/worst/random samples by D's score, and optionally (--neighbours) the
L2-nearest training neighbours of the 16 best samples — the reference's
O(16*N_train) host loop (sample.lua:130-148) becomes chunked distance
matmuls on device over the FULL trainset (sample.lua:133 loads everything;
``--neighbours_max`` caps the scan explicitly).

Filenames: with the default --runs 1 the artifacts keep their unstamped
round-1 names (trainset.jpg, samples_256.jpg, ...); with --runs > 1 every
file gets a _NNNN run suffix (samples_256_0002.jpg, ...).
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
    common.ensure_backend_alive(cfg)
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

    def rgb(x):
        return common.to_nhwc_rgb(x, colorspace)

    @jax.jit
    def gen(z):
        return G.apply(g_vars, z, train=False)[0]

    @jax.jit
    def rate(images):
        return D.apply(d_vars, images, train=False)[0].reshape(-1)

    @jax.jit
    def chunk_nearest(best_flat, train_chunk):
        # running-min building block for the full-trainset neighbour scan:
        # distances of the 16 best samples against ONE train chunk
        t = train_chunk.reshape(train_chunk.shape[0], -1).astype(jnp.float32)
        d = (jnp.sum(best_flat * best_flat, 1)[:, None]
             - 2 * best_flat @ t.T + jnp.sum(t * t, 1)[None, :])
        return jnp.min(d, axis=1), jnp.argmin(d, axis=1)

    for run in range(1, cfg.runs + 1):
        def out(name):
            # run-stamped like sample.lua:83-121's '%04d' patterns; the
            # default single run keeps the unstamped round-1 names
            if cfg.runs > 1:
                base, ext = os.path.splitext(name)
                name = f"{base}_{run:04d}{ext}"
            return os.path.join(cfg.writeto, name)

        rkey = jax.random.fold_in(key, run)
        train_imgs = dataset.load_random_images(64)
        save_image(out("trainset.jpg"),
                   images_to_grid(np.asarray(
                       rgb(jnp.asarray(train_imgs))), 8, 8))

        z = noise_inputs(jax.random.fold_in(rkey, 1), 1024, noise_dim,
                         noise_method)
        images = gen(z)
        images_host = rgb(images)
        save_image(out("samples_256.jpg"),
                   images_to_grid(images_host[:256], 16, 16))
        save_image(out("samples_1024.jpg"),
                   images_to_grid(images_host, 32, 32))

        preds = np.asarray(rate(images))
        order = np.argsort(-preds, kind="stable")
        save_image(out("best_64.jpg"),
                   images_to_grid(images_host[order[:64]], 8, 8))
        save_image(out("worst_64.jpg"),
                   images_to_grid(images_host[order[::-1][:64]], 8, 8))
        save_image(out("random_64.jpg"),
                   images_to_grid(images_host[:64], 8, 8))

        if cfg.neighbours:
            # L2 nearest training neighbour for the 16 best samples over
            # the FULL trainset (sample.lua:130-148 / loadImages(0, 1e7)),
            # as chunked device matmuls with a host running min — the
            # trainset never needs to fit in HBM at once
            n_train = dataset.size()
            if cfg.neighbours_max > 0:
                n_train = min(n_train, cfg.neighbours_max)
                if n_train < dataset.size():
                    print(f"[sample] --neighbours_max: scanning "
                          f"{n_train}/{dataset.size()} training images")
            chunk = 2048
            best16 = images[np.asarray(order[:16])]
            best_flat = best16.reshape(16, -1).astype(jnp.float32)
            best_d = np.full((16,), np.inf, np.float32)
            best_img = None
            for start in range(0, n_train, chunk):
                count = min(chunk, n_train - start)
                imgs_np = dataset.load_images(start, count)
                chunk_dev = jnp.asarray(imgs_np)
                if count < chunk and start > 0:
                    # pad to the compiled chunk shape with copies of row 0
                    # (ties break to the true first occurrence in argmin)
                    chunk_dev = jnp.concatenate(
                        [chunk_dev, jnp.tile(chunk_dev[:1],
                                             (chunk - count, 1, 1, 1))])
                v, i = chunk_nearest(best_flat, chunk_dev)
                v, i = np.asarray(v), np.asarray(i)
                # a padded row IS row 0, so an (unlikely) argmin landing on
                # padding must map back to 0 — clamping to count-1 would
                # pair row-0's distance with the wrong image
                i = np.where(i >= count, 0, i)
                better = v < best_d
                if best_img is None:
                    best_img = np.empty((16,) + imgs_np.shape[1:],
                                        imgs_np.dtype)
                best_d[better] = v[better]
                best_img[better] = imgs_np[i[better]]
            tiles = np.concatenate(
                [np.asarray(rgb(best16)),
                 np.asarray(rgb(jnp.asarray(best_img)))])
            save_image(out("neighbours.jpg"), images_to_grid(tiles, 4, 8))
        if cfg.runs > 1:
            print(f"[sample] run {run}/{cfg.runs} done")
    print(f"[sample] artifacts written to {cfg.writeto}/")


if __name__ == "__main__":
    main()
