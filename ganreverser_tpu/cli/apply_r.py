"""Inversion/analysis suite CLI — apply_r.lua.

Produces the reference's artifact set (apply_r.lua:111-192):
  variations.jpg                      ① latent-component sweep
  cluster_NN.jpg                      ③ kmeans-20 clusters (top-71 + average)
  similar_attributes_NN.jpg           ④ cosine top-k on recovered latents
  similar_pixelwise_NN.jpg            ④ cosine top-k on raw pixels
  fixed_pairs.jpg / fixed_images_*.jpg⑤ G∘R fixing
  anomalies.jpg                       ⑥ euclidean-threshold anomaly detection
plus (new) gradient-based latent refinement via --refine_steps.

All O(N) compute runs on device; only grid assembly happens on the host.

Usage: python -m ganreverser_tpu.cli.apply_r --G logs/adversarial --N 10000
"""
from __future__ import annotations

import math
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

from .. import analysis as A
from .. import io as gio
from .. import models as M
from ..core.config import ApplyConfig
from ..core.prng import seed_key
from ..utils.grids import BLUE, RED, add_border, images_to_grid, save_image
from . import common


def _square_grid(images_rgb: np.ndarray):
    n = images_rgb.shape[0]
    side = math.ceil(math.sqrt(n))
    return images_to_grid(images_rgb, math.ceil(n / side), side)


def main(argv=None):
    common.configure_platform()
    cfg = ApplyConfig.from_args(argv, "inversion/analysis suite (apply_r.lua)")
    common.ensure_backend_alive(cfg)
    dtype = common.compute_dtype(cfg)
    key = seed_key(cfg.seed)
    os.makedirs(cfg.writeto, exist_ok=True)
    if cfg.N < cfg.needles * 100:
        sys.exit(f"--needles {cfg.needles} requires --N >= "
                 f"{cfg.needles * 100} (needle indices are (i+1)*100-1, "
                 "apply_r.lua:272)")

    # --- load G (inherit geometry) + R + R_fixer (apply_r.lua:59-109) ---
    g_tree, g_cfg, _ = gio.load_checkpoint(cfg.G)
    noise_dim = g_cfg["noiseDim"]
    noise_method = g_cfg["noiseMethod"]
    colorspace = g_cfg["colorSpace"]
    h, w = g_cfg["height"], g_cfg["width"]
    c = 1 if colorspace == "y" else 3
    dims = (c, h, w)

    G = M.create_G(dims, noise_dim, dtype=dtype)
    g_vars = {"params": g_tree["G"]["params"], "state": g_tree["G"]["state"]}

    r_path = cfg.R or gio.r_name(cfg.save, c, h, w, noise_dim, noise_method,
                                 False)
    rf_path = cfg.R_fixer or gio.r_name(cfg.save, c, h, w, noise_dim,
                                        noise_method, True)
    R = M.create_R(dims, noise_dim, noise_method, fixer=False, dtype=dtype)
    r_tree, _, _ = gio.load_checkpoint(r_path)
    r_vars = {"params": r_tree["R"]["params"], "state": r_tree["R"]["state"]}

    R_fixer = rf_vars = None
    if gio.exists(rf_path):
        R_fixer = M.create_R(dims, noise_dim, noise_method, fixer=True,
                             dtype=dtype)
        rf_tree, _, _ = gio.load_checkpoint(rf_path)
        rf_vars = {"params": rf_tree["R"]["params"],
                   "state": rf_tree["R"]["state"]}
    else:
        print(f"[apply_r] no fixer checkpoint at {rf_path}; "
              "using plain R for fixing/anomalies")

    def rgb(x):
        return common.to_nhwc_rgb(x, colorspace)

    # --- ① variation sweep (apply_r.lua:115-138) ---
    print("Varying components...")
    nb_steps = 16
    variations = A.variation_sweep(
        G, g_vars, noise_dim=noise_dim, noise_method=noise_method,
        key=jax.random.fold_in(key, 1), nb_steps=nb_steps,
        batch_size=cfg.batchSize)
    save_image(os.path.join(cfg.writeto, "variations.jpg"),
               images_to_grid(rgb(variations), noise_dim, nb_steps))

    # --- ② generate N + invert (apply_r.lua:143-153) ---
    print("Generating images...")
    # Pallas kernels have no SPMD partitioning rule — under a mesh the
    # analysis sections stay on the (sharding-aware) lax paths
    use_mesh = cfg.mesh_data > 1 or cfg.mesh_model > 1
    use_pallas_kernels = cfg.pallas and not use_mesh
    mesh = None
    if cfg.pallas and use_mesh:
        print("[apply_r] note: the entire --pallas fast path (fused G "
              "decoder AND the kmeans/top-k kernels) is bypassed under "
              "--mesh_data/--mesh_model>1 — sharded arrays use the "
              "lax/module paths", file=sys.stderr)
    if cfg.int8 and use_mesh:
        print("[apply_r] note: --int8 is bypassed under "
              "--mesh_data/--mesh_model>1 — sharded arrays use the "
              "lax/module paths", file=sys.stderr)
    if use_mesh:
        # N axis sharded over 'data' (SURVEY.md §5.7); with --mesh_model>1
        # the big Dense kernels (G's z->feature-map Linear, R's head) are
        # additionally TP-sharded over 'model' — the 128x128/z=256 workload
        # of BASELINE config 5 (SURVEY.md §7 step 6); XLA inserts the ICI
        # collectives from the parameter shardings
        from .. import parallel as par
        mesh = par.make_mesh(data=cfg.mesh_data, model=cfg.mesh_model)

        def place(v):
            if cfg.mesh_model > 1:
                return {"params": par.shard_params(v["params"], mesh),
                        "state": par.replicate(v["state"], mesh)}
            return par.replicate(v, mesh)

        g_vars = place(g_vars)
        r_vars = place(r_vars)
        noise, images, attributes = A.distributed_generate_and_invert(
            G, R, g_vars, r_vars, n=cfg.N, noise_dim=noise_dim,
            noise_method=noise_method, key=jax.random.fold_in(key, 2),
            mesh=mesh)
        if R_fixer is not None:
            rf_vars = place(rf_vars)

            @jax.jit
            def rf_fwd(v, x):
                y, _ = R_fixer.apply(v, x, train=False,
                                     rng=jax.random.fold_in(key, 5))
                return y
            attributes_fixer = rf_fwd(rf_vars, images)
        else:
            attributes_fixer = attributes
    elif cfg.int8:
        # EXPERIMENTAL int8 serving path (ops/quant.py): per-channel
        # symmetric int8 weights with BN folded + dynamic per-tensor int8
        # activations, int32 accumulation, on the measured-winner
        # formulations (lhs-dilated G, per-layer-conv R). Approximates the
        # bf16 rankings — the composed-pipeline recall gate is
        # benchmarks/tpu_kernel_check.py e2e_int8. The fixer-R keeps the
        # module path (its always-on dropout needs an rng).
        from ..core.prng import noise_inputs
        from ..models.fastpath import (make_fast_generator_xla_int8,
                                       make_fast_inverter_int8)
        batch = max(cfg.batchSize, 256)
        fastgen = make_fast_generator_xla_int8(dims, noise_dim, dtype=dtype)
        fastinv = make_fast_inverter_int8(dims, noise_dim, noise_method,
                                          dtype=dtype)
        noise = noise_inputs(jax.random.fold_in(key, 2), cfg.N, noise_dim,
                             noise_method)
        images = jax.jit(lambda v, z: A.forward_batched(
            lambda b: fastgen(v, b), z, batch))(g_vars, noise)
        attributes = jax.jit(lambda v, x: A.forward_batched(
            lambda b: fastinv(v, b), x, batch))(r_vars, images)
        if R_fixer is not None:
            @jax.jit
            def rf_fwd(v, x):
                return A.forward_batched(
                    lambda b: R_fixer.apply(
                        v, b, train=False,
                        rng=jax.random.fold_in(key, 5))[0], x, batch)
            attributes_fixer = rf_fwd(rf_vars, images)
        else:
            attributes_fixer = attributes
    elif cfg.pallas:
        # measured-fastest fused paths (models/fastpath.py) on the standard
        # checkpoint pytrees: G via the pure-XLA folded-BN + lhs-dilated
        # decoder (2.34x the module path on v5e; it also beat the Pallas
        # phase kernel 53.7k vs 37.9k img/s — RESULTS.md round 2). R keeps
        # the module path — XLA's conv pipeline measured 3x faster than the
        # fused conv-block kernel there (71.4k vs 24.1k img/s). The fixer
        # also keeps the module path (its always-on dropout needs an rng)
        if jax.default_backend() != "tpu":
            print("[apply_r] note: --pallas off-TPU interprets the "
                  "kmeans/top-k kernels (slow for large N)", file=sys.stderr)
        from ..core.prng import noise_inputs
        from ..models.fastpath import make_fast_generator_xla
        batch = max(cfg.batchSize, 256)
        fastgen = make_fast_generator_xla(dims, noise_dim, dtype=dtype)
        fastinv = jax.jit(lambda v, b: R.apply(v, b, train=False)[0])
        noise = noise_inputs(jax.random.fold_in(key, 2), cfg.N, noise_dim,
                             noise_method)
        images = jax.jit(lambda v, z: A.forward_batched(
            lambda b: fastgen(v, b), z, batch))(g_vars, noise)
        attributes = jax.jit(lambda v, x: A.forward_batched(
            lambda b: fastinv(v, b), x, batch))(r_vars, images)
        if R_fixer is not None:
            @jax.jit
            def rf_fwd(v, x):
                return A.forward_batched(
                    lambda b: R_fixer.apply(
                        v, b, train=False,
                        rng=jax.random.fold_in(key, 5))[0], x, batch)
            attributes_fixer = rf_fwd(rf_vars, images)
        else:
            attributes_fixer = attributes
    else:
        out = A.generate_and_invert(
            G, R, g_vars, r_vars, n=cfg.N, noise_dim=noise_dim,
            noise_method=noise_method, key=jax.random.fold_in(key, 2),
            batch_size=max(cfg.batchSize, 256),
            r_fixer_variables=rf_vars, R_fixer=R_fixer)
        if R_fixer is not None:
            noise, images, attributes, attributes_fixer = out
        else:
            noise, images, attributes = out
            attributes_fixer = attributes

    # --- optional: gradient-based latent refinement (new) ---
    if cfg.refine_steps > 0:
        print(f"Refining latents ({cfg.refine_steps} adam steps on z)...")
        refine = A.make_refiner(G, steps=cfg.refine_steps, lr=cfg.refine_lr)
        fixer_was_alias = attributes_fixer is attributes
        attributes, final_loss = refine(g_vars, images, attributes)
        if fixer_was_alias:
            # no fixer-R: downstream fixing/anomalies follow the refined
            # latents (previously the alias was bound pre-refinement, so
            # --refine_steps silently never reached those pipelines)
            attributes_fixer = attributes
        print(f"  final pixel MSE: {float(jnp.mean(final_loss)):.6f}")

    # --- ③ clustering (apply_r.lua:158-163, 197-260) ---
    print("Clustering...")
    if use_pallas_kernels:
        from ..ops.kmeans_kernel import kmeans_pallas
        centroids, counts = kmeans_pallas(
            jax.random.fold_in(key, 3), attributes, cfg.clusters,
            cfg.kmeans_iters)  # exact padding handled inside
    else:
        centroids, counts = A.kmeans(jax.random.fold_in(key, 3), attributes,
                                     cfg.clusters, cfg.kmeans_iters)
    assign, sims = A.assign_min_cosine(attributes, centroids)
    images_host = rgb(images)
    for ci in range(cfg.clusters):
        members = A.cluster_members(assign, sims, ci, 64 + 7)
        if len(members) == 0:
            continue
        cluster_imgs = images_host[members]
        avg = cluster_imgs.mean(axis=0, keepdims=True)
        tile = np.concatenate([avg, cluster_imgs])
        save_image(os.path.join(cfg.writeto, f"cluster_{ci + 1:02d}.jpg"),
                   _square_grid(tile))

    # --- ④ similarity search (apply_r.lua:169-172, 265-318) ---
    print("Finding faces by similarity...")
    needles = jnp.array([(i + 1) * 100 - 1 for i in range(cfg.needles)])
    if use_mesh and cfg.approx:
        # approx + mesh goes through the tested shard_map collective merge
        # (analysis/distributed.py) — ApproxTopK under plain-GSPMD
        # partitioning is an unvalidated combination on hardware; the
        # shard_map path keeps the op on per-shard full-replica scores
        attr_topk = A.distributed_cosine_topk(
            attributes, needles, 100, mesh, approx=True,
            recall_target=cfg.recall_target)
        pix_topk = A.distributed_cosine_topk(
            images.reshape(images.shape[0], -1), needles, 100, mesh,
            approx=True, recall_target=cfg.recall_target)
    elif use_pallas_kernels and not cfg.approx:
        from ..ops.topk_kernel import cosine_topk_pallas
        attr_topk = cosine_topk_pallas(attributes, needles, 100)
        pix_topk = cosine_topk_pallas(
            images.reshape(images.shape[0], -1), needles, 100)
    else:
        # --approx: TPU-native approximate k-selection on both measures
        # (opt-in; the kernels above are exact, so approx wins the branch)
        attr_topk = A.cosine_topk(attributes, needles, 100, cfg.approx,
                                  cfg.recall_target)
        pix_topk = A.pixel_cosine_topk(images, needles, 100, cfg.approx,
                                       cfg.recall_target)
    for tag, (scores, idx) in (("attributes", attr_topk),
                               ("pixelwise", pix_topk)):
        idx = np.asarray(idx)
        for i in range(cfg.needles):
            tiles = images_host[idx[i]]
            tiles[0] = add_border(tiles[0], BLUE)
            save_image(os.path.join(cfg.writeto,
                                    f"similar_{tag}_{i + 1:02d}.jpg"),
                       _square_grid(tiles))

    # --- ⑤ fixing (apply_r.lua:179-182, 324-352) ---
    print("Fixing faces...")
    nb_pairs, nb_fixed = 52, 512 + 16
    fixed = A.fix_images(G, g_vars, attributes_fixer,
                         batch_size=max(cfg.batchSize, 256))
    fixed_host = rgb(fixed)
    pairs = np.concatenate([
        np.concatenate([images_host[i], fixed_host[i]], axis=1)[None]
        for i in range(min(nb_pairs, cfg.N))])
    save_image(os.path.join(cfg.writeto, "fixed_pairs.jpg"),
               images_to_grid(pairs, math.ceil(len(pairs) / 4), 4))
    n_show = min(nb_fixed, cfg.N)
    side = int(math.sqrt(n_show))
    save_image(os.path.join(cfg.writeto,
                            f"fixed_images_{nb_fixed}_unfixed.jpg"),
               images_to_grid(images_host[:n_show],
                              math.ceil(n_show / side), side))
    save_image(os.path.join(cfg.writeto, f"fixed_images_{nb_fixed}.jpg"),
               images_to_grid(fixed_host[:n_show],
                              math.ceil(n_show / side), side))

    # --- ⑥ anomaly detection (apply_r.lua:187-191, 355-390) ---
    print("Detecting anomalies...")
    n_calc = min(cfg.anomalies_n, cfg.N)
    scores, thr, is_anomaly = A.detect_anomalies(
        images[:n_calc], fixed[:n_calc], cfg.anomalies_quantile)
    is_anomaly = np.asarray(is_anomaly)
    n_show = min(512 + 16, n_calc)
    tiles = np.array(images_host[:n_show], copy=True)
    for i in range(n_show):
        if is_anomaly[i]:
            tiles[i] = add_border(tiles[i], RED)
    side = int(math.sqrt(n_show))
    save_image(os.path.join(cfg.writeto, "anomalies.jpg"),
               images_to_grid(tiles, math.ceil(n_show / side), side))
    print(f"[apply_r] threshold={float(thr):.4f} "
          f"anomalies={int(is_anomaly.sum())}/{n_calc}; artifacts in "
          f"{cfg.writeto}/")

    # run stats into the metrics log (observability parity, SURVEY.md §5.5)
    from ..io.metrics import MetricsWriter
    writer = MetricsWriter(cfg.writeto, name="apply_r_stats")
    writer.scalar("n_inverted", cfg.N)
    writer.scalar("anomaly_threshold", float(thr))
    writer.scalar("anomaly_count", int(is_anomaly.sum()))
    cluster_sizes = np.bincount(np.asarray(assign), minlength=cfg.clusters)
    for ci, size in enumerate(cluster_sizes):
        writer.scalar("cluster_size", int(size), step=ci)
    writer.close()


if __name__ == "__main__":
    main()
