"""Reverser training CLI — train_r.lua.

Loads the frozen G from the adversarial checkpoint (inheriting noiseDim/
noiseMethod/height/width/colorSpace from its embedded config,
train_r.lua:71-75), creates R (``--fixer`` adds the always-on input
dropout), and runs the synthetic-pair loop: z -> G -> R -> MSE(ẑ, z), adam,
periodic loss records, G->R->G preview grid every 25 batches, checkpoint
every saveFreq (default 2000) batches.

Usage:  python -m ganreverser_tpu.cli.train_r --G logs/adversarial --nbBatches 2000
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from .. import io as gio
from .. import models as M
from .. import optim as O
from .. import train as T
from ..core.config import RConfig
from ..core.prng import noise_inputs, seed_key
from ..io.metrics import MetricsWriter, StepTimer
from . import common


def main(argv=None):
    common.configure_platform()
    cfg = RConfig.from_args(argv, "Reverser training (train_r.lua)")
    common.ensure_backend_alive(cfg)
    common.maybe_distributed(cfg)
    dtype = common.compute_dtype(cfg)
    key = seed_key(cfg.seed, getattr(cfg, "prng", "threefry"))

    # load frozen G, inherit geometry from its checkpoint (train_r.lua:66-75)
    g_tree, g_cfg, g_extra = gio.load_checkpoint(cfg.G)
    cfg.noiseDim = g_cfg["noiseDim"]
    cfg.noiseMethod = g_cfg["noiseMethod"]
    cfg.height = g_cfg["height"]
    cfg.width = g_cfg["width"]
    cfg.colorSpace = g_cfg["colorSpace"]
    dims = cfg.img_dims()
    c, h, w = dims

    G = M.create_G(dims, cfg.noiseDim, dtype=dtype)
    g_variables = {"params": g_tree["G"]["params"],
                   "state": g_tree["G"]["state"]}

    dropout_impl = getattr(cfg, "dropout", "threefry")
    if dropout_impl == "kernel" and (cfg.mesh_data != 1
                                     or cfg.mesh_model != 1
                                     or jax.process_count() > 1):
        # the r step meshes via GSPMD sharding constraints (r_loop.py);
        # a pallas_call there has no partitioning rule, so the partitioner
        # would replicate the sharded activation (and correlate masks
        # across shards via the local counter indices) — same tested-path
        # routing rationale as apply_r's mesh+approx case
        print("<trainer> NOTE: --dropout kernel is single-device only; "
              "using threefry masks under --mesh_*/multi-process")
        dropout_impl = "threefry"
    R = M.create_R(dims, cfg.noiseDim, cfg.noiseMethod, fixer=cfg.fixer,
                   dtype=dtype, dropout_impl=dropout_impl)
    cont_plot_data: list = []
    if cfg.cont:
        r_tree, _, cont_extra = gio.load_checkpoint(cfg.cont)
        ts = common.ts_from_tree(r_tree["R"])
        # loss-history continuity across --cont (same improvement as
        # train.py's plot_data restore; the reference saves only {R, opt},
        # train_r.lua:234)
        cont_plot_data = list(cont_extra.get("plot_data", []))
        print(f"<trainer> continuing R from {cfg.cont}")
    else:
        ts = T.create_train_state(R, O.adam(), jax.random.fold_in(key, 2),
                                  (h, w, c))

    print(f"Number of free parameters in G: "
          f"{M.count_parameters(g_variables['params'])}")
    print(f"Number of free parameters in R: {M.count_parameters(ts.params)}")

    mesh = None
    if cfg.mesh_data != 1 or cfg.mesh_model != 1 or jax.process_count() > 1:
        # dp over the synthetic batch + tp over the big kernels
        import dataclasses as _dc
        from .. import parallel as par
        mesh = par.make_mesh(data=cfg.mesh_data, model=cfg.mesh_model)
        print(f"<trainer> mesh: {dict(mesh.shape)}")
        multi = jax.process_count() > 1
        shard = par.shard_params_global if multi else par.shard_params
        repl = (par.replicate_global if multi
                else lambda t, m: par.replicate(t, m))
        g_variables = {"params": shard(g_variables["params"], mesh),
                       "state": repl(g_variables["state"], mesh)}
        ts = _dc.replace(ts,
                         params=shard(ts.params, mesh),
                         state=repl(ts.state, mesh),
                         opt_state=shard(ts.opt_state, mesh),
                         step=repl(ts.step, mesh) if multi else ts.step)

    writer = MetricsWriter(cfg.save, name="events_r")
    timer = StepTimer(writer, log_every=100, tag="r_batch_time")
    guard = gio.PreemptionGuard()  # SIGTERM -> checkpoint + clean exit
    ckpt_path = gio.r_name(cfg.save, c, h, w, cfg.noiseDim, cfg.noiseMethod,
                           cfg.fixer)

    @jax.jit
    def roundtrip(gv, rv, z, rng):
        """G(z) -> R -> G: one compiled program serving both the preview
        grids (imgs, fixed) and the noise-vs-recovered printout (z_hat)."""
        imgs, _ = G.apply(gv, z, train=False)
        if cfg.fixer:
            z_hat, _ = R.apply(rv, imgs, train=False, rng=rng)
        else:
            z_hat, _ = R.apply(rv, imgs, train=False)
        fixed, _ = G.apply(gv, z_hat, train=False)
        return imgs, z_hat, fixed

    def _fmt10(v) -> str:
        return " ".join(f"{float(x):.2f}" for x in np.asarray(v)[:10])

    last_saved = None

    def save():
        nonlocal last_saved
        last_saved = int(ts.step)
        tree = {"R": common.ts_to_tree(ts)}
        if jax.process_count() > 1:
            # collective gather of TP-sharded params, then rank-0-only
            # write (see cli/train.py::save)
            from .. import parallel as par
            tree = par.gather_replicated(tree, mesh)
            if jax.process_index() != 0:
                return
        saver = (gio.save_checkpoint_async if cfg.async_save
                 else gio.save_checkpoint)
        saver(ckpt_path, tree, config=cfg.to_dict(),
              extra={"batch": int(ts.step), "plot_data": plot_data})
        print(f"<trainer> saving network to {ckpt_path}")

    # batches run in SEGMENTS: one jitted lax.scan dispatch (and ONE loss
    # fetch) per run up to the next print/preview/save boundary, instead of
    # a dispatch + scalar fetch per batch (train/r_loop.py)
    segments = {}

    def run_segment(n):
        if n not in segments:
            segments[n] = T.make_r_segment_program(
                G, R, batch_size=cfg.batchSize, noise_dim=cfg.noiseDim,
                noise_method=cfg.noiseMethod, n_batches=n, r_l1=cfg.R_L1,
                r_l2=cfg.R_L2, r_clamp=cfg.R_clamp, mesh=mesh)
        return segments[n]

    cadences = [100, cfg.saveFreq] + ([] if cfg.noplot else [25])

    def next_boundary(i):
        cands = [((i + c - 1) // c) * c for c in cadences if c > 0]
        if cfg.nbBatches >= 0:
            cands.append(cfg.nbBatches)
        return min(c for c in cands if c >= i)

    losses = []
    # [batch, low, avg, high] rows (train_r.lua:192-204); continues from
    # the checkpoint under --cont (new rows offset past the restored tail
    # so the chart's x axis stays monotonic — batch_idx restarts at 1)
    plot_data = cont_plot_data
    plot_base = int(plot_data[-1][0]) if plot_data else 0
    batch_idx = 1
    while True:
        if 0 <= cfg.nbBatches < batch_idx:
            print("<trainer> Last batch reached.")
            if last_saved != int(ts.step):
                save()
            break
        end = next_boundary(batch_idx)
        n_seg = end - batch_idx + 1
        key, sub = jax.random.split(key)
        ts, seg_losses = run_segment(n_seg)(g_variables, ts, sub)
        losses.extend(np.asarray(seg_losses, np.float32).tolist())
        for i in range(batch_idx, end + 1):
            timer.tick(i)
        batch_idx = end

        if batch_idx % 100 == 0:
            lo, avg, hi = (np.min(losses[-100:]), np.mean(losses[-100:]),
                           np.max(losses[-100:]))
            print(f"<trainer> batch {batch_idx} loss "
                  f"low/avg/high: {lo:.4f}/{avg:.4f}/{hi:.4f}")
            if jax.process_count() == 1:
                # side-by-side noise-vs-recovered printout of the first 10
                # components (train_r.lua:178-183)
                z_ex = noise_inputs(jax.random.fold_in(key, 6), 2,
                                    cfg.noiseDim, cfg.noiseMethod)
                _, z_hat, _ = roundtrip(g_variables, ts.variables, z_ex,
                                        jax.random.fold_in(key, 5))
                print("Example:")
                print(f"Noise for G: {_fmt10(z_ex[0])}")
                print(f"Result by R: {_fmt10(z_hat[0])}")
            writer.scalar("r_loss_low", lo, step=batch_idx)
            writer.scalar("r_loss_avg", avg, step=batch_idx)
            writer.scalar("r_loss_high", hi, step=batch_idx)
            plot_data.append([plot_base + batch_idx, float(lo), float(avg),
                              float(hi)])
            if not cfg.noplot:
                # the reference's 'R Loss' display window (train_r.lua:204;
                # its x label says 'epoch' but the value is the batch index
                # — labeled honestly here), rendered to a PNG
                writer.chart("plot_r_loss", plot_data,
                             ["batch", "R loss (low)", "R loss (avg)",
                              "R loss (high)"],
                             title="R Loss", subdir="images_r")
        if (batch_idx % 25 == 0 and not cfg.noplot
                and jax.process_count() == 1):
            # G->R->G round-trip preview grid (train_r.lua:207-218)
            z = noise_inputs(jax.random.fold_in(key, 7), 16, cfg.noiseDim,
                             cfg.noiseMethod)
            imgs, _, fixed = roundtrip(g_variables, ts.variables, z,
                                  jax.random.fold_in(key, 8))
            both = np.concatenate([common.to_nhwc_rgb(imgs, cfg.colorSpace),
                                   common.to_nhwc_rgb(fixed, cfg.colorSpace)])
            writer.image_grid("g_r_g", both, 4, 8, batch_idx,
                              subdir="images_r")
        if batch_idx % cfg.saveFreq == 0 or guard.should_stop:
            save()
        if guard.should_stop:
            break
        batch_idx += 1
    gio.wait_for_saves()  # join any in-flight async write before exit


if __name__ == "__main__":
    main()
