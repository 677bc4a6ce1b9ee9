"""Shared CLI glue: model construction from configs, state<->checkpoint-tree
conversion, dataset/mesh setup."""
from __future__ import annotations

import os
import sys
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import io as gio
from .. import models as M
from .. import optim as O
from .. import parallel as par
from .. import train as T
from ..core.prng import seed_key
from ..data import Dataset


def configure_platform():
    """Honor GANREVERSER_PLATFORM=cpu|tpu|... — set before any device use.
    Needed because the JAX_PLATFORMS env var loses to the axon TPU plugin's
    registration; the config update is authoritative."""
    plat = os.environ.get("GANREVERSER_PLATFORM")
    if plat:
        jax.config.update("jax_platforms", plat)


BACKEND_PROBE_TIMEOUT_S = 180


def ensure_backend_alive(cfg=None, timeout_s: int = BACKEND_PROBE_TIMEOUT_S):
    """Fail fast when the accelerator plugin is wedged, instead of hanging.

    Three observed tunnel failure modes (bench.py::_resolve_backend): init
    raises, init blocks forever inside the plugin's C++ client, or init
    succeeds and the FIRST DEVICE OP blocks forever. An in-process guard
    cannot catch the blocking modes (signal handlers only run between
    Python bytecodes), so the probe is a killable subprocess running a
    real matmul. Unlike bench (which degrades to CPU and labels the
    output honestly), production CLIs EXIT with an actionable message —
    silently training on a 1-core host is a worse surprise than failing.

    Skipped when the platform is explicitly pinned (GANREVERSER_PLATFORM),
    when GANREVERSER_SKIP_PROBE=1, or in a multi-process run (the
    coordinator handshake has its own timeout and ranks must not race
    subprocess probes against it).
    """
    if (os.environ.get("GANREVERSER_PLATFORM")
            or os.environ.get("GANREVERSER_SKIP_PROBE") == "1"
            or (cfg is not None and getattr(cfg, "coordinator_address", ""))):
        return
    import subprocess
    cmd = ("import jax, jax.numpy as jnp; jax.devices(); "
           "x = jnp.ones((128, 128), jnp.bfloat16); "
           "print('OK', float((x @ x).sum()))")
    try:
        probe = subprocess.run([sys.executable, "-c", cmd],
                               capture_output=True, text=True,
                               timeout=timeout_s)
        if probe.returncode == 0 and probe.stdout.strip().startswith("OK"):
            return
        reason = f"probe rc={probe.returncode}: {probe.stderr.strip()[-200:]}"
    except subprocess.TimeoutExpired:
        reason = f"first device op wedged > {timeout_s}s (probe killed)"
    sys.exit(f"<trainer> accelerator backend is unusable ({reason}).\n"
             "  - retry later (tunnel wedges are usually transient), or\n"
             "  - run on the host CPU: GANREVERSER_PLATFORM=cpu, or\n"
             "  - skip this check: GANREVERSER_SKIP_PROBE=1")


def maybe_distributed(cfg) -> bool:
    """Join the multi-process runtime when --coordinator_address is set
    (must run before any device use; parallel/multihost.py)."""
    started = par.initialize_distributed(
        getattr(cfg, "coordinator_address", ""),
        getattr(cfg, "num_processes", 0),
        getattr(cfg, "process_id", -1))
    if started:
        print(f"<trainer> joined distributed runtime: process "
              f"{jax.process_index()}/{jax.process_count()}, "
              f"{jax.device_count()} global devices")
    return started


def place_gan_on_mesh(gs: T.GanState, mesh) -> T.GanState:
    """TP-shard params/opt state, replicate module state — multi-process
    aware (device_put cannot place onto non-addressable devices)."""
    import dataclasses as _dc
    multi = jax.process_count() > 1
    shard = par.shard_params_global if multi else par.shard_params

    def place(ts):
        return _dc.replace(
            ts,
            params=shard(ts.params, mesh),
            state=(par.replicate_global(ts.state, mesh) if multi
                   else par.replicate(ts.state, mesh)),
            opt_state=shard(ts.opt_state, mesh),
            step=(par.replicate_global(ts.step, mesh) if multi
                  else ts.step))

    return T.GanState(g=place(gs.g), d=place(gs.d))


def compute_dtype(cfg) -> jnp.dtype:
    return {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[
        getattr(cfg, "compute_dtype", "float32")]


def ts_to_tree(ts: T.TrainState) -> dict:
    return {"params": ts.params, "state": ts.state,
            "opt_state": ts.opt_state, "step": ts.step}


def ts_from_tree(tree: dict) -> T.TrainState:
    return T.TrainState(params=tree["params"], state=tree["state"],
                        opt_state=tree["opt_state"],
                        step=jnp.asarray(tree["step"]))


def gan_to_tree(gs: T.GanState, extra_arrays: Optional[dict] = None) -> dict:
    tree = {"G": ts_to_tree(gs.g), "D": ts_to_tree(gs.d)}
    if extra_arrays:
        tree.update(extra_arrays)
    return tree


def gan_from_tree(tree: dict) -> T.GanState:
    return T.GanState(g=ts_from_tree(tree["G"]), d=ts_from_tree(tree["D"]))


def make_dataset(cfg) -> Dataset:
    if cfg.dataset == "NONE":
        sys.exit("--dataset is required (a directory of *.jpg images, or "
                 "'synthetic' for the built-in procedural faces)")
    # multi-process: distinct per-rank RNG streams, otherwise every rank's
    # host-local "slice" of the global batch is the SAME images
    seed = cfg.seed + 7919 * jax.process_index()
    return Dataset([cfg.dataset], height=cfg.height, width=cfg.width,
                   colorspace=cfg.colorSpace, seed=seed,
                   decode_draft=not getattr(cfg, "exact_decode", False),
                   cache_dir=getattr(cfg, "decode_cache", "") or None)


def build_gan_models(cfg, dtype):
    dims = cfg.img_dims()
    init = getattr(cfg, "init", "heuristic")
    G = M.create_G(dims, cfg.noiseDim, dtype=dtype, init=init)
    D = M.create_D(dims, dtype=dtype, init=init)
    return G, D, dims


def init_gan_state(cfg, G, D, dims, key) -> T.GanState:
    c, h, w = dims
    g_opt = O.make_optimizer(cfg.G_optmethod, sgd_lr=cfg.G_sgd_lr,
                             sgd_momentum=cfg.G_sgd_momentum)
    d_opt = O.make_optimizer(cfg.D_optmethod, sgd_lr=cfg.D_sgd_lr,
                             sgd_momentum=cfg.D_sgd_momentum)
    # one jitted program per net: init dispatch-latency matters on the tunnel
    return T.GanState(
        g=T.create_train_state(G, g_opt, jax.random.fold_in(key, 1),
                               (cfg.noiseDim,)),
        d=T.create_train_state(D, d_opt, jax.random.fold_in(key, 2),
                               (h, w, c)))


def to_nhwc_rgb(images, colorspace: str) -> np.ndarray:
    """Device NHWC (any colorspace) -> host RGB for artifact rendering."""
    from ..data import to_rgb
    return to_rgb(np.asarray(jax.device_get(images), np.float32), colorspace)
