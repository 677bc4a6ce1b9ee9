"""Training-step ablations — where do the non-MXU milliseconds go?

The round-3 roofline put d_step/g_step at 45-46% MFU (benchmarks/
roofline.py, logs/tpu_r03_roofline_*). This isolates the usual TPU
suspects by timing VARIANTS of the d_step scan (same harness as
roofline.py) with one ingredient removed at a time:

  full        the production d_step (baseline, = roofline_d)
  nodrop      D applied in eval mode (no dropout masks, no threefry bits)
              inside an otherwise identical training step — isolates the
              RNG+mask cost of D2's five dropout sites
  nobn_stats  G's fake-half forward in eval mode (frozen BN stats) —
              isolates the training-mode BN batch-stat reductions in G
  noadam      loss+grads only, no optimizer update — isolates adam's
              elementwise pass over 6.4M params
  g_nodrop    g_step with D in eval mode (G has no dropout; D's masks are
              the only RNG in the G step)

Each variant changes the MATH (documented above) — they are measurement
probes, not production options. One JSON line each.

Additional probes for the R step (the 21.7%-MFU outlier) and the PRNG:

  r_full      production r_step (== roofline_r)
  r_nodrop    same R architecture with every Dropout swapped for Identity
              at the SAME positions (positional param keys preserved) —
              isolates dropout mask generation + apply in fwd AND bwd
  r_rbg       production r_step driven by an 'rbg' PRNG key — TPU's
              native fast RNG instead of threefry, same program
  r_kernel    production r_step with R built dropout_impl='kernel' — the
              in-kernel counter-hash Pallas dropout (the train_r
              --dropout kernel product option)
  dg_rbg      the d+g scan with an rbg key

Usage: python benchmarks/train_ablate.py [--cpu] [--smoke] [SECTION...]
SECTIONs: full nodrop nobn_stats noadam g_full g_nodrop r_full r_nodrop
r_rbg r_kernel dg_rbg (default: all)
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    if "--cpu" in argv:
        argv.remove("--cpu")
        import jax
        jax.config.update("jax_platforms", "cpu")
    smoke = "--smoke" in argv

    import jax
    import jax.numpy as jnp
    from jax import lax

    from ganreverser_tpu import models as M, optim as O, train as T
    from ganreverser_tpu.core.prng import noise_inputs, seed_key
    from ganreverser_tpu.optim import apply_updates, regularize
    from ganreverser_tpu.train.losses import bce
    from ganreverser_tpu.utils.timing import time_best

    dims = (3, 16, 16) if smoke else (3, 64, 64)
    nd, batch = 100, (16 if smoke else 256)
    dtype = jnp.float32 if smoke else jnp.bfloat16
    n_steps = 2 if smoke else 10
    repeats = 1 if smoke else 3
    half = batch // 2

    G = M.create_G(dims, nd, dtype=dtype)
    D = M.create_D(dims, dtype=dtype)
    key = seed_key(0)
    gs = T.GanState(
        g=T.create_train_state(G, O.adam(), jax.random.fold_in(key, 1),
                               (nd,)),
        d=T.create_train_state(D, O.adam(), jax.random.fold_in(key, 2),
                               dims[1:] + (dims[0],)))
    d_opt = O.adam()
    reals = jax.random.uniform(jax.random.fold_in(key, 4),
                               (n_steps, half) + dims[1:] + (dims[0],),
                               dtype)

    def make_d_variant(*, d_train=True, g_train=True, update=True):
        """The d_step math (train/adversarial.py:107-132, minus confusion)
        with switchable D-dropout / G-BN-training / optimizer legs."""
        def d_loss_fn(d_params, d_state, inputs, targets, rng):
            out, new_state = D.apply(
                {"params": d_params, "state": d_state}, inputs,
                train=d_train, rng=rng if d_train else None)
            return bce(out.reshape(-1), targets), new_state

        def step(gs, real_half, k):
            k_noise, k_gdrop, k_ddrop = jax.random.split(k, 3)
            z = noise_inputs(k_noise, half, nd, "normal")
            fakes, _ = G.apply(gs.g.variables, z, train=g_train,
                               rng=k_gdrop if g_train else None)
            inputs = jnp.concatenate(
                [real_half.astype(fakes.dtype),
                 jax.lax.stop_gradient(fakes)], 0)
            targets = jnp.concatenate(
                [jnp.ones((half,), jnp.float32),
                 jnp.zeros((half,), jnp.float32)], 0)
            (loss, _), grads = jax.value_and_grad(
                d_loss_fn, has_aux=True)(gs.d.params, gs.d.state, inputs,
                                         targets, k_ddrop)
            grads, loss = regularize(gs.d.params, grads, loss, 0.0, 1e-4,
                                     1.0)
            if not update:
                # consume the grads so nothing dead-code-eliminates
                delta = sum(jnp.sum(g.astype(jnp.float32) * 0)
                            for g in jax.tree_util.tree_leaves(grads))
                d = gs.d
                import dataclasses
                d = dataclasses.replace(d, step=d.step + 1
                                        + delta.astype(jnp.int32))
                return T.GanState(g=gs.g, d=d)
            updates, opt_state = d_opt.update(grads, gs.d.opt_state,
                                              gs.d.params)
            import dataclasses
            d = dataclasses.replace(
                gs.d, params=apply_updates(gs.d.params, updates),
                opt_state=opt_state, step=gs.d.step + 1)
            return T.GanState(g=gs.g, d=d)
        return step

    def scan_time(step):
        @jax.jit
        def run(carry, xs):
            def f(c, x):
                return step(c, x[1], x[0]), ()
            c, _ = lax.scan(f, carry, xs)
            return c
        keys = jax.random.split(jax.random.fold_in(key, 8), n_steps)
        return time_best(run, gs, (keys, reals), repeats=repeats) / n_steps

    def emit(name, t, note):
        print(json.dumps({
            "metric": f"{name} {dims[0]}x{dims[1]}x{dims[2]} b{batch}",
            "ms": round(t * 1e3, 2), "note": note}), flush=True)

    sections = [a for a in argv if not a.startswith("-")] or \
        ["full", "nodrop", "nobn_stats", "noadam", "g_full", "g_nodrop",
         "r_full", "r_nodrop", "r_rbg", "r_kernel", "dg_rbg"]

    if "full" in sections:
        emit("d_step full", scan_time(make_d_variant()),
             "baseline (== roofline d_step modulo confusion)")
    if "nodrop" in sections:
        emit("d_step D-eval", scan_time(make_d_variant(d_train=False)),
             "D dropout masks + threefry removed (also freezes D BN: D2 "
             "has none, so the delta is pure dropout/RNG)")
    if "nobn_stats" in sections:
        emit("d_step G-eval", scan_time(make_d_variant(g_train=False)),
             "G's fake half in eval mode: no BN batch stats in G fwd")
    if "noadam" in sections:
        emit("d_step no-update", scan_time(make_d_variant(update=False)),
             "grads computed, adam + param write skipped")

    # --- g_step variants ---
    d_step_full, g_step_full = T.make_adversarial_steps(
        G, D, batch_size=batch, noise_dim=nd, noise_method="normal")
    g_body = g_step_full.raw

    def g_scan(step_fn):
        @jax.jit
        def run(carry, keys):
            def f(c, k):
                return step_fn(c, k)[0], ()
            c, _ = lax.scan(f, carry, keys)
            return c
        keys = jax.random.split(jax.random.fold_in(key, 9), n_steps)
        return time_best(run, gs, keys, repeats=repeats) / n_steps

    if "g_full" in sections:
        emit("g_step full", g_scan(g_body), "baseline (== roofline g_step)")
    if "g_nodrop" in sections:
        def g_nodrop(gs, k):
            k_noise, k_gdrop, _ = jax.random.split(k, 3)
            z = noise_inputs(k_noise, batch, nd, "normal")

            def loss_fn(g_params, g_state):
                imgs, g_new = G.apply({"params": g_params,
                                       "state": g_state}, z, train=True,
                                      rng=k_gdrop)
                out, _ = D.apply(jax.lax.stop_gradient(gs.d.variables),
                                 imgs, train=False)
                return bce(out.reshape(-1),
                           jnp.ones((batch,), jnp.float32)), g_new

            (loss, _), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(gs.g.params, gs.g.state)
            import dataclasses
            g = dataclasses.replace(gs.g, params=apply_updates(
                gs.g.params, d_opt.update(grads, gs.g.opt_state,
                                          gs.g.params)[0]))
            return T.GanState(g=g, d=gs.d), loss
        emit("g_step D-eval", g_scan(g_nodrop),
             "D's dropout (the only RNG in the G step) removed")

    # --- r_step variants (the 21.7%-MFU outlier, logs/tpu_r03_roofline_r) --
    need_r = {"r_full", "r_nodrop", "r_rbg", "r_kernel"} & set(sections)
    if need_r or "dg_rbg" in sections:
        import dataclasses

        R = M.create_R(dims, nd, "normal", dtype=dtype)
        r_ts = T.create_train_state(R, O.adam(), jax.random.fold_in(key, 3),
                                    dims[1:] + (dims[0],))

        def r_scan_time(step_fn, key0):
            @jax.jit
            def run(ts, keys):
                def f(c, k):
                    return step_fn(gs.g.variables, c, k)[0], ()
                c, _ = lax.scan(f, ts, keys)
                return c
            keys = jax.random.split(key0, n_steps)
            return time_best(run, r_ts, keys, repeats=repeats) / n_steps

        if "r_full" in sections or "r_rbg" in sections:
            r_step = T.make_r_train_step(G, R, batch_size=batch,
                                         noise_dim=nd,
                                         noise_method="normal")
            if "r_full" in sections:
                emit("r_step full",
                     r_scan_time(r_step.raw, jax.random.fold_in(key, 9)),
                     "baseline (== roofline r_step), threefry key")
            if "r_rbg" in sections:
                emit("r_step rbg",
                     r_scan_time(r_step.raw,
                                 jax.random.key(9, impl="rbg")),
                     "same program, TPU-native rbg PRNG for the dropout "
                     "masks + noise")

        if "r_kernel" in sections:
            # the PRODUCT option for the dropout cost (train_r --dropout
            # kernel): counter-hash masks generated inside a Pallas apply
            # kernel — zero HBM mask traffic (ops/dropout_kernel.py).
            # Only meaningful on TPU (elsewhere the module falls back).
            R_k = M.create_R(dims, nd, "normal", dtype=dtype,
                             dropout_impl="kernel")
            r_step_k = T.make_r_train_step(G, R_k, batch_size=batch,
                                           noise_dim=nd,
                                           noise_method="normal")
            emit("r_step kernel-dropout",
                 r_scan_time(r_step_k.raw, jax.random.fold_in(key, 9)),
                 "in-kernel counter-hash masks (train_r --dropout kernel)")

        if "r_nodrop" in sections:
            from ganreverser_tpu.models.modules import (Dropout, Identity,
                                                        Sequential,
                                                        SpatialDropout)
            R_nd = Sequential(tuple(
                Identity() if isinstance(l, (Dropout, SpatialDropout))
                else l for l in R.layers))
            r_step_nd = T.make_r_train_step(G, R_nd, batch_size=batch,
                                            noise_dim=nd,
                                            noise_method="normal")
            emit("r_step no-dropout",
                 r_scan_time(r_step_nd.raw, jax.random.fold_in(key, 9)),
                 "Dropout->Identity at same positions (positional param "
                 "keys preserved; measurement probe, not a product mode)")

    if "dg_rbg" in sections:
        d_body2, g_body2 = (x.raw for x in T.make_adversarial_steps(
            G, D, batch_size=batch, noise_dim=nd, noise_method="normal"))

        @jax.jit
        def dg_run(carry, xs):
            def f(c, x):
                gs2, conf2, _ = d_body2(c[0], x[1], c[1], x[0])
                gs2, _ = g_body2(gs2, x[0])
                return (gs2, conf2), ()
            c, _ = lax.scan(f, carry, xs)
            return c
        conf = T.Confusion.zero()
        keys = jax.random.split(jax.random.key(8, impl="rbg"), n_steps)
        t = time_best(dg_run, (gs, conf), (keys, reals),
                      repeats=repeats) / n_steps
        emit("d+g step rbg", t, "d+g scan with the TPU-native rbg PRNG")


if __name__ == "__main__":
    main()
