"""Benchmark matrix — the five BASELINE.json configs (SURVEY.md §6).

  1. grayscale 32x32, z=32: G+R forward inversion, batch 64 (CPU-runnable)
  2. RGB 64x64, z=100: full G/D adversarial + R training step rates
  3. 10k-face batch inversion -> cosine top-k + kmeans-20 pipeline
  4. G∘R image fixing + anomaly detection over 10k faces
  5. 128x128 RGB, z=256 gradient-based latent optimization
  6. (framework scale, beyond the reference schedule) b256 epoch-program
     training rates in f32 and bf16

Usage:
  python benchmarks/matrix.py                 # all configs
  python benchmarks/matrix.py 1 3             # a subset (configs 1-6)
  python benchmarks/matrix.py 1 --cpu         # force the CPU backend

Each config prints one JSON line: {"config": N, "metric": ..., "value": ...,
"unit": ...}. bench.py (repo root) remains the driver's single-line headline.
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _force(x):
    from ganreverser_tpu.utils.timing import force
    force(x)


def _time_best(fn, *args, repeats=3):
    from ganreverser_tpu.utils.timing import time_best
    return time_best(fn, *args, repeats=repeats)


def _emit(config, metric, value, unit, **extra):
    rec = {"config": config, "metric": metric, "value": round(value, 2),
           "unit": unit}
    rec.update(extra)
    print(json.dumps(rec), flush=True)


def config1():
    """Grayscale 32x32, z=32, batch 64: G+R forward inversion (the minimum
    end-to-end slice, SURVEY.md §7 step 2)."""
    import jax, jax.numpy as jnp
    from ganreverser_tpu import models as M
    from ganreverser_tpu.core.prng import seed_key

    G = M.create_G((1, 32, 32), 32)
    R = M.create_R((1, 32, 32), 32, "normal")
    key = seed_key(0)
    gv, _ = G.init(jax.random.fold_in(key, 1), (32,))
    rv, _ = R.init(jax.random.fold_in(key, 2), (32, 32, 1))

    @jax.jit
    def invert(gv, rv, z):
        imgs, _ = G.apply(gv, z, train=False)
        zh, _ = R.apply(rv, imgs, train=False)
        return zh

    z = jax.random.normal(jax.random.fold_in(key, 3), (64, 32))
    t = _time_best(invert, gv, rv, z)
    _emit(1, "G+R inversion 1x32x32 z=32 b64", 64 / t, "img/s",
          note="single dispatch — latency-bound on the ~28ms tunnel RTT")
    from ganreverser_tpu.utils.timing import time_amortized
    ta = time_amortized(lambda z: invert(gv, rv, z), z)
    _emit(1, "G+R inversion 1x32x32 z=32 b64 (amortized)", 64 / ta, "img/s")


def config2():
    """RGB 64x64, z=100: adversarial D+G step rate and R train-step rate."""
    import jax, jax.numpy as jnp
    from ganreverser_tpu import models as M, optim as O, train as T
    from ganreverser_tpu.core.prng import seed_key

    dims, nd, batch = (3, 64, 64), 100, 32
    G = M.create_G(dims, nd)
    D = M.create_D(dims)
    R = M.create_R(dims, nd, "normal")
    key = seed_key(0)
    gs = T.GanState(
        g=T.create_train_state(G, O.adam(), jax.random.fold_in(key, 1),
                               (nd,)),
        d=T.create_train_state(D, O.adam(), jax.random.fold_in(key, 2),
                               (64, 64, 3)))
    r_ts = T.create_train_state(R, O.adam(), jax.random.fold_in(key, 3),
                                (64, 64, 3))
    d_step, g_step = T.make_adversarial_steps(
        G, D, batch_size=batch, noise_dim=nd, noise_method="normal")
    real = jax.random.uniform(jax.random.fold_in(key, 4),
                              (batch // 2, 64, 64, 3))

    def adv(gs):
        gs, conf, d_loss = d_step(gs, real, T.Confusion.zero(),
                                  jax.random.fold_in(key, 5))
        gs, g_loss = g_step(gs, jax.random.fold_in(key, 6))
        return gs, d_loss, g_loss

    t = _time_best(adv, gs)
    _emit(2, "adversarial D+G step 3x64x64 z=100 b32", batch / t, "img/s",
          step_ms=round(t * 1e3, 2))

    r_step = T.make_r_train_step(G, R, batch_size=batch, noise_dim=nd,
                                 noise_method="normal")
    t = _time_best(r_step, gs.g.variables, r_ts, jax.random.fold_in(key, 7))
    _emit(2, "R train step 3x64x64 z=100 b32", batch / t, "img/s",
          step_ms=round(t * 1e3, 2))

    # the production path: whole epoch as ONE scan program (30 batches)
    t, n_batches = _epoch_program_time(G, D, gs, nd, batch, 30)
    _emit(2, f"epoch program ({n_batches} D+G batches, one dispatch)",
          n_batches * batch / t, "img/s", epoch_ms=round(t * 1e3, 2))


def _epoch_program_time(G, D, gs, nd, batch, n_batches):
    """Time the single-scan epoch program (shared by configs 2 and 6)."""
    import jax
    from ganreverser_tpu import train as T
    from ganreverser_tpu.core.prng import seed_key
    key = seed_key(0)
    epoch = T.make_epoch_program(G, D, batch_size=batch, noise_dim=nd,
                                 noise_method="normal", n_batches=n_batches,
                                 donate=False)
    data = jax.random.uniform(jax.random.fold_in(key, 8),
                              (n_batches * batch // 2, 64, 64, 3))
    t = _time_best(epoch, gs, T.Confusion.zero(), data,
                   jax.random.fold_in(key, 9))
    return t, n_batches


def config3():
    """10k batch inversion -> cosine top-k + kmeans-20 (apply_r pipeline)."""
    import jax, jax.numpy as jnp
    from ganreverser_tpu import models as M
    from ganreverser_tpu.analysis import cosine_topk, forward_batched, kmeans
    from ganreverser_tpu.core.prng import seed_key

    dims, nd, n = (3, 64, 64), 100, 10240
    R = M.create_R(dims, nd, "normal", dtype=jnp.bfloat16)
    key = seed_key(0)
    rv, _ = R.init(jax.random.fold_in(key, 2), (64, 64, 3))
    images = jax.random.uniform(jax.random.fold_in(key, 3),
                                (n, 64, 64, 3), jnp.bfloat16)

    @jax.jit
    def invert(rv, x):
        return forward_batched(lambda b: R.apply(rv, b, train=False)[0],
                               x, 256)

    t = _time_best(invert, rv, images)
    _emit(3, "10k batch inversion 64x64 bf16 (XLA)", n / t, "img/s")

    if jax.default_backend() == "tpu":
        from ganreverser_tpu.models.fastpath import make_fast_inverter
        fastinv = make_fast_inverter(dims, nd, "normal",
                                     dtype=jnp.bfloat16, tile_n=4)

        @jax.jit
        def invert_fast(rv, x):
            return forward_batched(lambda b: fastinv(rv, b), x, 256)

        t = _time_best(invert_fast, rv, images)
        _emit(3, "10k batch inversion 64x64 bf16 (Pallas fused blocks)",
              n / t, "img/s")

    emb = invert(rv, images)
    _force(emb)
    needles = jnp.arange(256)
    f = jax.jit(lambda e: cosine_topk(e, needles, 100))
    t = _time_best(f, emb)
    _emit(3, "cosine top-100, 256 needles x 10k", 256 / t, "qps",
          note="single-call; amortized rate is ~10x (see bench.py)")

    f = jax.jit(lambda k, e: kmeans(k, e, 20, 15), static_argnums=())
    t = _time_best(f, jax.random.fold_in(key, 5), emb.astype(jnp.float32))
    _emit(3, "kmeans-20 x15 iters over 10k (lax)", 1.0 / t, "runs/s",
          run_ms=round(t * 1e3, 2))

    if jax.default_backend() == "tpu":
        # Pallas-vs-lax kmeans timing (VERDICT r1 item 7)
        from ganreverser_tpu.ops import kmeans_pallas
        fp = jax.jit(lambda k, e: kmeans_pallas(k, e, 20, 15))
        t = _time_best(fp, jax.random.fold_in(key, 5),
                       emb.astype(jnp.float32))
        _emit(3, "kmeans-20 x15 iters over 10k (Pallas)", 1.0 / t, "runs/s",
              run_ms=round(t * 1e3, 2))


def config4():
    """G∘R fixing + anomaly detection over 10k generated faces."""
    import jax, jax.numpy as jnp
    from ganreverser_tpu import models as M
    from ganreverser_tpu.analysis import (detect_anomalies, fix_images,
                                          forward_batched)
    from ganreverser_tpu.core.prng import seed_key

    dims, nd, n = (3, 64, 64), 100, 10240
    G = M.create_G(dims, nd, dtype=jnp.bfloat16)
    key = seed_key(0)
    gv, _ = G.init(jax.random.fold_in(key, 1), (nd,))
    z = jax.random.normal(jax.random.fold_in(key, 3), (n, nd))

    t = _time_best(lambda z: fix_images(G, gv, z, batch_size=256), z)
    _emit(4, "G∘R fixing (G fwd from recovered z) 10k (XLA)", n / t,
          "img/s")

    if jax.default_backend() == "tpu":
        from ganreverser_tpu.analysis import forward_batched as _fb
        from ganreverser_tpu.models.fastpath import make_fast_generator
        fastgen = make_fast_generator(dims, nd, dtype=jnp.bfloat16,
                                      tile_n=4)
        gen = jax.jit(lambda gv, z: _fb(lambda b: fastgen(gv, b), z, 256))
        t = _time_best(gen, gv, z)
        _emit(4, "G fwd 10k (Pallas fused upsample blocks)", n / t, "img/s")

    images = fix_images(G, gv, z, batch_size=256)
    _force(images)
    fixed = images  # scoring cost is what's measured
    f = jax.jit(lambda a, b: detect_anomalies(a, b, 0.15))
    t = _time_best(f, images, fixed)
    _emit(4, "anomaly scoring+threshold 10k", n / t, "img/s")


def config5():
    """128x128 RGB, z=256: gradient-based latent optimization through a
    frozen G (20 adam steps on z)."""
    import jax, jax.numpy as jnp
    from ganreverser_tpu import models as M
    from ganreverser_tpu.analysis import make_refiner
    from ganreverser_tpu.core.prng import seed_key

    dims, nd, batch, steps = (3, 128, 128), 256, 64, 20
    G = M.create_G(dims, nd, dtype=jnp.bfloat16)
    key = seed_key(0)
    gv, _ = G.init(jax.random.fold_in(key, 1), (nd,))
    refine = make_refiner(G, steps=steps, lr=0.05)
    targets = jax.random.uniform(jax.random.fold_in(key, 2),
                                 (batch, 128, 128, 3), jnp.bfloat16)
    z0 = jnp.zeros((batch, nd))
    t = _time_best(refine, gv, targets, z0)
    _emit(5, f"latent refinement 3x128x128 z=256 b{batch} x{steps} steps",
          batch * steps / t, "img-steps/s")

    # eval G-generate rate at the 128x128 geometry (completes the G perf
    # story beyond the 64x64 flagship)
    from ganreverser_tpu.analysis import forward_batched
    n = 2048
    z = jax.random.normal(jax.random.fold_in(key, 3), (n, nd))
    gen = jax.jit(lambda gv, z: forward_batched(
        lambda b: G.apply(gv, b, train=False)[0], z, 128))
    t = _time_best(gen, gv, z)
    _emit(5, "G-generate 3x128x128 z=256 (module path)", n / t, "img/s")


def config6():
    """Training at production scale (framework measurement, not a reference
    schedule): the single-scan epoch program at batch 256, f32 and bf16
    compute (bf16 training exercises the conv_f32acc custom vjp)."""
    import jax, jax.numpy as jnp
    from ganreverser_tpu import models as M, optim as O, train as T
    from ganreverser_tpu.core.prng import seed_key

    dims, nd, batch, n_batches = (3, 64, 64), 100, 256, 10
    key = seed_key(0)
    for dtype, tag in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
        G = M.create_G(dims, nd, dtype=dtype)
        D = M.create_D(dims, dtype=dtype)
        gs = T.GanState(
            g=T.create_train_state(G, O.adam(), jax.random.fold_in(key, 1),
                                   (nd,)),
            d=T.create_train_state(D, O.adam(), jax.random.fold_in(key, 2),
                                   (64, 64, 3)))
        t, _ = _epoch_program_time(G, D, gs, nd, batch, n_batches)
        _emit(6, f"epoch program b{batch} {tag} ({n_batches} D+G batches)",
              n_batches * batch / t, "img/s",
              step_ms=round(t * 1e3 / n_batches, 2))


CONFIGS = {1: config1, 2: config2, 3: config3, 4: config4, 5: config5,
           6: config6}


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    if "--cpu" in argv:
        argv.remove("--cpu")
        import jax
        jax.config.update("jax_platforms", "cpu")
    picks = []
    for a in argv:
        if not a.isdigit() or int(a) not in CONFIGS:
            sys.exit(f"usage: matrix.py [{' '.join(map(str, CONFIGS))}] "
                     f"[--cpu]  (got {a!r})")
        picks.append(int(a))
    for n in picks or sorted(CONFIGS):
        CONFIGS[n]()


if __name__ == "__main__":
    main()
