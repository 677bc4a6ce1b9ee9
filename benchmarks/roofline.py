"""Training-step roofline — FLOP counts + MFU for the adversarial loop.

The eval paths (G-generate, R-invert, refinement) have had careful MFU
accounting since round 2 (RESULTS.md); this closes the gap for the
TRAINING step — the reference's hot loop (adversarial.lua:52-195 d/g
closures) rebuilt as d_step/g_step in train/adversarial.py.

FLOPs come from XLA's own cost model on the COMPILED program
(``lowered.compile().cost_analysis()['flops']``) — this counts the real
fwd+bwd HLOs after fusion/layout assignment, not a hand napkin estimate,
and automatically tracks any future model change. Step time is measured
on the amortizing scan (one dispatch for N steps — the same shape as the
production epoch program), so the axon tunnel's ~28 ms dispatch RTT
cannot pollute the denominator.

Peak used for MFU: v5e bf16 197 TFLOP/s (same constant as RESULTS.md's
eval rooflines). For f32 runs the achieved TFLOP/s is reported without an
MFU claim (the MXU's f32 path has a different, layout-dependent peak).

Usage: python benchmarks/roofline.py [--cpu] [--f32] [--smoke]
                                     [--batch N]        # default 256
                                     [d] [g] [dg] [r]   # default: all
Each line: {"metric": ..., "flops_g": ..., "ms": ..., "tflops": ...,
"mfu_pct": ...}. Sections can be run one per process (the axon tunnel
occasionally wedges a remote compile; per-section invocations bound the
damage to one timeout).
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PEAK_BF16 = 197e12  # v5e peak bf16 FLOP/s — same constant as RESULTS.md


def _flops(lowered):
    """XLA cost-model flops of a lowered jit, or None if unavailable."""
    try:
        ca = lowered.compile().cost_analysis()
        if isinstance(ca, (list, tuple)):  # older JAX returns [dict]
            ca = ca[0]
        return float(ca["flops"])
    except Exception as e:  # noqa: BLE001 — cost model is best-effort
        print(f"[roofline] cost_analysis unavailable: {e}", file=sys.stderr)
        return None


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    if "--cpu" in argv:
        argv.remove("--cpu")
        import jax
        jax.config.update("jax_platforms", "cpu")
    smoke = "--smoke" in argv  # tiny shapes: exercises the script, not perf
    f32 = "--f32" in argv or smoke  # bf16 convs are glacial on CPU
    batch_override = None
    if "--batch" in argv:
        i = argv.index("--batch")
        batch_override = int(argv[i + 1])
        del argv[i:i + 2]

    import jax
    import jax.numpy as jnp
    from jax import lax

    from ganreverser_tpu import models as M, optim as O, train as T
    from ganreverser_tpu.core.prng import seed_key
    from ganreverser_tpu.utils.timing import time_best

    # smoke: tiny geometry/batch — validates the script mechanics only
    # (64x64 training steps take minutes per step on the CPU backend)
    dims = (3, 16, 16) if smoke else (3, 64, 64)
    nd, batch = 100, (16 if smoke else 256)
    if batch_override:
        batch = batch_override
    dtype = jnp.float32 if f32 else jnp.bfloat16
    tag = "f32" if f32 else "bf16"
    n_steps = 2 if smoke else 10  # amortizing scan length

    G = M.create_G(dims, nd, dtype=dtype)
    D = M.create_D(dims, dtype=dtype)
    R = M.create_R(dims, nd, "normal", dtype=dtype)
    key = seed_key(0)
    gs = T.GanState(
        g=T.create_train_state(G, O.adam(), jax.random.fold_in(key, 1),
                               (nd,)),
        d=T.create_train_state(D, O.adam(), jax.random.fold_in(key, 2),
                               dims[1:] + (dims[0],)))
    r_ts = T.create_train_state(R, O.adam(), jax.random.fold_in(key, 3),
                                dims[1:] + (dims[0],))
    d_step, g_step = T.make_adversarial_steps(
        G, D, batch_size=batch, noise_dim=nd, noise_method="normal")
    d_body, g_body = d_step.raw, g_step.raw
    r_step = T.make_r_train_step(G, R, batch_size=batch, noise_dim=nd,
                                 noise_method="normal")
    half = batch // 2
    reals = jax.random.uniform(jax.random.fold_in(key, 4),
                               (n_steps, half) + dims[1:] + (dims[0],),
                               dtype)
    conf = T.Confusion.zero()

    repeats = 1 if smoke else 3

    def progress(msg):
        print(f"[roofline] {msg}", file=sys.stderr, flush=True)

    # ---- measured per-step time via an amortizing scan -----------------
    def scan_time(body):
        @jax.jit
        def run(carry, keys_reals):
            def f(c, xs):
                return body(c, *xs), ()
            c, _ = lax.scan(f, carry, keys_reals)
            return c
        keys = jax.random.split(jax.random.fold_in(key, 8), n_steps)
        t = time_best(run, (gs, conf), (keys, reals), repeats=repeats)
        return t / n_steps

    def emit(name, fl, t, imgs):
        rec = {"metric": f"{name} {dims[0]}x{dims[1]}x{dims[2]} z=100 b{batch} {tag}",
               "flops_g": round(fl / 1e9, 2) if fl else None,
               "ms": round(t * 1e3, 2),
               "img_per_s": round(imgs / t, 0)}
        if fl:
            rec["tflops"] = round(fl / t / 1e12, 1)
            if not f32:
                rec["mfu_pct"] = round(100 * fl / t / PEAK_BF16, 1)
        print(json.dumps(rec), flush=True)

    sections = [a for a in argv if a in ("d", "g", "dg", "r")] or \
        ["d", "g", "dg", "r"]
    fl_d = fl_g = None

    # FLOPs (XLA cost model on the compiled step) then the timed scan,
    # emitted per section so partial runs still report
    if "d" in sections:
        progress("d_step: cost analysis...")
        fl_d = _flops(jax.jit(d_body).lower(gs, reals[0], conf,
                                            jax.random.fold_in(key, 5)))
        progress("d_step: timing scan...")
        t_d = scan_time(lambda c, k, r: (d_body(c[0], r, c[1], k)[0], c[1]))
        emit("d_step (fwd+bwd+adam)", fl_d, t_d, batch)  # D sees full batch

    if "g" in sections:
        progress("g_step: cost analysis...")
        fl_g = _flops(jax.jit(g_body).lower(gs, jax.random.fold_in(key, 6)))
        progress("g_step: timing scan...")
        t_g = scan_time(lambda c, k, r: (g_body(c[0], k)[0], c[1]))
        emit("g_step (fwd+bwd+adam)", fl_g, t_g, batch)

    if "dg" in sections:
        if fl_d is None or fl_g is None:
            progress("d+g: cost analysis...")
            fl_d = fl_d or _flops(jax.jit(d_body).lower(
                gs, reals[0], conf, jax.random.fold_in(key, 5)))
            fl_g = fl_g or _flops(jax.jit(g_body).lower(
                gs, jax.random.fold_in(key, 6)))
        progress("d+g: timing scan...")
        t_dg = scan_time(lambda c, k, r:
                         (g_body(d_body(c[0], r, c[1], k)[0], k)[0], c[1]))
        if fl_d and fl_g:
            emit("d+g step", fl_d + fl_g, t_dg, batch)

    if "r" in sections:
        progress("r_step: cost analysis...")
        fl_r = _flops(jax.jit(r_step).lower(gs.g.variables, r_ts,
                                            jax.random.fold_in(key, 7)))

        @jax.jit
        def r_scan(ts, keys):
            def f(c, k):
                return r_step(gs.g.variables, c, k)[0], ()
            c, _ = lax.scan(f, ts, keys)
            return c
        progress("r_step: timing scan...")
        t_r = time_best(
            r_scan, r_ts,
            jax.random.split(jax.random.fold_in(key, 9), n_steps),
            repeats=repeats) / n_steps
        emit("r_step (G fwd + R fwd+bwd+adam)", fl_r, t_r, batch)


if __name__ == "__main__":
    main()
