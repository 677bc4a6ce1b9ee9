"""Export a compile-once serving artifact (StableHLO via jax.export).

The reference's deployment story is "load the .net in a torch process"
(apply_r.lua:59-109); on TPU the costly step is client-side tracing +
lowering (minutes for the flagship G), so production serving wants it
done ONCE at release time. This command bakes a checkpoint into a
lowered, weights-embedded StableHLO artifact that any jax process on a
listed platform can deserialize and run — no model code, no checkpoint,
no config on the serving path (io/serving.py).

    # the headline R-inversion program, batch 256, bf16:
    python -m ganreverser_tpu.cli.export --G logs/adversarial --save logs \
        --out logs/serve_invert --what invert --batch 256 \
        --compute_dtype bfloat16 --check

    # the fused generate->invert->top-k pipeline at fixed N:
    python -m ganreverser_tpu.cli.export --G logs/adversarial --save logs \
        --out logs/serve_e2e --what e2e --N 10000 --check

``--what generate`` exports the measured-winner fast G decoder
(z -> images); ``--int8`` swaps in the int8 weight+activation paths
(ops/quant.py — the serving candidate gated by tpu_kernel_check
e2e_int8). Programs have static shapes: batch (and N for e2e) are fixed
at export time, like any production serving signature.
"""
from __future__ import annotations

import argparse
import sys

import jax
import jax.numpy as jnp

from . import common


def main(argv=None):
    common.configure_platform()
    p = argparse.ArgumentParser(
        description="export a compile-once serving artifact "
                    "(weights-baked StableHLO, io/serving.py)")
    p.add_argument("--G", default="logs/adversarial",
                   help="G checkpoint (geometry is inherited from it, "
                        "like apply_r.lua:59-75)")
    p.add_argument("--R", default="",
                   help="R checkpoint (default derived from G's geometry)")
    p.add_argument("--save", default="logs",
                   help="directory with checkpoints")
    p.add_argument("--out", required=True,
                   help="artifact directory to write")
    p.add_argument("--what", default="invert",
                   choices=("invert", "generate", "e2e"),
                   help="program to export: invert = images->z (the "
                        "headline workload, apply_r.lua:143-153); "
                        "generate = z->images (fast decoder); e2e = the "
                        "fused generate->invert->top-k pipeline "
                        "(analysis/e2e.py)")
    p.add_argument("--batch", type=int, default=256,
                   help="static batch size of the exported program")
    p.add_argument("--N", type=int, default=10000,
                   help="static corpus size for --what e2e")
    p.add_argument("--k", type=int, default=100,
                   help="top-k for --what e2e")
    p.add_argument("--int8", action="store_true",
                   help="int8 weight+activation paths (ops/quant.py; "
                        "recall gate: tpu_kernel_check e2e_int8)")
    p.add_argument("--platforms", default="tpu,cpu",
                   help="comma-separated platform list baked into the "
                        "artifact (lowering is done for each)")
    p.add_argument("--compute_dtype", default="float32",
                   choices=("float32", "bfloat16"))
    p.add_argument("--check", action="store_true",
                   help="reload the artifact and compare one random "
                        "batch against the live program on the local "
                        "backend")
    args = p.parse_args(argv)
    common.ensure_backend_alive(args)

    from .. import io as gio
    from .. import models as M
    from ..io.serving import load_serving_program, save_serving_program

    dtype = jnp.bfloat16 if args.compute_dtype == "bfloat16" else jnp.float32
    g_tree, g_cfg, _ = gio.load_checkpoint(args.G)
    noise_dim = g_cfg["noiseDim"]
    noise_method = g_cfg["noiseMethod"]
    colorspace = g_cfg["colorSpace"]
    h, w = g_cfg["height"], g_cfg["width"]
    c = 1 if colorspace == "y" else 3
    dims = (c, h, w)
    g_vars = {"params": g_tree["G"]["params"], "state": g_tree["G"]["state"]}

    def load_r():
        r_path = args.R or gio.r_name(args.save, c, h, w, noise_dim,
                                      noise_method, False)
        r_tree, _, _ = gio.load_checkpoint(r_path)
        return {"params": r_tree["R"]["params"],
                "state": r_tree["R"]["state"]}

    meta = {"what": args.what, "height": h, "width": w, "channels": c,
            "noiseDim": noise_dim, "noiseMethod": noise_method,
            "colorSpace": colorspace, "batch": args.batch,
            "compute_dtype": args.compute_dtype, "int8": bool(args.int8),
            "G": args.G}
    key = jax.random.PRNGKey(0)

    if args.what == "generate":
        from ..models.fastpath import (make_fast_generator_xla,
                                       make_fast_generator_xla_int8)
        mk = (make_fast_generator_xla_int8 if args.int8
              else make_fast_generator_xla)
        gen = mk(dims, noise_dim, dtype=dtype)
        fn = lambda z: gen(g_vars, z)  # noqa: E731 — weights baked
        example = (jax.random.normal(key, (args.batch, noise_dim),
                                     jnp.float32),)
    elif args.what == "invert":
        r_vars = load_r()
        if args.int8:
            from ..models.fastpath import make_fast_inverter_int8
            inv = make_fast_inverter_int8(dims, noise_dim, noise_method,
                                          dtype=dtype)
            fn = lambda images: inv(r_vars, images)  # noqa: E731
        else:
            # measured winner: the plain module path (XLA's conv pipeline
            # beat the fused conv-block kernel — RESULTS.md round 2)
            R = M.create_R(dims, noise_dim, noise_method, dtype=dtype)
            fn = lambda images: R.apply(  # noqa: E731
                r_vars, images, train=False)[0]
        example = (jax.random.uniform(key, (args.batch, h, w, c),
                                      jnp.float32).astype(dtype),)
    else:  # e2e
        from ..analysis.e2e import make_e2e_program
        G = M.create_G(dims, noise_dim, dtype=dtype)
        R = M.create_R(dims, noise_dim, noise_method, dtype=dtype)
        r_vars = load_r()
        if args.int8:
            from ..models.fastpath import (make_fast_generator_xla_int8,
                                           make_fast_inverter_int8)
            g8 = make_fast_generator_xla_int8(dims, noise_dim, dtype=dtype)
            r8 = make_fast_inverter_int8(dims, noise_dim, noise_method,
                                         dtype=dtype)
            prog = make_e2e_program(G, R, batch_size=args.batch, k=args.k,
                                    g_apply=lambda g, zc: g8(g, zc),
                                    r_apply=lambda r, im: r8(r, im))
        else:
            from ..models.fastpath import make_fast_generator_xla
            fg = make_fast_generator_xla(dims, noise_dim, dtype=dtype)
            prog = make_e2e_program(G, R, batch_size=args.batch, k=args.k,
                                    g_apply=lambda g, zc: fg(g, zc))
        fn = lambda z: prog(g_vars, r_vars, z)  # noqa: E731
        meta["N"] = args.N
        meta["k"] = args.k
        example = (jax.random.normal(key, (args.N, noise_dim),
                                     jnp.float32),)

    platforms = tuple(s.strip() for s in args.platforms.split(",") if s)
    save_serving_program(args.out, fn, example, meta, platforms)
    import os
    size = os.path.getsize(os.path.join(args.out, "program.stablehlo"))
    print(f"[export] wrote {args.out} ({args.what}, platforms="
          f"{','.join(platforms)}, {size / 1e6:.1f} MB)")

    if args.check:
        backend = jax.default_backend()
        if backend not in platforms:
            sys.exit(f"[export] --check: local backend {backend} not in "
                     f"artifact platforms {platforms}")
        call, _ = load_serving_program(args.out)
        got = call(*example)
        want = fn(*example)
        # compare FLOAT leaves only: integer leaves are top-k indices,
        # whose order among tied scores may legitimately differ between
        # the exported lowering and the live jit (the score leaves pin
        # the actual ranking contract)
        floats = [(a, b) for a, b in zip(jax.tree.leaves(got),
                                         jax.tree.leaves(want))
                  if jnp.issubdtype(a.dtype, jnp.inexact)]
        err = max(float(jnp.max(jnp.abs(a.astype(jnp.float32)
                                        - b.astype(jnp.float32))))
                  for a, b in floats)
        scale = max(float(jnp.max(jnp.abs(b.astype(jnp.float32))))
                    for _, b in floats)
        # the check guards against a broken artifact, not bit parity:
        # export/live lowerings may reassociate floats; under --int8 a
        # reassociated value near a quantization boundary flips a whole
        # int8 level (1/127 of the tensor amax), so the tolerance is a
        # few levels there
        tol = (0.05 if args.int8 else 1e-3) * max(1.0, scale)
        print(f"[export] check ok: max float |artifact - live| = "
              f"{err:.3e} (scale {scale:.2e})")
        assert err < tol, (err, tol)


if __name__ == "__main__":
    main()
