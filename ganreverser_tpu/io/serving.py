"""Serving-program export: compile-once artifacts via ``jax.export``.

The reference has no serving story — deployment is "load the `.net` file
in a torch process" (apply_r.lua:59-109 reloads and re-JITs nothing
because Lua torch is eager). On TPU the expensive step is client-side
XLA tracing+lowering (1-4 min for the flagship G on this host), so a
production server wants the lowered program as an artifact: trace and
lower ONCE at release time, then every serving process deserializes
StableHLO and goes straight to XLA compilation (seconds, device-side)
with zero Python model code on the serving path.

``jax.export`` serializes the lowered StableHLO with the weights BAKED
in as constants, so an artifact is self-contained: no checkpoint, no
model zoo, no config needed at load time — just jax on a machine whose
backend is in the artifact's platform list. Artifacts are exported for
``("tpu", "cpu")`` by default: one file serves on the pod AND runs on a
CPU host for smoke checks.

Artifact layout (same convention as checkpoints — a directory with a
manifest): ``<dir>/manifest.json`` (what the program is: kind, geometry,
batch, dtype, platforms, framework version) + ``<dir>/program.stablehlo``.

Build + check + load:
    python -m ganreverser_tpu.cli.export --G logs/adversarial --save logs \
        --out logs/serve_invert --what invert --batch 256 --check
    call, meta = gio.load_serving_program("logs/serve_invert")
    z_hat = call(images)           # (batch, noiseDim) — shapes are static
"""
from __future__ import annotations

import json
import os
from typing import Any, Callable

import jax

MANIFEST = "manifest.json"
PROGRAM = "program.stablehlo"


def export_serving_program(fn: Callable, example_args: tuple,
                           platforms=("tpu", "cpu")) -> bytes:
    """Trace+lower ``fn`` at ``example_args``'s static shapes for every
    platform in ``platforms`` and serialize the result. Weights must be
    closed over (they are baked into the artifact as constants)."""
    exp = jax.export.export(jax.jit(fn), platforms=list(platforms))(
        *example_args)
    return exp.serialize()


def save_serving_program(path: str, fn: Callable, example_args: tuple,
                         meta: dict[str, Any],
                         platforms=("tpu", "cpu")) -> None:
    """Export ``fn`` and write the artifact directory (manifest + bytes).

    ``meta`` documents the program for the loader/human (kind, geometry,
    batch, dtype...); ``platforms`` is recorded alongside.
    """
    data = export_serving_program(fn, example_args, platforms)
    os.makedirs(path, exist_ok=True)
    manifest = dict(meta)
    manifest["platforms"] = list(platforms)
    manifest["format"] = "jax.export/stablehlo"
    manifest["jax_version"] = jax.__version__
    with open(os.path.join(path, MANIFEST), "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    with open(os.path.join(path, PROGRAM), "wb") as f:
        f.write(data)


def load_serving_program(path: str):
    """Returns ``(call, meta)``: ``call`` runs the deserialized program
    (compiling for the local backend on first use); ``meta`` is the
    manifest dict. Raises if the local backend is not in the artifact's
    platform list (jax.export enforces this at call time)."""
    with open(os.path.join(path, MANIFEST)) as f:
        meta = json.load(f)
    with open(os.path.join(path, PROGRAM), "rb") as f:
        exp = jax.export.deserialize(f.read())
    return jax.jit(exp.call), meta
