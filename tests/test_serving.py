"""Serving-artifact tests (io/serving.py + cli/export.py).

The artifact contract: a weights-baked StableHLO program that a process
with NO model code, NO checkpoint, and NO config can deserialize and run
(the compile-once analogue of the reference's "load the .net in a torch
process" deployment, apply_r.lua:59-109).
"""
import json
import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np

from ganreverser_tpu import models as M
from ganreverser_tpu.io.serving import (load_serving_program,
                                        save_serving_program)


def test_serving_roundtrip_inverter(key, tmp_path):
    """Export the real R module forward with baked weights; reload and
    compare against the live program."""
    dims, nd = (1, 8, 8), 4
    R = M.create_R(dims, nd, "normal", dtype=jnp.float32)
    rv, _ = R.init(key, (8, 8, 1))
    fn = lambda images: R.apply(rv, images, train=False)[0]  # noqa: E731
    x = jax.random.uniform(jax.random.fold_in(key, 1), (4, 8, 8, 1))

    out = os.path.join(tmp_path, "serve")
    save_serving_program(out, fn, (x,),
                         {"what": "invert", "noiseDim": nd},
                         platforms=("cpu",))
    assert os.path.isfile(os.path.join(out, "manifest.json"))
    assert os.path.isfile(os.path.join(out, "program.stablehlo"))

    call, meta = load_serving_program(out)
    assert meta["what"] == "invert" and meta["noiseDim"] == nd
    assert meta["platforms"] == ["cpu"]
    np.testing.assert_allclose(np.asarray(call(x)), np.asarray(fn(x)),
                               rtol=1e-5, atol=1e-6)


def test_serving_artifact_loads_without_model_code(key, tmp_path):
    """A FRESH python process that never imports the model zoo runs the
    artifact — the actual serving deployment contract."""
    dims, nd = (1, 8, 8), 4
    R = M.create_R(dims, nd, "normal", dtype=jnp.float32)
    rv, _ = R.init(key, (8, 8, 1))
    fn = lambda images: R.apply(rv, images, train=False)[0]  # noqa: E731
    x = np.asarray(jax.random.uniform(jax.random.fold_in(key, 1),
                                      (4, 8, 8, 1)))
    out = os.path.join(tmp_path, "serve")
    save_serving_program(out, fn, (jnp.asarray(x),), {"what": "invert"},
                         platforms=("cpu",))
    want = np.asarray(fn(jnp.asarray(x)))
    np.save(os.path.join(tmp_path, "x.npy"), x)

    code = f"""
import jax, numpy as np
jax.config.update("jax_platforms", "cpu")
import json, os
d = {str(out)!r}
with open(os.path.join(d, "program.stablehlo"), "rb") as f:
    exp = jax.export.deserialize(f.read())
x = np.load({str(os.path.join(tmp_path, "x.npy"))!r})
out = exp.call(x)
np.save(os.path.join(d, "got.npy"), np.asarray(out))
print("SERVED", out.shape)
"""
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # plain 1-device CPU serving process
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, timeout=240, env=env)
    assert r.returncode == 0, (r.stdout, r.stderr)
    assert "SERVED" in r.stdout
    got = np.load(os.path.join(out, "got.npy"))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_serving_manifest_records_format(key, tmp_path):
    fn = lambda x: x * 2.0  # noqa: E731
    out = os.path.join(tmp_path, "serve")
    save_serving_program(out, fn, (jnp.ones((2,)),), {"what": "toy"},
                         platforms=("cpu",))
    with open(os.path.join(out, "manifest.json")) as f:
        meta = json.load(f)
    assert meta["format"] == "jax.export/stablehlo"
    assert meta["jax_version"] == jax.__version__
