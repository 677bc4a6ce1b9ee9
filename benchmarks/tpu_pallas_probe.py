"""Minimal Mosaic compile probe for the axon tunnel.

The round-2 TPU session showed every production Pallas kernel failing with
`remote_compile: HTTP 500: tpu_compile_helper subprocess exit code 1` while
plain XLA jit compiles succeed.  This script isolates whether the tunnel's
compile helper rejects Mosaic payloads entirely (trivial kernel fails too)
or only specific kernel features (trivial passes, grid/dimension-semantics
fail).  Run alone (1-core host!):

    timeout 300 python benchmarks/tpu_pallas_probe.py
"""
from __future__ import annotations

import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def probe(name, fn):
    try:
        out = jax.jit(fn)()
        jax.block_until_ready(out)
        print(f"[probe] {name}: OK {jnp.asarray(out).ravel()[:2]}")
        return True
    except Exception as e:  # noqa: BLE001 — diagnostic script
        msg = str(e).splitlines()[0][:160]
        print(f"[probe] {name}: FAIL {type(e).__name__}: {msg}")
        traceback.print_exc()  # full traceback while the exception is live
        return False


def main():
    print("backend:", jax.default_backend())

    # 0. control: plain XLA matmul
    probe("xla_matmul", lambda: jnp.ones((128, 128)) @ jnp.ones((128, 128)))

    # 1. the most trivial Mosaic kernel: single block, elementwise add
    def add_kernel(x_ref, o_ref):
        o_ref[...] = x_ref[...] + 1.0

    def trivial():
        x = jnp.zeros((8, 128), jnp.float32)
        return pl.pallas_call(
            add_kernel, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32)
        )(x)

    if not probe("pallas_trivial_add", trivial):
        print("[probe] VERDICT: tunnel compile helper rejects ALL Mosaic "
              "payloads — infrastructure, not kernel-specific.")
        return

    # 2. gridded kernel with a block spec (what production kernels use)
    def grid_kernel(x_ref, o_ref):
        o_ref[...] = x_ref[...] * 2.0

    def gridded():
        x = jnp.ones((4, 256, 128), jnp.float32)
        return pl.pallas_call(
            grid_kernel,
            grid=(4,),
            in_specs=[pl.BlockSpec((1, 256, 128), lambda i: (i, 0, 0))],
            out_specs=pl.BlockSpec((1, 256, 128), lambda i: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((4, 256, 128), jnp.float32),
        )(x)

    probe("pallas_gridded", gridded)

    # 3. a dot inside the kernel (MXU path)
    def dot_kernel(a_ref, b_ref, o_ref):
        o_ref[...] = jnp.dot(a_ref[...], b_ref[...],
                             preferred_element_type=jnp.float32)

    def with_dot():
        a = jnp.ones((128, 128), jnp.bfloat16)
        b = jnp.ones((128, 128), jnp.bfloat16)
        return pl.pallas_call(
            dot_kernel,
            out_shape=jax.ShapeDtypeStruct((128, 128), jnp.float32),
        )(a, b)

    probe("pallas_mxu_dot", with_dot)

    # 4. production kernel at tiny shape (upsample fused path)
    try:
        from ganreverser_tpu.ops.upsample_conv_kernel import (
            upsample2_conv3x3_bn_act)
        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, (4, 8, 8, 128), jnp.bfloat16)
        k = jnp.ones((3, 3, 128, 128), jnp.float32) * 0.01
        s = jnp.ones((128,)); b = jnp.zeros((128,))
        probe("upsample_kernel_tiny",
              lambda: upsample2_conv3x3_bn_act(x, k, s, b))
    except Exception as e:  # noqa: BLE001
        print("[probe] upsample_kernel_tiny import/setup failed:", e)


if __name__ == "__main__":
    main()
