"""Weight initialization — the four schemes of weight-init.lua, plus the
torch default resets the reference *actually* leaves in place.

Each scheme returns the half-width ``std`` of a uniform(-std, std) draw,
matching torch's ``m:reset(std)`` (weight-init.lua:40-75, vendored there
from e-lab torch-toolbox). Biases are zeroed (weight-init.lua:70-72).

Fans (weight-init.lua:54-65):
  conv:   fan_in = in_ch*kh*kw, fan_out = out_ch*kh*kw
  linear: fan_in = in_features, fan_out = out_features

Reference init quirks (reproduced by zoo.py's ``init="torch"`` mode):
w_init matches modules by ``__typename`` STRING EQUALITY on 'nn.*' names
(weight-init.lua:52-68) and iterates only TOP-LEVEL ``net.modules`` — so
  * every ``cudnn.SpatialConvolution`` (all of G3/G4/G_encoder/residual,
    models.lua:122,128,132,168,178,183,25-47) is NEVER re-initialized by the
    scheme: it keeps torch's default reset, uniform(±1/sqrt(kW*kH*nIn));
    only its bias is zeroed (the ``if m.bias`` branch) when top-level;
  * convs/linears nested inside sub-Sequentials/Concat branches (D2's
    createNxN blocks and left/right branches, models.lua:283-321; G4's 32
    branches, models.lua:159-171) keep torch defaults INCLUDING the
    uniform(±1/sqrt(fan_in)) bias;
  * BatchNorm keeps torch's default reset everywhere: weight ~ uniform(0,1),
    bias 0 (old-torch nn.BatchNormalization:reset()).
The default ``init="heuristic"`` applies the scheme uniformly with zero
biases — a deliberate, documented cleanup of that accident (PARITY.md).
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def scheme_std(scheme: str, fan_in: int, fan_out: int) -> float:
    if scheme == "heuristic":      # LeCun'98 "Efficient backprop" (l.14-16)
        return math.sqrt(1.0 / (3.0 * fan_in))
    if scheme == "xavier":         # Glorot 2010 (l.21-23)
        return math.sqrt(2.0 / (fan_in + fan_out))
    if scheme == "xavier_caffe":   # (l.28-30)
        return math.sqrt(1.0 / fan_in)
    if scheme == "kaiming":        # He 2015 (l.35-37)
        return math.sqrt(4.0 / (fan_in + fan_out))
    if scheme == "torch_default":  # torch nn reset(): 1/sqrt(fan_in)
        return math.sqrt(1.0 / fan_in)
    raise ValueError(f"Unknown init scheme {scheme!r}")


def init_dense(key, fan_in: int, fan_out: int, scheme: str = "heuristic",
               zero_bias: bool = True):
    std = scheme_std(scheme, fan_in, fan_out)
    # zero_bias (the default) draws the kernel straight from ``key`` —
    # keep that stream stable, goldens pin it (tests/test_goldens.py)
    k_w, k_b = (key, None) if zero_bias else jax.random.split(key)
    kernel = jax.random.uniform(k_w, (fan_in, fan_out), jnp.float32, -std, std)
    bias = (jnp.zeros((fan_out,), jnp.float32) if zero_bias else
            jax.random.uniform(k_b, (fan_out,), jnp.float32, -std, std))
    return {"kernel": kernel, "bias": bias}


def init_conv(key, in_ch: int, out_ch: int, k: int, scheme: str = "heuristic",
              zero_bias: bool = True):
    std = scheme_std(scheme, in_ch * k * k, out_ch * k * k)
    k_w, k_b = (key, None) if zero_bias else jax.random.split(key)
    kernel = jax.random.uniform(k_w, (k, k, in_ch, out_ch), jnp.float32,
                                -std, std)
    bias = (jnp.zeros((out_ch,), jnp.float32) if zero_bias else
            jax.random.uniform(k_b, (out_ch,), jnp.float32, -std, std))
    return {"kernel": kernel, "bias": bias}
