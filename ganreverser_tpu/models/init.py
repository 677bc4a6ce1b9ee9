"""Weight initialization — the four schemes of weight-init.lua.

Each returns the half-width ``std`` of a uniform(-std, std) draw, matching
torch's ``m:reset(std)`` (weight-init.lua:40-75, vendored there from e-lab
torch-toolbox). Biases are zeroed (weight-init.lua:70-72).

Fans (weight-init.lua:54-65):
  conv:   fan_in = in_ch*kh*kw, fan_out = out_ch*kh*kw
  linear: fan_in = in_features, fan_out = out_features
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
    raise ValueError(f"Unknown init scheme {scheme!r}")


def init_dense(key, fan_in: int, fan_out: int, scheme: str = "heuristic"):
    std = scheme_std(scheme, fan_in, fan_out)
    kernel = jax.random.uniform(key, (fan_in, fan_out), jnp.float32, -std, std)
    return {"kernel": kernel, "bias": jnp.zeros((fan_out,), jnp.float32)}


def init_conv(key, in_ch: int, out_ch: int, k: int, scheme: str = "heuristic"):
    std = scheme_std(scheme, in_ch * k * k, out_ch * k * k)
    kernel = jax.random.uniform(key, (k, k, in_ch, out_ch), jnp.float32,
                                -std, std)
    return {"kernel": kernel, "bias": jnp.zeros((out_ch,), jnp.float32)}
