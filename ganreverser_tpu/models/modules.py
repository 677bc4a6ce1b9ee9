"""A compact functional NN module system (pure functions over pytrees).

This replaces the reference's ``nn.Sequential`` container stack
(models.lua throughout) with an XLA-friendly design:

* every module is an immutable dataclass with
  ``init(key, in_shape) -> (variables, out_shape)`` and
  ``apply(variables, x, train=..., rng=...) -> (y, new_state)``;
* ``variables = {"params": pytree, "state": pytree}`` — BatchNorm running
  statistics are explicit state threaded through ``apply`` (the reference
  leans on torch's implicit training/evaluate mode flips, train.lua:270-318);
* layout is NHWC (TPU-native); the reference is NCHW;
* shapes are static: ``in_shape`` excludes the batch dimension and is threaded
  at build time, so there is no shape tracing and everything jits cleanly;
* randomness (dropout) flows through an explicit ``rng`` key, split per layer
  with ``fold_in`` — no global RNG;
* there is **no** device-copy shim: the reference wraps every model in
  ``nn.Copy(float, cuda)`` pairs (models.lua:107-108 etc.); on TPU, arrays are
  HBM-resident and placement is handled by jit/shardings.

Compute dtype: modules compute in ``dtype`` (bf16 on TPU for speed) while
parameters stay float32; matmuls/convs accumulate in f32 via
``preferred_element_type``. BatchNorm statistics are always f32.
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from .init import init_dense, init_conv

Shape = Tuple[int, ...]
Variables = dict  # {"params": ..., "state": ...}


def _split(rng: Optional[jax.Array], i: int) -> Optional[jax.Array]:
    return None if rng is None else jax.random.fold_in(rng, i)


@dataclass(frozen=True)
class Module:
    """Base class. Subclasses override init/apply; stateless modules return
    empty dicts for params/state."""

    def init(self, key: jax.Array, in_shape: Shape) -> tuple[Variables, Shape]:
        return {"params": {}, "state": {}}, self.out_shape(in_shape)

    def apply(self, variables: Variables, x: jax.Array, *, train: bool = False,
              rng: Optional[jax.Array] = None):
        raise NotImplementedError

    def out_shape(self, in_shape: Shape) -> Shape:
        return in_shape

    # convenience for whole models
    def init_with_output(self, key, x, **kw):
        variables, _ = self.init(key, tuple(x.shape[1:]))
        y, _ = self.apply(variables, x, **kw)
        return y, variables


# --------------------------------------------------------------------------
# parametric layers
# --------------------------------------------------------------------------

@dataclass(frozen=True)
class Dense(Module):
    """Equivalent of nn.Linear. Weight layout (in, out); torch's is (out, in)
    with fan_in = columns — init formulas receive the same fans either way
    (weight-init.lua:64-65)."""
    features: int
    init_scheme: str = "heuristic"
    init_zero_bias: bool = True
    dtype: Any = jnp.float32

    def out_shape(self, in_shape: Shape) -> Shape:
        return in_shape[:-1] + (self.features,)

    def init(self, key, in_shape):
        fan_in = in_shape[-1]
        params = init_dense(key, fan_in, self.features, self.init_scheme,
                            self.init_zero_bias)
        return {"params": params, "state": {}}, self.out_shape(in_shape)

    def apply(self, variables, x, *, train=False, rng=None):
        p = variables["params"]
        y = jnp.dot(x.astype(self.dtype), p["kernel"].astype(self.dtype),
                    preferred_element_type=jnp.float32)
        y = (y + p["bias"]).astype(self.dtype)
        return y, {}


@dataclass(frozen=True)
class Conv(Module):
    """Equivalent of nn.SpatialConvolution with padding (k-1)/2 (SAME for the
    odd kernels / stride 1 used everywhere in models.lua). NHWC / HWIO."""
    features: int
    kernel: int = 3
    stride: int = 1
    init_scheme: str = "heuristic"
    init_zero_bias: bool = True
    dtype: Any = jnp.float32

    def out_shape(self, in_shape: Shape) -> Shape:
        h, w, _ = in_shape
        return (h // self.stride, w // self.stride, self.features)

    def init(self, key, in_shape):
        in_ch = in_shape[-1]
        params = init_conv(key, in_ch, self.features, self.kernel,
                           self.init_scheme, self.init_zero_bias)
        return {"params": params, "state": {}}, self.out_shape(in_shape)

    def apply(self, variables, x, *, train=False, rng=None):
        from ..ops.precision import conv_f32acc
        p = variables["params"]
        y = conv_f32acc(
            x.astype(self.dtype), p["kernel"].astype(self.dtype),
            (self.stride, self.stride), "SAME", None,
            ("NHWC", "HWIO", "NHWC"))
        y = (y + p["bias"]).astype(self.dtype)
        return y, {}


@dataclass(frozen=True)
class UpsampleConv(Module):
    """Fused nearest-upsample(2x) + 3x3 SAME conv (ops/upsample_conv.py):
    bit-compatible parameters with Conv(features, 3), 2.25x fewer MACs than
    the UpsampleNearest+Conv composition it replaces in G."""
    features: int
    init_scheme: str = "heuristic"
    dtype: Any = jnp.float32
    variant: str = "dilated"  # 'dilated' (one lhs-dilated conv) | 'shuffle'

    def out_shape(self, in_shape: Shape) -> Shape:
        h, w, _ = in_shape
        return (2 * h, 2 * w, self.features)

    def init(self, key, in_shape):
        params = init_conv(key, in_shape[-1], self.features, 3,
                           self.init_scheme)
        return {"params": params, "state": {}}, self.out_shape(in_shape)

    def apply(self, variables, x, *, train=False, rng=None):
        from ..ops.upsample_conv import (upsample2_conv3x3,
                                         upsample2_conv3x3_dilated)
        p = variables["params"]
        fn = (upsample2_conv3x3_dilated if self.variant == "dilated"
              else upsample2_conv3x3)
        return fn(x, p["kernel"], p["bias"], self.dtype), {}


@dataclass(frozen=True)
class BatchNorm(Module):
    """nn.BatchNormalization / nn.SpatialBatchNormalization equivalent.

    Normalizes over all axes but the last (features). Running statistics are
    explicit state; torch semantics: momentum 0.1, eps 1e-5, biased batch
    variance for normalization.
    """
    features: int
    momentum: float = 0.1
    eps: float = 1e-5
    scale_init: str = "ones"  # 'torch' = uniform(0,1), old-torch BN:reset()
    dtype: Any = jnp.float32

    def init(self, key, in_shape):
        f = self.features
        if self.scale_init == "torch":
            scale = jax.random.uniform(key, (f,), jnp.float32)
        else:
            scale = jnp.ones((f,), jnp.float32)
        params = {"scale": scale,
                  "bias": jnp.zeros((f,), jnp.float32)}
        state = {"mean": jnp.zeros((f,), jnp.float32),
                 "var": jnp.ones((f,), jnp.float32)}
        return {"params": params, "state": state}, in_shape

    def apply(self, variables, x, *, train=False, rng=None):
        p, s = variables["params"], variables["state"]
        xf = x.astype(jnp.float32)
        red = tuple(range(x.ndim - 1))
        if train:
            mean = jnp.mean(xf, axis=red)
            var = jnp.var(xf, axis=red)
            m = self.momentum
            # torch: normalize with the biased batch variance but update the
            # running statistic with the UNBIASED estimate
            count = 1
            for d in red:
                count *= x.shape[d]
            unbiased = var * (count / max(count - 1, 1))
            new_state = {"mean": (1 - m) * s["mean"] + m * mean,
                         "var": (1 - m) * s["var"] + m * unbiased}
        else:
            mean, var = s["mean"], s["var"]
            new_state = s
        inv = lax.rsqrt(var + self.eps) * p["scale"]
        y = (xf - mean) * inv + p["bias"]
        return y.astype(self.dtype), new_state


@dataclass(frozen=True)
class PReLU(Module):
    """nn.PReLU() — torch default: ONE shared learnable slope a=0.25
    (used throughout create_D2/create_D_default, models.lua:276,301)."""
    num_parameters: int = 1
    dtype: Any = jnp.float32

    def init(self, key, in_shape):
        params = {"alpha": jnp.full((self.num_parameters,), 0.25, jnp.float32)}
        return {"params": params, "state": {}}, in_shape

    def apply(self, variables, x, *, train=False, rng=None):
        a = variables["params"]["alpha"].astype(x.dtype)
        if self.num_parameters == 1:
            a = a[0]
        return jnp.where(x >= 0, x, a * x), {}


# --------------------------------------------------------------------------
# stateless layers
# --------------------------------------------------------------------------

@dataclass(frozen=True)
class Activation(Module):
    """relu / elu (alpha=1, nn.ELU default) / sigmoid / tanh / leaky_relu."""
    fn: str
    negative_slope: float = 0.333  # nn.LeakyReLU(0.333) in createResidual

    def apply(self, variables, x, *, train=False, rng=None):
        if self.fn == "relu":
            return jax.nn.relu(x), {}
        if self.fn == "elu":
            return jax.nn.elu(x), {}
        if self.fn == "sigmoid":
            return jax.nn.sigmoid(x), {}
        if self.fn == "tanh":
            return jnp.tanh(x), {}
        if self.fn == "leaky_relu":
            return jnp.where(x >= 0, x, self.negative_slope * x), {}
        raise ValueError(self.fn)


@dataclass(frozen=True)
class Dropout(Module):
    """nn.Dropout (p default 0.5). ``always_on=True`` reproduces the fixer-R's
    permanently-active input dropout: the reference forces the layer into
    training mode and no-ops ``evaluate`` (models.lua:399-406) because
    deactivating it 'produced broken images' (README.md:78-79)."""
    rate: float = 0.5
    always_on: bool = False
    # 'threefry': jax.random.bernoulli masks from the layer key (default —
    # the framework's reference stream). 'kernel': in-kernel counter-hash
    # masks (ops/dropout_kernel.py) — no mask tensor ever touches HBM,
    # stream fixed by source (not XLA version); measured motivation in
    # that module's docstring. Falls back to threefry off-TPU (the
    # interpreter is too slow for production) or for shapes the kernel
    # can't tile.
    impl: str = "threefry"

    def apply(self, variables, x, *, train=False, rng=None):
        active = train or self.always_on
        if not active or self.rate == 0.0:
            return x, {}
        if rng is None:
            raise ValueError("Dropout needs an rng key when active")
        if self.impl == "kernel":
            from ..ops import dropout_kernel as dk
            if dk.supports(x.shape) and jax.default_backend() == "tpu":
                return dk.fused_dropout(x, dk.seed_from_key(rng),
                                        self.rate), {}
        keep = 1.0 - self.rate
        mask = jax.random.bernoulli(rng, keep, x.shape)
        return jnp.where(mask, x / keep, 0.0).astype(x.dtype), {}


@dataclass(frozen=True)
class SpatialDropout(Module):
    """nn.SpatialDropout — drops whole feature maps (channels)."""
    rate: float = 0.25

    def apply(self, variables, x, *, train=False, rng=None):
        if not train or self.rate == 0.0:
            return x, {}
        if rng is None:
            raise ValueError("SpatialDropout needs an rng key when active")
        keep = 1.0 - self.rate
        mask_shape = (x.shape[0],) + (1,) * (x.ndim - 2) + (x.shape[-1],)
        mask = jax.random.bernoulli(rng, keep, mask_shape)
        return jnp.where(mask, x / keep, 0.0).astype(x.dtype), {}


@dataclass(frozen=True)
class MaxPool(Module):
    """nn.SpatialMaxPooling(k, k) with stride k (torch default)."""
    window: int = 2

    def out_shape(self, in_shape):
        h, w, c = in_shape
        return (h // self.window, w // self.window, c)

    def apply(self, variables, x, *, train=False, rng=None):
        k = self.window
        y = lax.reduce_window(x, -jnp.inf, lax.max, (1, k, k, 1), (1, k, k, 1),
                              "VALID")
        return y, {}


@dataclass(frozen=True)
class AvgPool(Module):
    """nn.SpatialAveragePooling(k, k, k, k)."""
    window: int = 2

    def out_shape(self, in_shape):
        h, w, c = in_shape
        return (h // self.window, w // self.window, c)

    def apply(self, variables, x, *, train=False, rng=None):
        k = self.window
        y = lax.reduce_window(x.astype(jnp.float32), 0.0, lax.add,
                              (1, k, k, 1), (1, k, k, 1), "VALID")
        return (y / (k * k)).astype(x.dtype), {}


@dataclass(frozen=True)
class UpsampleNearest(Module):
    """nn.SpatialUpSamplingNearest(scale)."""
    scale: int = 2

    def out_shape(self, in_shape):
        h, w, c = in_shape
        return (h * self.scale, w * self.scale, c)

    def apply(self, variables, x, *, train=False, rng=None):
        s = self.scale
        y = jnp.repeat(jnp.repeat(x, s, axis=1), s, axis=2)
        return y, {}


@dataclass(frozen=True)
class Flatten(Module):
    """nn.View(n) collapse to (batch, -1)."""

    def out_shape(self, in_shape):
        n = 1
        for d in in_shape:
            n *= d
        return (n,)

    def apply(self, variables, x, *, train=False, rng=None):
        return x.reshape(x.shape[0], -1), {}


@dataclass(frozen=True)
class Reshape(Module):
    """nn.View/nn.Reshape to a fixed non-batch shape (NHWC order here)."""
    shape: Shape

    def out_shape(self, in_shape):
        return tuple(self.shape)

    def apply(self, variables, x, *, train=False, rng=None):
        return x.reshape((x.shape[0],) + tuple(self.shape)), {}


@dataclass(frozen=True)
class Identity(Module):
    def apply(self, variables, x, *, train=False, rng=None):
        return x, {}


# --------------------------------------------------------------------------
# containers
# --------------------------------------------------------------------------

@dataclass(frozen=True)
class Sequential(Module):
    """nn.Sequential. Params/state keyed 'l<i>' for a stable pytree."""
    layers: Tuple[Module, ...]

    def __init__(self, layers: Sequence[Module]):
        object.__setattr__(self, "layers", tuple(layers))

    def out_shape(self, in_shape):
        s = in_shape
        for m in self.layers:
            s = m.out_shape(s)
        return s

    def init(self, key, in_shape):
        params, state = {}, {}
        s = in_shape
        for i, m in enumerate(self.layers):
            v, s = m.init(jax.random.fold_in(key, i), s)
            if v["params"]:
                params[f"l{i}"] = v["params"]
            if v["state"]:
                state[f"l{i}"] = v["state"]
        return {"params": params, "state": state}, s

    def apply(self, variables, x, *, train=False, rng=None):
        params = variables.get("params", {})
        state = variables.get("state", {})
        new_state = {}
        for i, m in enumerate(self.layers):
            v = {"params": params.get(f"l{i}", {}),
                 "state": state.get(f"l{i}", {})}
            x, ns = m.apply(v, x, train=train, rng=_split(rng, i))
            if ns:
                new_state[f"l{i}"] = ns
        return x, new_state


@dataclass(frozen=True)
class ConcatBranches(Module):
    """nn.Concat(2): run branches on the same input, concat on features
    (channel axis in torch == last axis in NHWC). Used by create_D2's
    left/right split (models.lua:293-321) and create_G4's 32 branches."""
    branches: Tuple[Module, ...]

    def __init__(self, branches: Sequence[Module]):
        object.__setattr__(self, "branches", tuple(branches))

    def out_shape(self, in_shape):
        shapes = [b.out_shape(in_shape) for b in self.branches]
        lead = shapes[0][:-1]
        return lead + (sum(s[-1] for s in shapes),)

    def init(self, key, in_shape):
        params, state = {}, {}
        for i, b in enumerate(self.branches):
            v, _ = b.init(jax.random.fold_in(key, i), in_shape)
            if v["params"]:
                params[f"b{i}"] = v["params"]
            if v["state"]:
                state[f"b{i}"] = v["state"]
        return {"params": params, "state": state}, self.out_shape(in_shape)

    def apply(self, variables, x, *, train=False, rng=None):
        params = variables.get("params", {})
        state = variables.get("state", {})
        outs, new_state = [], {}
        for i, b in enumerate(self.branches):
            v = {"params": params.get(f"b{i}", {}),
                 "state": state.get(f"b{i}", {})}
            y, ns = b.apply(v, x, train=train, rng=_split(rng, i))
            outs.append(y)
            if ns:
                new_state[f"b{i}"] = ns
        return jnp.concatenate(outs, axis=-1), new_state


@dataclass(frozen=True)
class Residual(Module):
    """models.createResidual (models.lua:8-55): inner path + shortcut, summed.
    Shortcut is Identity when channel counts match, else a 1x1-conv reducer."""
    inner: Module
    shortcut: Module

    def init(self, key, in_shape):
        vi, out_shape = self.inner.init(jax.random.fold_in(key, 0), in_shape)
        vs, _ = self.shortcut.init(jax.random.fold_in(key, 1), in_shape)
        params = {"inner": vi["params"], "shortcut": vs["params"]}
        state = {}
        if vi["state"]:
            state["inner"] = vi["state"]
        if vs["state"]:
            state["shortcut"] = vs["state"]
        return {"params": params, "state": state}, out_shape

    def apply(self, variables, x, *, train=False, rng=None):
        p = variables.get("params", {})
        s = variables.get("state", {})
        yi, nsi = self.inner.apply(
            {"params": p.get("inner", {}), "state": s.get("inner", {})},
            x, train=train, rng=_split(rng, 0))
        ys, nss = self.shortcut.apply(
            {"params": p.get("shortcut", {}), "state": s.get("shortcut", {})},
            x, train=train, rng=_split(rng, 1))
        new_state = {}
        if nsi:
            new_state["inner"] = nsi
        if nss:
            new_state["shortcut"] = nss
        return yi + ys, new_state


def count_parameters(params) -> int:
    """NN_UTILS.getNumberOfParameters equivalent — but counts *all* learnable
    leaves; the reference counts only `.weight` tensors (nn_utils.lua:417-426)."""
    return sum(int(x.size) for x in jax.tree_util.tree_leaves(params))


def count_weight_parameters(params) -> int:
    """Exact reference semantics: only weight/kernel/scale matrices, no biases
    (nn_utils.lua:417-426 counts modules' `.weight` only — which includes
    BatchNorm scale and PReLU alpha in torch)."""
    total = 0
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        name = str(path[-1])
        if any(k in name for k in ("kernel", "scale", "alpha")):
            total += int(leaf.size)
    return total
