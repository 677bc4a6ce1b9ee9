"""Pallas TPU kernel: dropout with in-kernel counter-hash masks.

Why this exists (RESULTS.md round-3 ablation): R's seven dropout layers
(/root/reference/models.lua:409-451) cost the default R training step 13.4
of 40.2 ms at the flagship shape — threefry mask generation alone is a
third of the step — and the measured no-dropout floor is 22.8 ms. The
`--prng rbg` option (XLA's RngBitGenerator) recovers 1.50x but still (a)
materializes a full-size mask tensor in HBM and (b) reads it back for the
`where`. This kernel closes both gaps: each element's random bits are a
murmur3-finalizer hash of its own global index and the seed, computed
*inside* the apply pass — the whole op is one HBM read of x + one HBM
write of y, zero mask traffic, and ~9 VPU integer ops per element (vs
threefry's ~50 — and unlike both threefry-via-XLA and rbg, nothing
round-trips through HBM).

Gradient: dropout is linear in x for a fixed mask, and the counter hash is
a pure function of (seed, element index), so the backward pass REGENERATES
the identical mask from the saved int32 seed instead of storing it — a
custom_vjp whose residual is one scalar.

Determinism: stronger than `--prng rbg` — the stream is fixed by this
source file, not by the XLA version or backend (the same property that
makes the interpret-mode CPU tests exact). It is merely a *different*
deterministic stream than the default threefry masks, hence the opt-in
`--dropout kernel` on train_r rather than a silent default swap.

The TPU hardware PRNG (pltpu.prng_seed/prng_random_bits) was considered
and rejected: its stream is unstable across compiler versions AND the
Mosaic interpreter stubs it to zeros, making CPU parity tests impossible.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_COLS = 1024  # flat view width: 8x the 128-lane width, any dtype tiles


def _hash_bits(shape, seed_u32, row_offset_u32):
    """murmur3 fmix32 of (global element index ^ golden-ratio-mixed seed).
    Full avalanche — every output bit depends on every input bit; standard
    counter-based RNG construction (Philox/threefry's cheap cousin)."""
    r = jax.lax.broadcasted_iota(jnp.uint32, shape, 0)
    c = jax.lax.broadcasted_iota(jnp.uint32, shape, 1)
    h = (row_offset_u32 + r) * jnp.uint32(_COLS) + c
    h = h ^ (seed_u32 * jnp.uint32(0x9E3779B9))
    h = h ^ (h >> 16)
    h = h * jnp.uint32(0x85EBCA6B)
    h = h ^ (h >> 13)
    h = h * jnp.uint32(0xC2B2AE35)
    h = h ^ (h >> 16)
    return h


def _kernel(seed_ref, x_ref, o_ref, *, thresh, inv_keep, tile_r):
    """One (TILE_R, _COLS) tile: hash per-element bits, keep lanes with
    bits < thresh (P = keep), scale survivors by 1/keep."""
    seed = seed_ref[0].astype(jnp.uint32)
    row0 = (pl.program_id(0) * tile_r).astype(jnp.uint32)
    bits = _hash_bits(x_ref.shape, seed, row0)
    keep = bits < jnp.uint32(thresh)
    y = jnp.where(keep, x_ref[:].astype(jnp.float32) * inv_keep, 0.0)
    o_ref[:] = y.astype(o_ref.dtype)


def _run(x: jax.Array, seed: jax.Array, rate: float,
         interpret=None) -> jax.Array:
    """The raw kernel launch: x of any shape with size % (8 * _COLS) == 0
    (checked by the caller), seed an int32 scalar."""
    from .topk_kernel import _auto_interpret
    interpret = _auto_interpret(interpret)
    keep = 1.0 - rate
    # P(bits < thresh) = keep for uint32 bits; round-to-nearest of the
    # 2^32 scaling keeps the bias below 2^-32
    thresh = min(int(round(keep * 4294967296.0)), 4294967295)
    flat = x.reshape(-1, _COLS)
    rows = flat.shape[0]
    tile_r = next(t for t in (512, 256, 128, 64, 32, 16, 8) if rows % t == 0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(rows // tile_r,),
        in_specs=[pl.BlockSpec((tile_r, _COLS), lambda i, _s: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((tile_r, _COLS), lambda i, _s: (i, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        functools.partial(_kernel, thresh=thresh, inv_keep=1.0 / keep,
                          tile_r=tile_r),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(flat.shape, x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(seed.reshape(1).astype(jnp.int32), flat)
    return out.reshape(x.shape)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def fused_dropout(x: jax.Array, seed: jax.Array, rate: float) -> jax.Array:
    """Dropout(rate) with in-kernel counter-hash masks.

    ``seed``: int32 scalar (derive per call site, e.g. from the layer's
    PRNG key via ``seed_from_key``). Forward and backward regenerate the
    SAME mask from it — nothing else is stored.
    """
    return _run(x, seed, rate)


def _fwd(x, seed, rate):
    return _run(x, seed, rate), seed


def _bwd(rate, seed, g):
    # mask-regenerating backward: identical (seed, index) -> identical bits
    return _run(g, seed, rate), None


fused_dropout.defvjp(_fwd, _bwd)


def supports(shape, dtype=None) -> bool:
    """True when the flat (rows, 1024) view exists with >= 8 rows — the
    caller falls back to the threefry/bernoulli path otherwise."""
    size = 1
    for d in shape:
        size *= int(d)
    return size % (8 * _COLS) == 0


def seed_from_key(key: jax.Array) -> jax.Array:
    """An int32 scalar from a JAX PRNG key WITHOUT running the key's hash:
    the raw key words are already uniformly distributed, so xor-folding
    them is free (vs a threefry call for random.bits) and per-layer keys
    (split/fold_in products) stay decorrelated."""
    raw = key
    if jnp.issubdtype(raw.dtype, jax.dtypes.prng_key):
        raw = jax.random.key_data(raw)
    raw = raw.reshape(-1).astype(jnp.uint32)
    folded = raw[0]
    for i in range(1, raw.shape[0]):
        folded = folded ^ raw[i]
    return jax.lax.bitcast_convert_type(folded, jnp.int32)
