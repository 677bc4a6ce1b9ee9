"""Reverser training — the train_r.lua loop, as one jitted device program.

R trains on purely synthetic pairs: z ~ noise, images = G(z) with G frozen in
eval mode, loss = MSE(R(images), z) (train_r.lua:138-168). The whole step
(noise sampling -> G forward -> R forward/backward -> adam -> clamp) compiles
to a single XLA program; nothing touches the host.

Reference details preserved: adam optimizer (train_r.lua:170), L1/L2 penalty
then clamp to ±R_clamp (train_r.lua:160-166, defaults L2=1e-4, clamp=1).
"""
from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from ..core.prng import noise_inputs
from ..models.modules import Module
from ..optim import Optimizer, adam, apply_updates, regularize
from .losses import mse
from .state import TrainState, merge_state


def make_r_train_step(G: Module, R: Module, *, batch_size: int,
                      noise_dim: int, noise_method: str,
                      r_l1: float = 0.0, r_l2: float = 1e-4,
                      r_clamp: float = 1.0,
                      opt: Optional[Optimizer] = None,
                      donate: bool = False, mesh=None) -> Callable:
    """Returns jitted ``step(g_variables, r_ts, key) -> (r_ts, loss)``.

    ``mesh``: when given, the synthetic batch sampled INSIDE the step is
    sharding-constrained over the 'data' axis — without the constraint XLA
    compiles the whole step replicated (the noise has no sharded ancestor).
    """
    opt = opt or adam()

    def _shard(x):
        if mesh is None:
            return x
        from ..parallel.mesh import data_sharding
        return jax.lax.with_sharding_constraint(
            x, data_sharding(mesh, x.ndim))

    def loss_fn(r_params, r_state, images, z, rng):
        out, new_state = R.apply({"params": r_params, "state": r_state},
                                 images, train=True, rng=rng)
        return mse(out, z), new_state

    def step(g_variables, ts: TrainState, key):
        k_noise, k_drop = jax.random.split(key)
        z = _shard(noise_inputs(k_noise, batch_size, noise_dim,
                                noise_method))
        # frozen G, eval mode (train_r.lua:69 MODEL_G:evaluate())
        images, _ = G.apply(g_variables, z, train=False)
        images = _shard(images)
        (loss, new_state), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            ts.params, ts.state, images, z, k_drop)
        grads, loss = regularize(ts.params, grads, loss, r_l1, r_l2, r_clamp)
        updates, opt_state = opt.update(grads, ts.opt_state, ts.params)
        params = apply_updates(ts.params, updates)
        new_ts = TrainState(params=params,
                            state=merge_state(ts.state, new_state),
                            opt_state=opt_state, step=ts.step + 1)
        return new_ts, loss

    donate_argnums = (1,) if donate else ()
    jitted = jax.jit(step, donate_argnums=donate_argnums)
    jitted.raw = step
    return jitted


def make_r_segment_program(G: Module, R: Module, *, batch_size: int,
                           noise_dim: int, noise_method: str,
                           n_batches: int, donate: bool = True,
                           mesh=None, **penalties) -> Callable:
    """``n_batches`` R train steps as ONE jitted ``lax.scan`` program.

    The reference's loop (train_r.lua:131-225) is per-batch host-driven;
    train_r's CLI previously dispatched one program per batch AND fetched
    the loss scalar each time — two ~28 ms round trips per batch on the
    tunnel. This compiles a whole segment (e.g. the 100-batch print cadence)
    into one dispatch returning the per-batch loss vector, so the low/avg/
    high records (train_r.lua:192-205) are computed from one fetch.

    Returns jitted ``segment(g_variables, ts, key) -> (ts, losses[n])``.
    """
    step = make_r_train_step(G, R, batch_size=batch_size,
                             noise_dim=noise_dim, noise_method=noise_method,
                             mesh=mesh, **penalties).raw

    def segment(g_variables, ts: TrainState, key):
        def body(ts, k):
            ts, loss = step(g_variables, ts, k)
            return ts, loss

        keys = jax.random.split(key, n_batches)
        return jax.lax.scan(body, ts, keys)

    return jax.jit(segment, donate_argnums=(1,) if donate else ())


def calibrate_batchnorm(model: Module, variables: dict, inputs_fn,
                        key, n_batches: int = 50) -> dict:
    """Run train-mode forwards to settle BatchNorm running statistics.

    A freshly initialized G has mean=0/var=1 running stats, so eval-mode
    outputs are degenerate until stats are warmed. The reference never needs
    this because torch updates running stats on every training forward; here
    it's explicit. ``inputs_fn(key) -> batch``.
    """
    @jax.jit
    def step(vars_, k):
        x = inputs_fn(k)
        _, new_state = model.apply(vars_, x, train=True, rng=k)
        from .state import merge_state as _ms
        return {"params": vars_["params"],
                "state": _ms(vars_["state"], new_state)}

    for i in range(n_batches):
        variables = step(variables, jax.random.fold_in(key, i))
    return variables


def make_r_eval_step(R: Module, *, fixer: bool = False) -> Callable:
    """Jitted batched inversion: images -> recovered z.

    The fixer-R still needs an rng (always-on dropout, models.lua:399-406);
    the plain R is deterministic in eval.
    """
    if fixer:
        def step(r_variables, images, key):
            out, _ = R.apply(r_variables, images, train=False, rng=key)
            return out
    else:
        def step(r_variables, images):
            out, _ = R.apply(r_variables, images, train=False)
            return out
    return jax.jit(step)
