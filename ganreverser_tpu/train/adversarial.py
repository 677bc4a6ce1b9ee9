"""Adversarial G/D training — adversarial.lua rebuilt as two jitted steps.

Reference semantics preserved (adversarial.lua:37-205):
* D batch = half real (sequential from the epoch's data) + half fake from G
  (adversarial.lua:127-145); labels Y_GENERATOR=0 / Y_NOT_GENERATOR=1
  (train.lua:67-68).
* G loss is the *non-saturating* form: fresh noise, targets=1
  (adversarial.lua:171-172); D is forwarded in training mode but its
  parameters are not updated in the G step (the reference reads the gradient
  at D's input, adversarial.lua:111 — here: grad w.r.t. G params only).
* G runs in training mode when producing D's fake half, so its BatchNorm
  running stats update from that forward (torch modules default to training
  mode; train.lua never calls evaluate during training).
* L1/L2 penalty then clamp, per network (adversarial.lua:78-80,116-118;
  defaults D_clamp=1, G_clamp=5, D_L2=1e-4).
* Confusion-matrix counts (optim.ConfusionMatrix equivalent) accumulate
  (prediction>0.5) vs target (adversarial.lua:82-87).
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.prng import noise_inputs
from ..models.modules import Module
from ..optim import Optimizer, apply_updates, make_optimizer, regularize
from .losses import bce
from .state import GanState, TrainState, merge_state

Y_GENERATOR = 0.0
Y_NOT_GENERATOR = 1.0


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class Confusion:
    """2x2 confusion counts: [actual 0/1, predicted 0/1]
    (optim.ConfusionMatrix, adversarial.lua:82-87,199-203)."""
    counts: jax.Array

    @classmethod
    def zero(cls):
        return cls(counts=jnp.zeros((2, 2), jnp.int32))

    def add_batch(self, outputs, targets):
        pred = (outputs > 0.5).astype(jnp.int32)
        tgt = targets.astype(jnp.int32)
        idx = tgt * 2 + pred
        counts = self.counts + jnp.bincount(idx, length=4).reshape(2, 2)
        return Confusion(counts=counts)

    @property
    def total_valid(self):
        """CONFUSION.totalValid — overall accuracy (adversarial.lua:201)."""
        c = self.counts.astype(jnp.float32)
        return (c[0, 0] + c[1, 1]) / jnp.maximum(jnp.sum(c), 1.0)

    def render(self) -> str:
        """Printable matrix like optim.ConfusionMatrix (adversarial.lua:200).
        Rows = actual class (0=generated, 1=real), columns = predicted."""
        c = np.asarray(jax.device_get(self.counts))
        tv = float(self.total_valid)
        return ("ConfusionMatrix:\n"
                f"  [[{c[0, 0]:6d} {c[0, 1]:6d}]   0 (generated)\n"
                f"   [{c[1, 0]:6d} {c[1, 1]:6d}]]  1 (real)\n"
                f"  accuracy (totalValid): {tv:.4f}")


def make_adversarial_steps(G: Module, D: Module, *, batch_size: int,
                           noise_dim: int, noise_method: str,
                           d_l1: float = 0.0, d_l2: float = 1e-4,
                           g_l1: float = 0.0, g_l2: float = 0.0,
                           d_clamp: float = 1.0, g_clamp: float = 5.0,
                           d_optimizer: Optional[Optimizer] = None,
                           g_optimizer: Optional[Optimizer] = None,
                           donate: bool = False, mesh=None):
    """Returns jitted ``(d_step, g_step)``.

    d_step(gs, real_half, confusion, key) -> (gs, confusion, d_loss)
    g_step(gs, key) -> (gs, g_loss)

    ``mesh``: shard the in-step noise batches over the 'data' axis (without
    the constraint, G's update — whose batch is sampled inside the jit —
    compiles fully replicated; D gets its sharding from the real-half input).
    """
    d_opt = d_optimizer or make_optimizer("adam")
    g_opt = g_optimizer or make_optimizer("adam")
    half = batch_size // 2

    def _shard(x):
        if mesh is None:
            return x
        from ..parallel.mesh import data_sharding
        return jax.lax.with_sharding_constraint(
            x, data_sharding(mesh, x.ndim))

    def d_loss_fn(d_params, d_state, inputs, targets, rng):
        out, new_state = D.apply({"params": d_params, "state": d_state},
                                 inputs, train=True, rng=rng)
        out = out.reshape(-1)
        return bce(out, targets), (new_state, out)

    def d_step(gs: GanState, real_half, confusion: Confusion, key):
        k_noise, k_gdrop, k_ddrop = jax.random.split(key, 3)
        z = _shard(noise_inputs(k_noise, half, noise_dim, noise_method))
        # fake half from G in training mode (updates G's BN running stats,
        # no G parameter gradient) — adversarial.lua:140 / NN_UTILS.createImages
        fakes, g_new_state = G.apply(gs.g.variables, z, train=True,
                                     rng=k_gdrop)
        inputs = jnp.concatenate(
            [real_half.astype(fakes.dtype), jax.lax.stop_gradient(fakes)], 0)
        targets = jnp.concatenate(
            [jnp.full((half,), Y_NOT_GENERATOR, jnp.float32),
             jnp.full((half,), Y_GENERATOR, jnp.float32)], 0)

        (loss, (d_new_state, out)), grads = jax.value_and_grad(
            d_loss_fn, has_aux=True)(gs.d.params, gs.d.state, inputs,
                                     targets, k_ddrop)
        grads, loss = regularize(gs.d.params, grads, loss, d_l1, d_l2,
                                 d_clamp)
        updates, opt_state = d_opt.update(grads, gs.d.opt_state, gs.d.params)
        d = TrainState(params=apply_updates(gs.d.params, updates),
                       state=merge_state(gs.d.state, d_new_state),
                       opt_state=opt_state, step=gs.d.step + 1)
        g = dataclasses.replace(gs.g, state=merge_state(gs.g.state,
                                                        g_new_state))
        confusion = confusion.add_batch(out, targets)
        return GanState(g=g, d=d), confusion, loss

    def g_loss_fn(g_params, g_state, d_variables, z, rng_g, rng_d):
        imgs, g_new_state = G.apply({"params": g_params, "state": g_state},
                                    z, train=True, rng=rng_g)
        # D in training mode (dropout active) but parameters frozen:
        # equivalent to the reference's read of D.modules[1].gradInput
        # (adversarial.lua:104-114)
        out, d_new_state = D.apply(jax.lax.stop_gradient(d_variables),
                                   imgs, train=True, rng=rng_d)
        out = out.reshape(-1)
        targets = jnp.full_like(out, Y_NOT_GENERATOR)  # adversarial.lua:172
        return bce(out, targets), (g_new_state, d_new_state)

    def g_step(gs: GanState, key):
        k_noise, k_gdrop, k_ddrop = jax.random.split(key, 3)
        z = _shard(noise_inputs(k_noise, batch_size, noise_dim,
                                noise_method))
        (loss, (g_new_state, d_new_state)), grads = jax.value_and_grad(
            g_loss_fn, has_aux=True)(gs.g.params, gs.g.state, gs.d.variables,
                                     z, k_gdrop, k_ddrop)
        grads, loss = regularize(gs.g.params, grads, loss, g_l1, g_l2,
                                 g_clamp)
        updates, opt_state = g_opt.update(grads, gs.g.opt_state, gs.g.params)
        g = TrainState(params=apply_updates(gs.g.params, updates),
                       state=merge_state(gs.g.state, g_new_state),
                       opt_state=opt_state, step=gs.g.step + 1)
        d = dataclasses.replace(gs.d, state=merge_state(gs.d.state,
                                                        d_new_state))
        return GanState(g=g, d=d), loss

    donate_argnums = (0,) if donate else ()
    d_jit = jax.jit(d_step, donate_argnums=donate_argnums)
    g_jit = jax.jit(g_step, donate_argnums=donate_argnums)
    # raw (unjitted) bodies for composition into the single-scan epoch
    d_jit.raw, g_jit.raw = d_step, g_step
    return d_jit, g_jit


def make_epoch_program(G: Module, D: Module, *, batch_size: int,
                       noise_dim: int, noise_method: str, n_batches: int,
                       d_iterations: int = 1, g_iterations: int = 1,
                       mesh=None, donate: bool = True, **penalties):
    """The WHOLE epoch as one jitted ``lax.scan`` program.

    The reference's epoch is a host-driven loop of per-batch closures
    (adversarial.lua:52-195); `train_epoch` mirrors that shape with 2+
    device dispatches per batch — ~60 round trips per default epoch, real
    latency on a high-RTT link (the axon tunnel's ~28 ms). Here the batch
    loop is `lax.scan` inside ONE compiled program: a single dispatch per
    epoch, with the D/G alternation order, sequential real-half consumption
    (modulo wraparound like the exampleForDIdx cursor, adversarial.lua:
    129-137), and confusion accumulation all preserved.

    Returns jitted ``epoch(gs, confusion, train_data, key) ->
    (gs, confusion, (d_losses, g_losses))`` where ``train_data`` holds at
    least one image and losses have shape (n_batches*{d,g}_iterations,).
    """
    d_step, g_step = make_adversarial_steps(
        G, D, batch_size=batch_size, noise_dim=noise_dim,
        noise_method=noise_method, mesh=mesh, **penalties)
    d_body, g_body = d_step.raw, g_step.raw
    half = batch_size // 2
    need = n_batches * d_iterations * half

    def epoch(gs: GanState, confusion: Confusion, train_data, key):
        n_data = train_data.shape[0]
        # sequential consumption with wraparound, gathered ONCE:
        # identical order to the reference's per-batch cursor
        idx = jnp.arange(need, dtype=jnp.int32) % n_data
        reals = train_data[idx].reshape(
            (n_batches, d_iterations, half) + train_data.shape[1:])
        keys = jax.random.split(key, n_batches)

        def body(carry, xs):
            gs, confusion = carry
            batch_reals, k = xs
            d_losses = []
            for i in range(d_iterations):
                gs, confusion, d_loss = d_body(
                    gs, batch_reals[i], confusion,
                    jax.random.fold_in(k, i))
                d_losses.append(d_loss)
            g_losses = []
            for j in range(g_iterations):
                gs, g_loss = g_body(gs, jax.random.fold_in(k, 1000 + j))
                g_losses.append(g_loss)
            return (gs, confusion), (jnp.stack(d_losses),
                                     jnp.stack(g_losses))

        (gs, confusion), (d_losses, g_losses) = jax.lax.scan(
            body, (gs, confusion), (reals, keys))
        return gs, confusion, (d_losses.reshape(-1), g_losses.reshape(-1))

    return jax.jit(epoch, donate_argnums=(0, 1) if donate else ())


def train_epoch(d_step, g_step, gs: GanState, train_data, key, *,
                batch_size: int, n_batches: int, d_iterations: int = 1,
                g_iterations: int = 1, should_stop=None):
    """One epoch — the adversarial.train driver loop (adversarial.lua:52-195).

    ``train_data``: (N, H, W, C) device array; real halves are consumed
    sequentially like the reference's exampleForDIdx cursor
    (adversarial.lua:129-137). ``should_stop``: optional callable checked
    between batches (preemption guard) — the epoch ends early when true.
    """
    half = batch_size // 2
    confusion = Confusion.zero()
    cursor = 0
    n_data = train_data.shape[0]
    d_losses, g_losses = [], []
    for batch_idx in range(n_batches):
        if should_stop is not None and should_stop():
            break
        for k in range(d_iterations):
            idx = (cursor + jnp.arange(half)) % n_data
            real_half = train_data[idx]
            cursor += half
            key, sub = jax.random.split(key)
            gs, confusion, d_loss = d_step(gs, real_half, confusion, sub)
            d_losses.append(d_loss)
        for k in range(g_iterations):
            key, sub = jax.random.split(key)
            gs, g_loss = g_step(gs, sub)
            g_losses.append(g_loss)
    if not d_losses:  # preempted before the first batch
        d_losses = [jnp.zeros(())]
        g_losses = [jnp.zeros(())]
    return gs, confusion, (jnp.stack(d_losses), jnp.stack(g_losses))
