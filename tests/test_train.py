"""Training-loop tests (SURVEY.md §4): R slice learns, adversarial step runs
with correct label conventions, losses finite, clamp behavior."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ganreverser_tpu import models as M
from ganreverser_tpu import optim as O
from ganreverser_tpu import train as T
from ganreverser_tpu.core.prng import noise_inputs, seed_key

DIMS = (1, 8, 8)   # tiny grayscale for CPU speed
ND = 8
BATCH = 16


@pytest.fixture(scope="module")
def g_and_r():
    key = seed_key(0)
    G = M.create_G(DIMS, ND)
    R = M.create_R(DIMS, ND, "normal")
    g_vars, _ = G.init(jax.random.fold_in(key, 1), (ND,))
    r_vars, _ = R.init(jax.random.fold_in(key, 2), (8, 8, 1))
    # settle G's BatchNorm running stats so eval-mode G(z) varies with z
    # (an untrained G has degenerate init stats; a trained one would not)
    g_vars = T.calibrate_batchnorm(
        G, g_vars, lambda k: noise_inputs(k, BATCH, ND, "normal"),
        jax.random.fold_in(key, 3), n_batches=40)
    return G, R, g_vars, r_vars


def test_r_training_reduces_loss(g_and_r):
    """The minimum end-to-end slice: z -> G -> R -> MSE(ẑ, z) on synthetic
    pairs only (train_r.lua:138-139: no dataset use). Eval-mode MSE must
    drop below the trivial predict-zero loss (=Var[z]=1)."""
    G, R, g_vars, r_vars = g_and_r
    step = T.make_r_train_step(G, R, batch_size=BATCH, noise_dim=ND,
                               noise_method="normal")
    ev = T.make_r_eval_step(R)

    def eval_mse(ts):
        z = noise_inputs(seed_key(99), 128, ND, "normal")
        imgs, _ = jax.jit(lambda v, z: G.apply(v, z))(g_vars, z)
        zhat = ev({"params": ts.params, "state": ts.state}, imgs)
        return float(jnp.mean((zhat - z) ** 2))

    ts = T.TrainState.create(r_vars, O.adam())
    loss0 = eval_mse(ts)
    key = seed_key(1)
    for i in range(150):
        key, sub = jax.random.split(key)
        ts, loss = step(g_vars, ts, sub)
        assert np.isfinite(float(loss))
    loss1 = eval_mse(ts)
    assert loss1 < loss0
    assert loss1 < 0.95  # better than predicting the mean
    assert int(ts.step) == 150


def test_r_eval_deterministic(g_and_r):
    G, R, g_vars, r_vars = g_and_r
    ev = T.make_r_eval_step(R)
    x = jnp.ones((4, 8, 8, 1)) * 0.5
    a = ev(r_vars, x)
    b = ev(r_vars, x)
    assert a.shape == (4, ND)
    assert np.allclose(np.asarray(a), np.asarray(b))


def test_adversarial_steps():
    key = seed_key(2)
    G = M.create_G(DIMS, ND)
    D = M.create_D(DIMS)
    g_vars, _ = G.init(jax.random.fold_in(key, 1), (ND,))
    d_vars, _ = D.init(jax.random.fold_in(key, 2), (8, 8, 1))
    gs = T.GanState(g=T.TrainState.create(g_vars, O.adam()),
                    d=T.TrainState.create(d_vars, O.adam()))
    d_step, g_step = T.make_adversarial_steps(
        G, D, batch_size=BATCH, noise_dim=ND, noise_method="normal")

    data = jax.random.uniform(jax.random.fold_in(key, 3), (64, 8, 8, 1))
    gs2, confusion, (d_losses, g_losses) = T.train_epoch(
        d_step, g_step, gs, data, jax.random.fold_in(key, 4),
        batch_size=BATCH, n_batches=3)
    assert np.isfinite(np.asarray(d_losses)).all()
    assert np.isfinite(np.asarray(g_losses)).all()
    assert int(gs2.d.step) == 3 and int(gs2.g.step) == 3
    # confusion accumulated over D batches: 3 batches × BATCH examples
    assert int(jnp.sum(confusion.counts)) == 3 * BATCH
    tv = float(confusion.total_valid)
    assert 0.0 <= tv <= 1.0
    # params actually moved
    moved = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), gs.g.params, gs2.g.params)
    assert max(jax.tree_util.tree_leaves(moved)) > 0


def test_r_segment_program():
    """make_r_segment_program: n R train steps as one scan — step count
    advances by n, per-batch losses returned, loss decreases vs start."""
    key = seed_key(7)
    G = M.create_G(DIMS, ND)
    R = M.create_R(DIMS, ND, "normal")
    g_vars, _ = G.init(jax.random.fold_in(key, 1), (ND,))
    r_vars, _ = R.init(jax.random.fold_in(key, 2), (8, 8, 1))
    ts = T.TrainState.create(r_vars, O.adam())
    seg = T.make_r_segment_program(G, R, batch_size=BATCH, noise_dim=ND,
                                   noise_method="normal", n_batches=12,
                                   donate=False)
    ts2, losses = seg(g_vars, ts, jax.random.fold_in(key, 3))
    assert losses.shape == (12,)
    assert np.isfinite(np.asarray(losses)).all()
    assert int(ts2.step) == 12
    # chaining segments keeps advancing state (learning itself is covered
    # by test_r_training_reduces_loss)
    ts3, losses2 = seg(g_vars, ts2, jax.random.fold_in(key, 4))
    assert int(ts3.step) == 24
    assert np.isfinite(np.asarray(losses2)).all()


def test_epoch_program_single_scan():
    """make_epoch_program: the whole epoch as one jitted lax.scan — same
    step counts / confusion totals / loss shapes as the per-batch loop, with
    d_iterations/g_iterations > 1 and a dataset SMALLER than the epoch needs
    (sequential wraparound like the exampleForDIdx cursor,
    adversarial.lua:129-137)."""
    key = seed_key(5)
    G = M.create_G(DIMS, ND)
    D = M.create_D(DIMS)
    g_vars, _ = G.init(jax.random.fold_in(key, 1), (ND,))
    d_vars, _ = D.init(jax.random.fold_in(key, 2), (8, 8, 1))
    gs = T.GanState(g=T.TrainState.create(g_vars, O.adam()),
                    d=T.TrainState.create(d_vars, O.adam()))
    n_batches, d_iters, g_iters = 3, 2, 2
    epoch = T.make_epoch_program(
        G, D, batch_size=BATCH, noise_dim=ND, noise_method="normal",
        n_batches=n_batches, d_iterations=d_iters, g_iterations=g_iters,
        donate=False)
    # needs 3*2*(BATCH/2) reals; supply fewer -> modulo wrap must cover it
    data = jax.random.uniform(jax.random.fold_in(key, 3), (10, 8, 8, 1))
    gs2, confusion, (d_losses, g_losses) = epoch(
        gs, T.Confusion.zero(), data, jax.random.fold_in(key, 4))
    assert d_losses.shape == (n_batches * d_iters,)
    assert g_losses.shape == (n_batches * g_iters,)
    assert np.isfinite(np.asarray(d_losses)).all()
    assert np.isfinite(np.asarray(g_losses)).all()
    assert int(gs2.d.step) == n_batches * d_iters
    assert int(gs2.g.step) == n_batches * g_iters
    assert int(jnp.sum(confusion.counts)) == n_batches * d_iters * BATCH
    moved = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), gs.g.params, gs2.g.params)
    assert max(jax.tree_util.tree_leaves(moved)) > 0


def test_labels():
    """Y_GENERATOR=0 / Y_NOT_GENERATOR=1 (train.lua:67-68)."""
    assert T.Y_GENERATOR == 0.0
    assert T.Y_NOT_GENERATOR == 1.0


def test_bce_mse():
    o = jnp.array([0.9, 0.1])
    t = jnp.array([1.0, 0.0])
    assert float(T.bce(o, t)) == pytest.approx(-np.log(0.9), rel=1e-3)
    assert float(T.mse(jnp.array([2.0, 0.0]), jnp.array([0.0, 0.0]))) == 2.0


def test_prng_rbg_root_key_trains():
    """--prng rbg (the measured 1.5x R-step win on v5e, train_ablate.py):
    an rbg root key drives the same step programs — finite losses, and
    noise_inputs sampling works with the typed key."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from ganreverser_tpu import models as M, optim as O, train as T
    from ganreverser_tpu.core.prng import noise_inputs, seed_key

    key = seed_key(3, "rbg")
    z = noise_inputs(jax.random.fold_in(key, 0), 4, 8, "normal")
    assert z.shape == (4, 8) and np.isfinite(np.asarray(z)).all()

    dims, nd, batch = (1, 8, 8), 8, 8
    G, R = M.create_G(dims, nd), M.create_R(dims, nd, "normal")
    gv, _ = G.init(jax.random.fold_in(key, 1), (nd,))
    r_ts = T.create_train_state(R, O.adam(), jax.random.fold_in(key, 2),
                                (8, 8, 1))
    r_step = T.make_r_train_step(G, R, batch_size=batch, noise_dim=nd,
                                 noise_method="normal")
    r_ts, loss = r_step(gv, r_ts, jax.random.fold_in(key, 3))
    assert np.isfinite(float(loss))


def test_prng_defaults_follow_measurements():
    """Default PRNG impls are a MEASURED decision (train_ablate.py r3,
    RESULTS.md): train_r defaults to rbg (threefry dropout masks cost
    13.4 of 40.2 ms — 1.50x), train keeps threefry (d/g steps are
    RNG-insensitive). --prng overrides both; this pins the decision so a
    refactor can't silently reinstate the 21.7%-MFU default."""
    from ganreverser_tpu.core.config import GanConfig, RConfig

    assert RConfig().prng == "rbg"
    assert GanConfig().prng == "threefry"
