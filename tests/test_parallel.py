"""Distributed tests on the fake 8-device CPU backend (SURVEY.md §4):
mesh construction, sharded batch inversion, TP param sharding, sharded
top-k merge, and a data-parallel R train step."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ganreverser_tpu import models as M
from ganreverser_tpu import optim as O
from ganreverser_tpu import parallel as par
from ganreverser_tpu import train as T
from ganreverser_tpu.core.prng import seed_key


def test_mesh_shapes():
    mesh = par.make_mesh()
    assert mesh.shape["data"] == 8 and mesh.shape["model"] == 1
    mesh2 = par.make_mesh(data=4, model=2)
    assert mesh2.shape["data"] == 4 and mesh2.shape["model"] == 2


def test_sharded_inversion_matches_single_device(key):
    """Batch-sharded G∘R inversion over the mesh == single-device result."""
    G = M.create_G((1, 8, 8), 8)
    R = M.create_R((1, 8, 8), 8, "normal")
    g_vars, _ = G.init(jax.random.fold_in(key, 1), (8,))
    r_vars, _ = R.init(jax.random.fold_in(key, 2), (8, 8, 1))

    z = jax.random.normal(jax.random.fold_in(key, 3), (32, 8))

    @jax.jit
    def invert(gv, rv, z):
        imgs, _ = G.apply(gv, z)
        zhat, _ = R.apply(rv, imgs)
        return zhat

    ref = np.asarray(invert(g_vars, r_vars, z))

    mesh = par.make_mesh()
    z_sharded = par.shard_batch(z, mesh)
    gv = par.replicate(g_vars, mesh)
    rv = par.replicate(r_vars, mesh)
    out = np.asarray(invert(gv, rv, z_sharded))
    assert np.allclose(ref, out, atol=1e-5)


def test_tp_param_sharding(key):
    mesh = par.make_mesh(data=4, model=2)
    R = M.create_R((1, 8, 8), 8, "normal")
    r_vars, _ = R.init(key, (8, 8, 1))
    sharded = par.shard_params(r_vars["params"], mesh, min_size=1 << 10)
    # the big Dense kernel (512x512 at 8x8 geometry) must be sharded over 'model'
    big = sharded["l27"]["kernel"]
    assert big.shape == (128 * 2 * 2, 512)
    shard_shapes = {s.data.shape for s in big.addressable_shards}
    assert (512, 256) in shard_shapes


def test_sharded_topk_merge(key):
    mesh = par.make_mesh()
    scores = jax.random.normal(key, (64,))
    ref_v, ref_i = jax.lax.top_k(scores, 5)
    v, i = par.sharded_topk_merge(par.shard_batch(scores, mesh), 5, mesh)
    assert np.allclose(np.asarray(ref_v), np.asarray(v))
    assert np.array_equal(np.asarray(ref_i), np.asarray(i))


def _hlo(jitted, *args):
    return jitted.lower(*args).compile().as_text()


def test_r_step_compiles_sharded_not_replicated(key):
    """The jitted r_step must actually be DATA-PARALLEL on the mesh: its
    compiled HLO contains a cross-device all-reduce (the DP gradient psum).
    Without the with_sharding_constraint in r_loop.py the batch — sampled
    inside the jit — has no sharded ancestor and XLA compiles the whole step
    replicated; the mesh=None control asserts exactly that failure mode, so
    this test fails if the constraint lines are deleted."""
    G = M.create_G((1, 8, 8), 8)
    R = M.create_R((1, 8, 8), 8, "normal")
    g_vars, _ = G.init(jax.random.fold_in(key, 1), (8,))
    r_vars, _ = R.init(jax.random.fold_in(key, 2), (8, 8, 1))
    mesh = par.make_mesh()
    g_vars = par.replicate(g_vars, mesh)
    ts = T.TrainState.create(par.replicate(r_vars, mesh), O.adam())

    sharded = T.make_r_train_step(G, R, batch_size=16, noise_dim=8,
                                  noise_method="normal", mesh=mesh)
    assert "all-reduce" in _hlo(sharded, g_vars, ts, seed_key(9))

    replicated = T.make_r_train_step(G, R, batch_size=16, noise_dim=8,
                                     noise_method="normal", mesh=None)
    assert "all-reduce" not in _hlo(replicated, g_vars, ts, seed_key(9))


def test_adversarial_steps_compile_sharded(key):
    """Same distribution-reality check for the GAN d_step/g_step
    (train/adversarial.py): with the mesh, both compiled programs contain
    the DP gradient all-reduce; g_step (whose batch is sampled inside the
    jit) compiles collective-free when the constraints are dropped."""
    G = M.create_G((1, 8, 8), 8)
    D = M.create_D((1, 8, 8))
    mesh = par.make_mesh()
    gs = T.GanState(
        g=T.TrainState.create(
            par.replicate(G.init(jax.random.fold_in(key, 1), (8,))[0], mesh),
            O.adam()),
        d=T.TrainState.create(
            par.replicate(D.init(jax.random.fold_in(key, 2), (8, 8, 1))[0],
                          mesh),
            O.adam()))
    conf = T.Confusion.zero()
    real_half = par.shard_batch(
        jax.random.uniform(jax.random.fold_in(key, 3), (8, 8, 8, 1)), mesh)

    d_step, g_step = T.make_adversarial_steps(
        G, D, batch_size=16, noise_dim=8, noise_method="normal", mesh=mesh)
    assert "all-reduce" in _hlo(d_step, gs, real_half, conf, seed_key(4))
    assert "all-reduce" in _hlo(g_step, gs, seed_key(5))

    _, g_repl = T.make_adversarial_steps(
        G, D, batch_size=16, noise_dim=8, noise_method="normal", mesh=None)
    assert "all-reduce" not in _hlo(g_repl, gs, seed_key(5))

    # the production path — the single-scan epoch program — is sharded too
    epoch = T.make_epoch_program(
        G, D, batch_size=16, noise_dim=8, noise_method="normal",
        n_batches=2, mesh=mesh, donate=False)
    data = par.shard_batch(
        jax.random.uniform(jax.random.fold_in(key, 6), (16, 8, 8, 1)), mesh)
    assert "all-reduce" in _hlo(epoch, gs, T.Confusion.zero(), data,
                                seed_key(8))


def test_g_step_preserves_tp_output_sharding(key):
    """Under dp+tp the updated params coming OUT of the jitted g_step keep
    their 'model'-axis sharding (no silent gather-to-replicated)."""
    mesh = par.make_mesh(data=4, model=2)
    G = M.create_G((1, 8, 8), 8)
    D = M.create_D((1, 8, 8))
    g_vars, _ = G.init(jax.random.fold_in(key, 1), (8,))
    d_vars, _ = D.init(jax.random.fold_in(key, 2), (8, 8, 1))
    g_vars = {"params": par.shard_params(g_vars["params"], mesh,
                                         min_size=1 << 10),
              "state": par.replicate(g_vars["state"], mesh)}
    gs = T.GanState(g=T.TrainState.create(g_vars, O.adam()),
                    d=T.TrainState.create(par.replicate(d_vars, mesh),
                                          O.adam()))
    _, g_step = T.make_adversarial_steps(
        G, D, batch_size=16, noise_dim=8, noise_method="normal", mesh=mesh)
    gs2, loss = g_step(gs, seed_key(7))
    assert np.isfinite(float(loss))
    # G's big Dense kernel (8 -> 512*2*2): out features sharded over model=2
    big = gs2.g.params["l0"]["kernel"]
    shard_shapes = {s.data.shape for s in big.addressable_shards}
    assert (8, 1024) in shard_shapes, shard_shapes


def test_dp_r_train_step(key):
    """A full R train step jits and runs DATA-PARALLEL over the mesh
    (mesh= passed, like the train CLI and dryrun_multichip) — without
    mesh= the step compiles replicated and exercises no DP at all."""
    G = M.create_G((1, 8, 8), 8)
    R = M.create_R((1, 8, 8), 8, "normal")
    g_vars, _ = G.init(jax.random.fold_in(key, 1), (8,))
    r_vars, _ = R.init(jax.random.fold_in(key, 2), (8, 8, 1))
    mesh = par.make_mesh()
    g_vars = par.replicate(g_vars, mesh)
    ts = T.TrainState.create(par.replicate(r_vars, mesh), O.adam())
    step = T.make_r_train_step(G, R, batch_size=16, noise_dim=8,
                               noise_method="normal", donate=False,
                               mesh=mesh)
    ts2, loss = step(g_vars, ts, seed_key(9))
    assert np.isfinite(float(loss))
