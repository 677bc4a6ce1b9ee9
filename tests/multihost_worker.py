"""Worker script for tests/test_multihost.py — one of 2 localhost processes.

Exercises the full multi-process path (SURVEY.md §5.8): join the distributed
runtime, build a cross-process mesh, host-local data loading via
process_slice + global_batch_from_local, replicate params globally, and run
one data-parallel R train step. Prints the loss for the parent to compare
across processes.
"""
import sys

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def main():
    pid, port = int(sys.argv[1]), sys.argv[2]
    from ganreverser_tpu import parallel as par
    assert par.initialize_distributed(f"localhost:{port}", 2, pid)
    assert jax.process_count() == 2
    assert jax.device_count() == 2

    import jax.numpy as jnp
    from ganreverser_tpu import models as M
    from ganreverser_tpu import optim as O
    from ganreverser_tpu import train as T
    from ganreverser_tpu.core.prng import seed_key

    mesh = par.make_mesh(data=2, model=1)

    # host-local input pipeline: each process holds only its slice
    n = 16
    sl = par.process_slice(n)
    assert sl == slice(pid * 8, pid * 8 + 8), sl
    full = np.arange(n, dtype=np.float32)[:, None] * np.ones((1, 4))
    glob = par.global_batch_from_local(full[sl], mesh)
    assert glob.shape == (n, 4)
    total = jax.jit(jnp.sum)(glob)
    assert par.first_local_value(total) == float(full.sum())

    # one DP train step on the global mesh (same seed -> identical params
    # on both processes, replicated globally)
    key = seed_key(0)
    G = M.create_G((1, 8, 8), 8)
    R = M.create_R((1, 8, 8), 8, "normal")
    g_vars, _ = G.init(jax.random.fold_in(key, 1), (8,))
    r_vars, _ = R.init(jax.random.fold_in(key, 2), (8, 8, 1))
    g_vars = par.replicate_global(g_vars, mesh)
    ts = T.TrainState.create(r_vars, O.adam())
    import dataclasses
    ts = dataclasses.replace(
        ts,
        params=par.replicate_global(ts.params, mesh),
        state=par.replicate_global(ts.state, mesh),
        opt_state=par.replicate_global(ts.opt_state, mesh),
        step=par.replicate_global(ts.step, mesh))

    step = T.make_r_train_step(G, R, batch_size=8, noise_dim=8,
                               noise_method="normal", mesh=mesh)
    ts2, loss = step(g_vars, ts, par.replicate_global(seed_key(9), mesh))
    val = par.first_local_value(loss)
    assert np.isfinite(val)
    print(f"MULTIHOST_LOSS {pid} {val:.8f}", flush=True)


if __name__ == "__main__":
    main()
