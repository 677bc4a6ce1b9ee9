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


def run_e2e(pid: int):
    """The distributed FUSED e2e program (analysis/e2e.py::
    make_distributed_e2e_program — the north-star pipeline) over a REAL
    2-process mesh: per-shard G→R scan, the embedding all-gather, and the
    ppermute pixel ring all cross an actual process boundary here, not
    just a single-process virtual mesh. Each rank independently computes
    the single-device fused program as the reference and checks its own
    addressable shard against it (chunk boundaries align: N/n_shards is a
    multiple of batch_size, see the make_distributed_e2e_program
    docstring)."""
    from ganreverser_tpu import models as M
    from ganreverser_tpu import parallel as par
    from ganreverser_tpu.analysis.e2e import (make_distributed_e2e_program,
                                              make_e2e_program)
    from ganreverser_tpu.core.prng import noise_inputs, seed_key

    mesh = par.make_mesh(data=2, model=1)
    n, bs, k, pk, nd = 128, 32, 8, 4, 8
    key = seed_key(0)
    G = M.create_G((1, 8, 8), nd)
    R = M.create_R((1, 8, 8), nd, "normal")
    g_vars, _ = G.init(jax.random.fold_in(key, 1), (nd,))
    r_vars, _ = R.init(jax.random.fold_in(key, 2), (8, 8, 1))
    z = np.asarray(noise_inputs(jax.random.fold_in(key, 3), n, nd,
                                "normal"))

    # local single-device reference (addressable devices only — legal in a
    # multi-process runtime; both ranks compute the identical answer)
    ref = make_e2e_program(G, R, batch_size=bs, k=k, needle_chunk=bs,
                           pixel_k=pk)(g_vars, r_vars, z)
    ref = [np.asarray(x) for x in ref]

    gg = par.replicate_global(g_vars, mesh)
    rr = par.replicate_global(r_vars, mesh)
    sl = par.process_slice(n)
    zg = par.global_batch_from_local(z[sl], mesh)
    prog = make_distributed_e2e_program(G, R, mesh=mesh, batch_size=bs,
                                        k=k, needle_chunk=bs, pixel_k=pk)
    out = prog(gg, rr, zg)
    # VALUES parity only — index ties under fp noise are legitimate with
    # real G→R models (saturated sigmoid pixels score identically); exact
    # indices are pinned by test_distributed_analysis.py's separated
    # pipeline on the virtual mesh. Here the contract is the collectives
    # (all-gather + ppermute ring) across a real process boundary.
    names = ("emb", "topk_v", "pixel_v")
    for name, got, want in zip(names, (out[0], out[1], out[3]),
                               (ref[0], ref[1], ref[3])):
        local = np.concatenate(
            [np.asarray(s.data) for s in sorted(
                got.addressable_shards, key=lambda s: s.index[0].start)])
        np.testing.assert_allclose(local, want[sl], atol=1e-5, rtol=1e-5,
                                   err_msg=name)
    print(f"MULTIHOST_E2E_OK {pid} "
          f"{float(np.asarray(out[1].addressable_shards[0].data).sum()):.6f}",
          flush=True)


def main():
    pid, port = int(sys.argv[1]), sys.argv[2]
    mode = sys.argv[3] if len(sys.argv) > 3 else "dp_step"
    from ganreverser_tpu import parallel as par
    assert par.initialize_distributed(f"localhost:{port}", 2, pid)
    assert jax.process_count() == 2
    assert jax.device_count() == 2
    if mode == "e2e":
        run_e2e(pid)
        return

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
