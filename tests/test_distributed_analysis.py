"""Sharded analysis tests on the fake 8-device backend: distributed
inversion matches single-device; distributed top-k matches the lax search
exactly."""
import jax
import jax.numpy as jnp
import numpy as np

from ganreverser_tpu import analysis as A
from ganreverser_tpu import models as M
from ganreverser_tpu import parallel as par
from ganreverser_tpu.analysis.distributed import (
    distributed_cosine_topk, distributed_generate_and_invert)
from ganreverser_tpu.core.prng import seed_key


def test_distributed_invert_matches_single(key):
    G = M.create_G((1, 8, 8), 8)
    R = M.create_R((1, 8, 8), 8, "normal")
    gv, _ = G.init(jax.random.fold_in(key, 1), (8,))
    rv, _ = R.init(jax.random.fold_in(key, 2), (8, 8, 1))
    mesh = par.make_mesh()
    gvr = par.replicate(gv, mesh)
    rvr = par.replicate(rv, mesh)
    noise, images, attrs = distributed_generate_and_invert(
        G, R, gvr, rvr, n=64, noise_dim=8, noise_method="normal",
        key=seed_key(3), mesh=mesh)
    assert attrs.shape == (64, 8)

    # single-device reference with the same noise
    imgs_ref, _ = G.apply(gv, jnp.asarray(jax.device_get(noise)))
    attrs_ref, _ = R.apply(rv, imgs_ref)
    np.testing.assert_allclose(np.asarray(attrs), np.asarray(attrs_ref),
                               rtol=1e-4, atol=1e-5)


def test_refiner_dp_tp_mesh(key):
    """Gradient latent refinement (BASELINE config 5's mode) over a dp+tp
    mesh: batch sharded over 'data', G's big kernels sharded over 'model'
    (SURVEY.md §7 step 6 names TP for the big Linears at large geometry) —
    matches the single-device result."""
    G = M.create_G((1, 8, 8), 8)
    gv, _ = G.init(jax.random.fold_in(key, 1), (8,))
    targets = jax.random.uniform(jax.random.fold_in(key, 2), (16, 8, 8, 1))
    z0 = jnp.zeros((16, 8))
    refine = A.make_refiner(G, steps=5, lr=0.05)
    z_ref, loss_ref = refine(gv, targets, z0)

    mesh = par.make_mesh(data=4, model=2)
    gvs = {"params": par.shard_params(gv["params"], mesh, min_size=1 << 10),
           "state": par.replicate(gv["state"], mesh)}
    z_s, loss_s = refine(gvs, par.shard_batch(targets, mesh),
                         par.shard_batch(z0, mesh))
    np.testing.assert_allclose(np.asarray(z_s), np.asarray(z_ref),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(loss_s), np.asarray(loss_ref),
                               rtol=1e-4, atol=1e-6)


def test_distributed_topk_exact(key):
    emb = jax.random.normal(key, (512, 32))
    needles = jnp.array([0, 100, 511])
    ref_v, ref_i = A.cosine_topk(emb, needles, 20)
    mesh = par.make_mesh()
    emb_sharded = par.shard_batch(emb, mesh)
    v, i = distributed_cosine_topk(emb_sharded, needles, 20, mesh)
    np.testing.assert_allclose(np.asarray(v), np.asarray(ref_v),
                               rtol=1e-5, atol=1e-6)
    assert np.array_equal(np.asarray(i), np.asarray(ref_i))

    # approx=True keeps the contract (CPU fallback is sort-based/exact;
    # hardware recall measured in tpu_kernel_check approx_topk)
    av, ai = distributed_cosine_topk(emb_sharded, needles, 20, mesh,
                                     approx=True)
    assert av.shape == ref_v.shape and ai.shape == ref_i.shape
    np.testing.assert_allclose(np.asarray(av), np.asarray(ref_v),
                               rtol=1e-5, atol=1e-6)


def test_distributed_invert_dp_tp_matches_single(key):
    """apply_r --mesh_model path (VERDICT r2 item 6): generate+invert with
    the batch sharded over 'data' AND the big Dense kernels TP-sharded over
    'model' matches the single-device pipeline, and the shard_map top-k
    still merges exactly over the 2-D mesh."""
    G = M.create_G((1, 8, 8), 8)
    R = M.create_R((1, 8, 8), 8, "normal")
    gv, _ = G.init(jax.random.fold_in(key, 1), (8,))
    rv, _ = R.init(jax.random.fold_in(key, 2), (8, 8, 1))
    mesh = par.make_mesh(data=4, model=2)

    def place(v):  # same layout rule as cli/apply_r.py's mesh branch
        return {"params": par.shard_params(v["params"], mesh,
                                           min_size=1 << 10),
                "state": par.replicate(v["state"], mesh)}

    noise, images, attrs = distributed_generate_and_invert(
        G, R, place(gv), place(rv), n=64, noise_dim=8,
        noise_method="normal", key=seed_key(3), mesh=mesh)

    imgs_ref, _ = G.apply(gv, jnp.asarray(jax.device_get(noise)))
    attrs_ref, _ = R.apply(rv, imgs_ref)
    np.testing.assert_allclose(np.asarray(attrs), np.asarray(attrs_ref),
                               rtol=1e-4, atol=1e-5)

    # rankings vs the single-device pipeline: untrained-model embeddings
    # are near-collinear (cosine gaps < fp noise), so only VALUES are
    # asserted here; exact index agreement is checked below on separated
    # embeddings sharded over the same 2-D mesh
    v, i = distributed_cosine_topk(attrs, jnp.arange(3), 10, mesh)
    ref_v, ref_i = A.cosine_topk(attrs_ref, jnp.arange(3), 10)
    np.testing.assert_allclose(np.asarray(v), np.asarray(ref_v),
                               rtol=1e-4, atol=1e-5)

    # the collective merge over a mesh WITH a model axis is exact
    emb = jax.random.normal(jax.random.fold_in(key, 3), (64, 32))
    ev, ei = distributed_cosine_topk(par.shard_batch(emb, mesh),
                                     jnp.arange(3), 10, mesh)
    sv, si = A.cosine_topk(emb, jnp.arange(3), 10)
    np.testing.assert_allclose(np.asarray(ev), np.asarray(sv),
                               rtol=1e-5, atol=1e-6)
    assert np.array_equal(np.asarray(ei), np.asarray(si))


def test_distributed_e2e_matches_single(key):
    """The mesh-sharded fused e2e program (ONE jitted shard_map program:
    per-shard G->R chunk scan + ICI all-gather + per-shard needle search)
    matches the single-device fused program — embeddings and top-k values
    (the v5e-8 north-star pipeline, BASELINE.md / apply_r.lua:143-153 +
    265-318). Untrained-model embeddings are near-collinear (cosine gaps
    below fp noise) so index order on ties is not asserted here; exact
    index parity is pinned on separated embeddings in
    test_distributed_e2e_exact_indices."""
    dims, nd, n = (1, 8, 8), 8, 64
    G = M.create_G(dims, nd)
    R = M.create_R(dims, nd, "normal")
    gk, rk, zk = jax.random.split(key, 3)
    gv, _ = G.init(gk, (nd,))
    rv, _ = R.init(rk, (8, 8, 1))
    z = jax.random.normal(zk, (n, nd))

    single = A.make_e2e_program(G, R, batch_size=8, k=4, needle_chunk=16)
    emb_ref, v_ref, i_ref = single(gv, rv, z)

    # data=8: the pod shape; data=1: the degenerate mesh bench.py times on
    # the single real chip to expose the collective-wrapping overhead
    for data in (8, 1):
        mesh = par.make_mesh(data=data, model=1)
        dist = A.make_distributed_e2e_program(G, R, mesh=mesh, batch_size=8,
                                              k=4, needle_chunk=16)
        emb, v, i = dist(par.replicate(gv, mesh), par.replicate(rv, mesh),
                         par.shard_batch(z, mesh))
        np.testing.assert_allclose(np.asarray(emb), np.asarray(emb_ref),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(v), np.asarray(v_ref),
                                   rtol=1e-5, atol=1e-6)
        # row's best match scores ~1.0 (itself, or a tie within fp noise)
        assert float(np.asarray(v)[:, 0].min()) > 0.999


def _separated_pipeline():
    """A G→R stand-in with WELL-SEPARATED embeddings (random tanh mixing)
    so top-k index order has no fp ties: g_apply ignores the G params and
    maps z to deterministic pseudo-images; R = Flatten."""
    from ganreverser_tpu.models.modules import Flatten
    nd = 8
    W = jax.random.normal(jax.random.PRNGKey(7), (nd, 16))

    def g_apply(_gv, zc):
        return jnp.tanh(zc @ W).reshape(zc.shape[0], 4, 4, 1)

    return g_apply, Flatten(), nd


def test_distributed_e2e_exact_indices(key):
    """Exact global-index parity of BOTH measures (embedding all-gather
    search AND the ppermute-ring pixel search) against the single-device
    fused program, on separated embeddings."""
    g_apply, R, nd = _separated_pipeline()
    G = M.create_G((1, 8, 8), nd)  # params unused by g_apply
    gv, _ = G.init(jax.random.fold_in(key, 1), (nd,))
    n = 64
    z = jax.random.normal(jax.random.fold_in(key, 2), (n, nd))

    single = A.make_e2e_program(G, R, batch_size=8, k=4, needle_chunk=16,
                                g_apply=g_apply, pixel_k=3)
    emb_ref, v_ref, i_ref, pv_ref, pi_ref = single(gv, {}, z)

    mesh = par.make_mesh()
    dist = A.make_distributed_e2e_program(
        G, R, mesh=mesh, batch_size=8, k=4, needle_chunk=16,
        g_apply=g_apply, pixel_k=3)
    emb, v, i, pv, pi = dist(par.replicate(gv, mesh), {},
                             par.shard_batch(z, mesh))
    np.testing.assert_allclose(np.asarray(emb), np.asarray(emb_ref),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(v), np.asarray(v_ref),
                               rtol=1e-5, atol=1e-6)
    assert np.array_equal(np.asarray(i), np.asarray(i_ref))
    np.testing.assert_allclose(np.asarray(pv), np.asarray(pv_ref),
                               rtol=1e-5, atol=1e-6)
    assert np.array_equal(np.asarray(pi), np.asarray(pi_ref))


def test_distributed_e2e_pixel_ring_matches_single(key):
    """The ppermute-ring pixel measure of the distributed e2e program
    (blocks rotate over ICI, candidates fold into a running top-k) matches
    the single-device pixel leg's VALUES on the real G→R models (index
    ties under fp noise are pinned in test_distributed_e2e_exact_indices
    instead)."""
    dims, nd, n = (1, 8, 8), 8, 64
    G = M.create_G(dims, nd)
    R = M.create_R(dims, nd, "normal")
    gk, rk, zk = jax.random.split(key, 3)
    gv, _ = G.init(gk, (nd,))
    rv, _ = R.init(rk, (8, 8, 1))
    z = jax.random.normal(zk, (n, nd))

    single = A.make_e2e_program(G, R, batch_size=8, k=4, needle_chunk=16,
                                pixel_k=3)
    emb_ref, v_ref, i_ref, pv_ref, pi_ref = single(gv, rv, z)

    mesh = par.make_mesh()
    dist = A.make_distributed_e2e_program(G, R, mesh=mesh, batch_size=8,
                                          k=4, needle_chunk=16, pixel_k=3)
    emb, v, i, pv, pi = dist(par.replicate(gv, mesh),
                             par.replicate(rv, mesh),
                             par.shard_batch(z, mesh))
    np.testing.assert_allclose(np.asarray(pv), np.asarray(pv_ref),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(v), np.asarray(v_ref),
                               rtol=1e-5, atol=1e-6)


def test_distributed_e2e_rejects_model_axis(key):
    G = M.create_G((1, 8, 8), 8)
    R = M.create_R((1, 8, 8), 8, "normal")
    mesh = par.make_mesh(data=4, model=2)
    try:
        A.make_distributed_e2e_program(G, R, mesh=mesh)
        assert False, "expected ValueError for model axis > 1"
    except ValueError as e:
        assert "model axis" in str(e)


def test_distributed_e2e_int8_overrides_match_single(key):
    """The g_apply/r_apply override surface on the DISTRIBUTED fused
    program, with the int8 serving legs (models/fastpath.py): the
    8-shard shard_map program must reproduce the single-device int8
    program exactly — same quantized math, same chunk boundaries
    ((N/shards) % batch_size == 0)."""
    from ganreverser_tpu.models.fastpath import (make_fast_generator_xla,
                                                 make_fast_generator_xla_int8,
                                                 make_fast_inverter_int8)
    dims, nd, n = (3, 8, 8), 6, 64
    G = M.create_G(dims, nd, dtype=jnp.float32)
    R = M.create_R(dims, nd, "normal", dtype=jnp.float32)
    gk, rk, zk = jax.random.split(key, 3)
    gv, _ = G.init(gk, (nd,))
    rv, _ = R.init(rk, (8, 8, 3))
    # amplify G: random-init sigmoid outputs are near-constant, which
    # leaves all cosine scores tied (see tests/test_quant.py)
    gv = jax.tree.map(lambda a: a * 4.0, gv)
    z = jax.random.normal(zk, (n, nd))

    g8 = make_fast_generator_xla_int8(dims, nd, dtype=jnp.float32)
    r8 = make_fast_inverter_int8(dims, nd, "normal", dtype=jnp.float32)
    ga = lambda g, zc: g8(g, zc)
    ra = lambda r, im: r8(r, im)

    single = A.make_e2e_program(G, R, batch_size=8, k=4, needle_chunk=16,
                                g_apply=ga, r_apply=ra)
    emb_ref, v_ref, _ = single(gv, rv, z)

    mesh = par.make_mesh(data=8, model=1)
    dist = A.make_distributed_e2e_program(G, R, mesh=mesh, batch_size=8,
                                          k=4, needle_chunk=16,
                                          g_apply=ga, r_apply=ra)
    emb, v, _ = dist(par.replicate(gv, mesh), par.replicate(rv, mesh),
                     par.shard_batch(z, mesh))
    np.testing.assert_allclose(np.asarray(emb), np.asarray(emb_ref),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(v), np.asarray(v_ref),
                               rtol=1e-5, atol=1e-6)
