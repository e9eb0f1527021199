"""2-D sharded sparse X (ShardedTiled) on the simulated 8-device mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import nmf_tpu
from nmf_tpu.ops import matops
from nmf_tpu.ops.sparse_shard import shard_tiled, sharded_mm, sharded_mtm
from nmf_tpu.parallel.mesh import make_mesh
from nmf_tpu.parallel.sharding import w_sharding, h_sharding

requires_multidevice = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 simulated devices"
)


def make(seed=0, p=600, n=500, density=0.05):
    rng = np.random.default_rng(seed)
    Xd = (rng.random((p, n)) * (rng.random((p, n)) < density)).astype(np.float32)
    r, c = np.nonzero(Xd)
    return Xd, r, c, rng


@requires_multidevice
@pytest.mark.parametrize(
    "opts",
    [
        dict(order="natural"),
        dict(),  # order="degree" default
        dict(dense_tile_nnz=100, quad_tail_nnz=16),
    ],
    ids=["compact-natural", "compact-degree", "compact-hybrid"],
)
def test_sharded_products_match_dense(opts):
    Xd, r, c, rng = make()
    mesh = make_mesh((2, 4))
    X = shard_tiled(r, c, Xd[r, c], Xd.shape, mesh, stripe_tiles=2, **opts)
    D = jnp.asarray(rng.random((Xd.shape[1], 12)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(sharded_mm(X, D)), Xd @ np.asarray(D), rtol=3e-5, atol=1e-4
    )
    D2 = jnp.asarray(rng.random((Xd.shape[0], 12)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(sharded_mtm(X, D2)), Xd.T @ np.asarray(D2), rtol=3e-5, atol=1e-4
    )
    # matops dispatch + logical transpose
    np.testing.assert_allclose(
        np.asarray(matops.mm(matops.transpose(X), D2)),
        Xd.T @ np.asarray(D2),
        rtol=3e-5,
        atol=1e-4,
    )
    assert bool(matops.all_nonneg(X))
    assert np.isclose(float(matops.sq_norm(X)), (Xd**2).sum(), rtol=1e-5)


@requires_multidevice
def test_output_shardings_are_canonical():
    Xd, r, c, rng = make(p=256, n=256)
    mesh = make_mesh((2, 4))
    X = shard_tiled(r, c, Xd[r, c], Xd.shape, mesh, stripe_tiles=1)
    D = jnp.asarray(rng.random((256, 8)).astype(np.float32))
    out = sharded_mm(X, D)
    # X @ D is the XH' shape -> must land in the canonical W sharding
    assert out.sharding.is_equivalent_to(w_sharding(mesh), out.ndim)


@requires_multidevice
@pytest.mark.parametrize(
    "alg", ["multmse", "multdiv", "cd", "greedycd", "projals", "alspgrad"]
)
def test_sharded_sparse_solvers_match_dense(alg):
    Xd, r, c, rng = make(p=256, n=192, density=0.08)
    mesh = make_mesh((2, 4))
    X = shard_tiled(r, c, Xd[r, c], Xd.shape, mesh, stripe_tiles=1)
    k = 4
    W0 = np.abs(rng.random((Xd.shape[0], k))).astype(np.float32)
    H0 = np.abs(rng.random((k, Xd.shape[1]))).astype(np.float32)

    algs = {
        "multmse": nmf_tpu.MultUpdate(obj="mse", maxiter=5),
        "multdiv": nmf_tpu.MultUpdate(obj="div", maxiter=5),
        "cd": nmf_tpu.CoordinateDescent(maxiter=5),
        "greedycd": nmf_tpu.GreedyCD(maxiter=4),
        "projals": nmf_tpu.ProjectedALS(maxiter=5),
        "alspgrad": nmf_tpu.ALSPGrad(maxiter=3, maxsubiter=5),
    }
    dense = nmf_tpu.solve(algs[alg], jnp.asarray(Xd), jnp.asarray(W0), jnp.asarray(H0))
    Wd = jax.device_put(jnp.asarray(W0), w_sharding(mesh))
    Hd = jax.device_put(jnp.asarray(H0), h_sharding(mesh))
    sp = nmf_tpu.solve(algs[alg], X, Wd, Hd)
    assert sp.niters == dense.niters
    np.testing.assert_allclose(np.asarray(sp.W), np.asarray(dense.W), rtol=5e-4, atol=1e-4)
    assert np.isclose(sp.objvalue, dense.objvalue, rtol=1e-4)


@requires_multidevice
def test_sharded_sparse_kl_matches_dense():
    """kl_objective and the per-nnz ops it rides (sddmm, nnz_values) on
    ShardedTiled match the dense gkldiv (reference src/multupd.jl:148)."""
    from nmf_tpu.ops.objectives import gkldiv, kl_objective

    Xd, r, c, rng = make(p=256, n=192)
    mesh = make_mesh((2, 4))
    X = shard_tiled(r, c, Xd[r, c], Xd.shape, mesh, stripe_tiles=1)
    W = jnp.asarray(np.abs(rng.random((256, 4))).astype(np.float32))
    H = jnp.asarray(np.abs(rng.random((4, 192))).astype(np.float32))
    sharded = float(kl_objective(X, W, H))
    dense = float(gkldiv(jnp.asarray(Xd).astype(W.dtype), W @ H))
    assert np.isclose(sharded, dense, rtol=1e-4)


@requires_multidevice
def test_sharded_scale_values_updates_both_orientations():
    """scale_values on ShardedTiled must refresh the bwd tiling too —
    mm() and mtm() on the scaled matrix both match dense."""
    Xd, r, c, rng = make(p=256, n=192)
    mesh = make_mesh((2, 4))
    X = shard_tiled(r, c, Xd[r, c], Xd.shape, mesh, stripe_tiles=1)
    v = matops.nnz_values(X)
    Y = matops.scale_values(X, 2.0 * v + v * v)
    Yd = 2.0 * Xd + Xd * Xd
    D = jnp.asarray(rng.random((192, 6)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(matops.mm(Y, D)), Yd @ np.asarray(D), rtol=3e-5, atol=1e-4
    )
    D2 = jnp.asarray(rng.random((256, 6)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(matops.mtm(D2.T, Y).T), Yd.T @ np.asarray(D2), rtol=3e-5, atol=1e-4
    )


@requires_multidevice
@pytest.mark.parametrize("alg", ["multmse", "multdiv", "cd", "greedycd"])
def test_sharded_compact_hybrid_solvers_match_dense(alg):
    """Solvers on the compact layout WITH dense-tile and quad-tail stores —
    the full round-3 single-chip kernel toolkit on the mesh.  The very
    sparse tail plus a dense head makes all three stores non-empty in both
    orientations."""
    rng = np.random.default_rng(7)
    p, n, k = 300, 260, 3
    Xd = (rng.random((p, n)) * (rng.random((p, n)) < 0.01)).astype(np.float32)
    Xd[:40, :40] += ((rng.random((40, 40)) < 0.8) * rng.random((40, 40))).astype(
        np.float32
    )
    r, c = np.nonzero(Xd)
    mesh = make_mesh((2, 4))
    X = shard_tiled(
        r, c, Xd[r, c], Xd.shape, mesh, stripe_tiles=1,
        dense_tile_nnz=100, quad_tail_nnz=16,
    )
    assert X.fwd.n_dblocks and X.fwd.n_qchunks  # all three stores live
    algs = {
        "multmse": nmf_tpu.MultUpdate(obj="mse", maxiter=5),
        "multdiv": nmf_tpu.MultUpdate(obj="div", maxiter=5),
        "cd": nmf_tpu.CoordinateDescent(maxiter=5),
        "greedycd": nmf_tpu.GreedyCD(maxiter=4),
    }
    W0 = np.abs(rng.random((p, k))).astype(np.float32)
    H0 = np.abs(rng.random((k, n))).astype(np.float32)
    dense = nmf_tpu.solve(algs[alg], jnp.asarray(Xd), jnp.asarray(W0), jnp.asarray(H0))
    Wd = jax.device_put(jnp.asarray(W0), w_sharding(mesh))
    Hd = jax.device_put(jnp.asarray(H0), h_sharding(mesh))
    sp = nmf_tpu.solve(algs[alg], X, Wd, Hd)
    assert sp.niters == dense.niters
    np.testing.assert_allclose(
        np.asarray(sp.W), np.asarray(dense.W), rtol=5e-4, atol=1e-4
    )
    assert np.isclose(sp.objvalue, dense.objvalue, rtol=1e-4)


@requires_multidevice
def test_sharded_compact_front_door_carries_build_opts():
    """nnmf(TiledCSR, mesh=...) rebuilds the ShardedTiled with the same
    layout options the TiledCSR was built with (dense/quad stores survive
    the front door)."""
    from nmf_tpu.ops.sparse_format import build_tiled
    from nmf_tpu.parallel.sharding import shard_problem

    rng = np.random.default_rng(8)
    p, n = 300, 260
    Xd = (rng.random((p, n)) * (rng.random((p, n)) < 0.01)).astype(np.float32)
    Xd[:30, :30] += np.abs(rng.random((30, 30))).astype(np.float32)
    r, c = np.nonzero(Xd)
    Xt = build_tiled(
        r, c, Xd[r, c], Xd.shape, stripe_tiles=1, dense_tile_nnz=100,
        quad_tail_nnz=16,
    )
    mesh = make_mesh((2, 4))
    W = jnp.zeros((p, 2), jnp.float32)
    H = jnp.zeros((2, n), jnp.float32)
    Xs, _, _ = shard_problem(mesh, Xt, W, H)
    assert Xs.fwd.n_dblocks > 0
    assert Xs.fwd.n_qchunks > 0


@requires_multidevice
def test_sharded_spa_matches_dense():
    """SPA (anchors + FNNLS H) on ShardedTiled matches the dense path
    (reference src/spa.jl:41-68 is matrix-generic)."""
    from nmf_tpu.models.spa import spa

    Xd, r, c, rng = make(p=300, n=260, density=0.07)
    mesh = make_mesh((2, 4))
    X = shard_tiled(r, c, Xd[r, c], Xd.shape, mesh, stripe_tiles=1)
    Ws, Hs = spa(X, 4)
    Wd, Hd = spa(jnp.asarray(Xd), 4)
    np.testing.assert_allclose(np.asarray(Ws), np.asarray(Wd), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(Hs), np.asarray(Hd), rtol=2e-3, atol=2e-3)


@requires_multidevice
@pytest.mark.parametrize("alg", ["multdiv", "cd", "greedycd"])
def test_nnmf_front_door_sparse_mesh(alg):
    """The reference's one-entry-point contract on sharded sparse X
    (src/interf.jl:3-13): nnmf(TiledCSR, mesh=...) and nnmf(ShardedTiled,
    mesh=...) run init -> solve -> Result end-to-end and agree with the
    dense nnmf on the same problem and seed."""
    from nmf_tpu.ops.sparse_format import build_tiled

    Xd, r, c, rng = make(seed=3, p=300, n=260, density=0.06)
    k = 3
    dense = nmf_tpu.nnmf(
        jnp.asarray(Xd), k, alg=alg, init="random", maxiter=8, seed=11
    )

    mesh = make_mesh((2, 4))
    Xt = build_tiled(r, c, Xd[r, c], Xd.shape, stripe_tiles=1)
    via_tiled = nmf_tpu.nnmf(
        Xt, k, alg=alg, init="random", maxiter=8, seed=11, mesh=mesh
    )
    assert via_tiled.niters == dense.niters
    # GreedyCD's per-row argmax schedule is chaotic under f32
    # order-of-summation differences (the degree-renumbered sharded layout
    # accumulates the same products in a different order), so its factors
    # drift at ~1e-2 scale while the objective stays put
    tol = dict(rtol=5e-2, atol=5e-2) if alg == "greedycd" else dict(
        rtol=2e-4, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(via_tiled.W), np.asarray(dense.W), **tol
    )
    np.testing.assert_allclose(
        np.asarray(via_tiled.H), np.asarray(dense.H), **tol
    )
    assert np.isclose(via_tiled.objvalue, dense.objvalue, rtol=1e-3)

    # prebuilt ShardedTiled passes straight through
    Xs = shard_tiled(r, c, Xd[r, c], Xd.shape, mesh, stripe_tiles=1)
    via_sharded = nmf_tpu.nnmf(
        Xs, k, alg=alg, init="random", maxiter=8, seed=11, mesh=mesh
    )
    assert np.isclose(via_sharded.objvalue, dense.objvalue, rtol=1e-4)


@requires_multidevice
def test_nnmf_front_door_sparse_default_init():
    """nnmf on sharded sparse X with the DEFAULT init (nndsvdar -> rsvd ->
    distributed CholeskyQR3) — the full reference-default path on the mesh."""
    rng = np.random.default_rng(9)
    p, n, k = 300, 260, 3
    Wg = np.abs(rng.random((p, k))).astype(np.float32)
    Hg = (np.abs(rng.random((k, n))) * (rng.random((k, n)) < 0.3)).astype(np.float32)
    Xd = Wg @ Hg
    r, c = np.nonzero(Xd)
    mesh = make_mesh((2, 4))
    Xs = shard_tiled(r, c, Xd[r, c], Xd.shape, mesh, stripe_tiles=1)
    res = nmf_tpu.nnmf(Xs, k, alg="cd", maxiter=30, seed=0, mesh=mesh)
    assert np.isfinite(res.objvalue)
    rel = np.linalg.norm(
        Xd - np.asarray(res.W) @ np.asarray(res.H)
    ) / np.linalg.norm(Xd)
    assert rel < 0.15, rel


@requires_multidevice
def test_sharded_load_stats():
    """Per-block nnz accounting (all three stores) sums to the true nnz and
    reports the skew ratio."""
    from nmf_tpu.ops.sparse_shard import sharded_load_stats

    rng = np.random.default_rng(12)
    p, n = 600, 500
    Xd = (rng.random((p, n)) * (rng.random((p, n)) < 0.01)).astype(np.float32)
    Xd[:40, :40] += np.abs(rng.random((40, 40))).astype(np.float32)
    r, c = np.nonzero(Xd)
    mesh = make_mesh((2, 4))
    X = shard_tiled(
        r, c, Xd[r, c], Xd.shape, mesh, stripe_tiles=2,
        dense_tile_nnz=100, quad_tail_nnz=16,
    )
    st = sharded_load_stats(X)
    assert st["total_nnz"].shape == (2, 4)
    assert int(st["total_nnz"].sum()) == len(r)
    assert st["imbalance_max_over_mean"] >= 1.0
    assert st["padded_slots_per_device"] >= int(st["total_nnz"].max())


@requires_multidevice
@pytest.mark.parametrize(
    "alg", ["multmse", "multdiv", "cd"], ids=str,
)
def test_sharded_coo_band_solvers_match_dense(alg):
    """Round-5 four-class store on the mesh: dense + narrow + quad + COO
    dust band per device block; solver results must match dense."""
    rng = np.random.default_rng(9)
    p, n, k = 300, 260, 3
    Xd = (rng.random((p, n)) * (rng.random((p, n)) < 0.004)).astype(np.float32)
    Xd[:40, :40] += ((rng.random((40, 40)) < 0.8) * rng.random((40, 40))).astype(
        np.float32
    )
    r, c = np.nonzero(Xd)
    mesh = make_mesh((2, 4))
    X = shard_tiled(
        r, c, Xd[r, c], Xd.shape, mesh, stripe_tiles=1,
        dense_tile_nnz=100, quad_tail_nnz=16, coo_tail_nnz=2,
    )
    assert X.fwd.n_coo > 0 and X.bwd.n_coo > 0
    algs = {
        "multmse": nmf_tpu.MultUpdate(obj="mse", maxiter=5),
        "multdiv": nmf_tpu.MultUpdate(obj="div", maxiter=5),
        "cd": nmf_tpu.CoordinateDescent(maxiter=5),
    }
    W0 = np.abs(rng.random((p, k))).astype(np.float32)
    H0 = np.abs(rng.random((k, n))).astype(np.float32)
    dense = nmf_tpu.solve(algs[alg], jnp.asarray(Xd), jnp.asarray(W0), jnp.asarray(H0))
    Wd = jax.device_put(jnp.asarray(W0), w_sharding(mesh))
    Hd = jax.device_put(jnp.asarray(H0), h_sharding(mesh))
    sp = nmf_tpu.solve(algs[alg], X, Wd, Hd)
    assert sp.niters == dense.niters
    np.testing.assert_allclose(
        np.asarray(sp.W), np.asarray(dense.W), rtol=5e-4, atol=1e-4
    )
    assert np.isclose(sp.objvalue, dense.objvalue, rtol=1e-4)


@requires_multidevice
def test_sharded_coo_band_per_nnz_ops():
    """scale_values / nnz_values / sddmm / load stats over the COO region,
    plus the exact pattern_nnz report."""
    from nmf_tpu.ops.sparse_shard import (
        sharded_load_stats,
        sharded_nnz_values,
        sharded_scale_values,
        sharded_sddmm,
    )

    rng = np.random.default_rng(10)
    p, n, k = 300, 260, 4
    Xd = (rng.random((p, n)) * (rng.random((p, n)) < 0.004)).astype(np.float32)
    Xd[:40, :40] += ((rng.random((40, 40)) < 0.8) * rng.random((40, 40))).astype(
        np.float32
    )
    r, c = np.nonzero(Xd)
    mesh = make_mesh((2, 4))
    X = shard_tiled(
        r, c, Xd[r, c], Xd.shape, mesh, stripe_tiles=1,
        dense_tile_nnz=100, quad_tail_nnz=16, coo_tail_nnz=4,
    )
    assert X.fwd.n_coo > 0
    stats = sharded_load_stats(X)
    assert stats["pattern_nnz"].sum() == len(r)
    assert stats["total_nnz"].sum() == len(r)  # no explicit zeros here
    # sddmm == (W@H) at the pattern, weighted by the value layout
    W = jnp.asarray(np.abs(rng.random((p, k))).astype(np.float32))
    H = jnp.asarray(np.abs(rng.random((k, n))).astype(np.float32))
    wh = sharded_sddmm(X, W, H)
    v = sharded_nnz_values(X)
    got = float(jnp.sum(jnp.asarray(wh) * jnp.asarray(v)))
    want = float((((np.asarray(W) @ np.asarray(H)) * (Xd != 0)) * Xd).sum())
    assert np.isclose(got, want, rtol=1e-4)
    # doubling the values through scale_values doubles sq_norm
    X2 = sharded_scale_values(X, jnp.asarray(v) * 2)
    assert np.isclose(
        float(matops.sq_norm(X2)), 4 * (Xd**2).sum(), rtol=1e-5
    )
