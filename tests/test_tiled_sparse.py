"""TiledCSR format + Pallas sparse matmul kernel (TPU interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import nmf_tpu
from nmf_tpu.ops import matops
from nmf_tpu.ops.sparse_format import TILE, build_tiled


def make(seed=0, p=300, n=260, k=8, density=0.05, layout="compact", group=8):
    rng = np.random.default_rng(seed)
    Xd = (rng.random((p, n)) * (rng.random((p, n)) < density)).astype(np.float32)
    r, c = np.nonzero(Xd)
    X = build_tiled(r, c, Xd[r, c], (p, n), stripe_tiles=2, layout=layout, group=group)
    return Xd, X, rng


@pytest.mark.parametrize("precision", ["highest", "high", "fast"])
def test_layouts_precisions_match_dense(precision):
    from nmf_tpu.ops.pallas.sparse import tiled_mm, tiled_mtm

    Xd, X, rng = make(group=8)
    D = jnp.asarray(rng.random((Xd.shape[1], 8)).astype(np.float32))
    tol = dict(highest=1e-5, high=2e-4, fast=5e-3)[precision]
    got = np.asarray(tiled_mm(X, D, precision=precision))
    want = Xd @ np.asarray(D)
    np.testing.assert_allclose(got, want, rtol=tol, atol=tol * np.abs(want).max())
    D2 = jnp.asarray(rng.random((Xd.shape[0], 8)).astype(np.float32))
    got2 = np.asarray(tiled_mtm(X, D2, precision=precision))
    want2 = Xd.T @ np.asarray(D2)
    np.testing.assert_allclose(got2, want2, rtol=tol, atol=tol * np.abs(want2).max())


def test_compact_empty_stripes_and_powerlaw():
    # all nnz in the first and last row panels: middle stripes are empty and
    # must still flush zeros; power-law column skew exercises uneven groups
    rng = np.random.default_rng(3)
    p, n, nnz = 1200, 700, 4000
    rows = np.where(rng.random(nnz) < 0.5, rng.integers(0, 90, nnz), rng.integers(p - 40, p, nnz))
    cols = np.minimum((rng.pareto(1.1, nnz) * 3).astype(np.int64), n - 1)
    vals = rng.random(nnz).astype(np.float32)
    Xd = np.zeros((p, n), np.float32)
    np.add.at(Xd, (rows, cols), vals)
    r, c = np.nonzero(Xd)
    X = build_tiled(r, c, Xd[r, c], (p, n), stripe_tiles=2, layout="compact", group=8)
    D = jnp.asarray(rng.random((n, 9)).astype(np.float32))
    got = np.asarray(matops.mm(X, D))
    np.testing.assert_allclose(got, Xd @ np.asarray(D), rtol=2e-5, atol=1e-4)
    D2 = jnp.asarray(rng.random((p, 9)).astype(np.float32))
    got2 = np.asarray(matops.mtm(D2.T, X))
    np.testing.assert_allclose(got2, np.asarray(D2).T @ Xd, rtol=2e-5, atol=1e-4)


def test_format_roundtrip():
    Xd, X, rng = make()
    # every nnz lands in exactly one slot; with_values round-trips
    assert int(X.nnz) == (Xd != 0).sum()
    X2 = X.with_values(X.values * 2)
    np.testing.assert_allclose(np.asarray(X2.fwd.vals), np.asarray(X.fwd.vals) * 2)
    np.testing.assert_allclose(np.asarray(X2.bwd.vals), np.asarray(X.bwd.vals) * 2)


def test_mm_mtm_match_dense():
    Xd, X, rng = make()
    D = jnp.asarray(rng.random((Xd.shape[1], 8)).astype(np.float32))
    got = np.asarray(matops.mm(X, D))
    np.testing.assert_allclose(got, Xd @ np.asarray(D), rtol=2e-5, atol=1e-5)
    D2 = jnp.asarray(rng.random((Xd.shape[0], 8)).astype(np.float32))
    got2 = np.asarray(matops.mtm(D2.T, X))
    np.testing.assert_allclose(got2, np.asarray(D2).T @ Xd, rtol=2e-5, atol=1e-5)


def test_reductions_and_sddmm():
    Xd, X, rng = make()
    np.testing.assert_allclose(np.asarray(matops.colsums(X)), Xd.sum(0), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(matops.rowsums(X)), Xd.sum(1), rtol=1e-5)
    assert np.isclose(float(matops.sq_norm(X)), (Xd**2).sum(), rtol=1e-5)
    W = jnp.asarray(rng.random((Xd.shape[0], 6)).astype(np.float32))
    H = jnp.asarray(rng.random((6, Xd.shape[1])).astype(np.float32))
    vals = np.asarray(matops.sddmm(W, H, X))
    WH = np.asarray(W) @ np.asarray(H)
    r, c = np.asarray(X.row_idx), np.asarray(X.col_idx)
    np.testing.assert_allclose(vals, WH[r, c], rtol=2e-5, atol=1e-6)


def test_transpose():
    Xd, X, rng = make()
    Xt = matops.transpose(X)
    D = jnp.asarray(rng.random((Xd.shape[0], 5)).astype(np.float32))
    got = np.asarray(matops.mm(Xt, D))
    np.testing.assert_allclose(got, Xd.T @ np.asarray(D), rtol=2e-5, atol=1e-5)


def test_solver_with_tiled_matches_bcoo():
    from jax.experimental import sparse as jsparse

    Xd, X, rng = make(p=140, n=120, density=0.1)
    Xs = jsparse.BCOO.fromdense(jnp.asarray(Xd))
    k = 4
    W0 = jnp.asarray(rng.random((Xd.shape[0], k)).astype(np.float32))
    H0 = jnp.asarray(rng.random((k, Xd.shape[1])).astype(np.float32))
    alg = nmf_tpu.MultUpdate(obj="mse", maxiter=5)
    a = nmf_tpu.solve(alg, Xs, W0, H0)
    b = nmf_tpu.solve(alg, X, W0, H0)
    assert b.niters == a.niters
    np.testing.assert_allclose(np.asarray(b.W), np.asarray(a.W), rtol=1e-4, atol=1e-6)
    assert np.isclose(b.objvalue, a.objvalue, rtol=1e-4)


def test_pallas_sddmm_kernel_matches_dense():
    """The compact-layout Pallas SDDMM (interpret on CPU) == dense sampling,
    for both natural and degree ordering (reference src/multupd.jl:170-192
    samples WH at X's pattern)."""
    from nmf_tpu.ops.pallas.sparse import tiled_sddmm
    from nmf_tpu.ops.sparse_format import build_tiled

    rng = np.random.default_rng(3)
    p, n, k = 400, 300, 9
    Xd = (rng.random((p, n)) * (rng.random((p, n)) < 0.04)).astype(np.float32)
    r, c = np.nonzero(Xd)
    W = jnp.asarray(rng.random((p, k)).astype(np.float32))
    H = jnp.asarray(rng.random((k, n)).astype(np.float32))
    WH = np.asarray(W) @ np.asarray(H)
    for order in ("natural", "degree"):
        X = build_tiled(r, c, Xd[r, c], Xd.shape, stripe_tiles=2, order=order)
        got = np.asarray(tiled_sddmm(X, W, H))
        ref = WH[np.asarray(X.row_idx), np.asarray(X.col_idx)]
        np.testing.assert_allclose(got, ref, rtol=2e-5, atol=1e-5)


def test_with_values_gather_matches_rebuild():
    """The inv-map gather refresh == rebuilding the tiling from the new
    values; instances without the per-region refresh maps (pre-round-3
    pickles) raise instead of mis-refreshing (ADVICE r3)."""
    import dataclasses

    Xd, X, rng = make()
    v = matops.nnz_values(X)
    new = v * 2.5 + 0.1
    a = X.with_values(new)
    rebuilt = build_tiled(
        np.asarray(X.row_idx), np.asarray(X.col_idx), np.asarray(new),
        X.shape, stripe_tiles=2, group=8,
    )
    np.testing.assert_allclose(
        np.asarray(a.fwd.vals), np.asarray(rebuilt.fwd.vals), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(a.bwd.vals), np.asarray(rebuilt.bwd.vals), rtol=1e-6
    )
    legacy = dataclasses.replace(
        X,
        fwd=dataclasses.replace(X.fwd, inv=None),
        bwd=dataclasses.replace(X.bwd, inv=None),
    )
    with pytest.raises(ValueError, match="legacy"):
        legacy.with_values(new)


def test_hybrid_dense_tiles_match_dense():
    """The hybrid dense-tile store (dense_tile_nnz): mm/mtm/sddmm and value
    refreshes agree with dense math for both orderings."""
    from nmf_tpu.ops.pallas.sparse import tiled_mm, tiled_mtm, tiled_sddmm
    from nmf_tpu.ops.sparse_format import build_tiled

    rng = np.random.default_rng(7)
    p, n, k = 700, 520, 9
    Xd = (rng.random((p, n)) * (rng.random((p, n)) < 0.03)).astype(np.float32)
    # a dense head block so some tiles cross the threshold
    Xd[:200, :256] = (
        rng.random((200, 256)) * (rng.random((200, 256)) < 0.5)
    ).astype(np.float32)
    r, c = np.nonzero(Xd)
    for order in ("natural", "degree"):
        X = build_tiled(
            r, c, Xd[r, c], Xd.shape, stripe_tiles=3, group=8, order=order,
            dense_tile_nnz=256,
        )
        assert X.fwd.n_dblocks > 0
        D = jnp.asarray(rng.random((n, k)).astype(np.float32))
        np.testing.assert_allclose(
            np.asarray(tiled_mm(X, D)), Xd @ np.asarray(D), rtol=3e-5, atol=2e-4
        )
        D2 = jnp.asarray(rng.random((p, k)).astype(np.float32))
        np.testing.assert_allclose(
            np.asarray(tiled_mtm(X, D2)), Xd.T @ np.asarray(D2), rtol=3e-5, atol=2e-4
        )
        W = jnp.asarray(rng.random((p, k)).astype(np.float32))
        H = jnp.asarray(rng.random((k, n)).astype(np.float32))
        got = np.asarray(tiled_sddmm(X, W, H))
        ref = (np.asarray(W) @ np.asarray(H))[
            np.asarray(X.row_idx), np.asarray(X.col_idx)
        ]
        np.testing.assert_allclose(got, ref, rtol=3e-5, atol=1e-4)
        Y = matops.scale_values(X, matops.nnz_values(X) * 2.0)
        np.testing.assert_allclose(
            np.asarray(tiled_mm(Y, D)), (2 * Xd) @ np.asarray(D), rtol=3e-5, atol=4e-4
        )


def test_hybrid_solver_matches_bcoo():
    from jax.experimental import sparse as jsparse
    from nmf_tpu.ops.sparse_format import build_tiled

    rng = np.random.default_rng(8)
    p, n, k = 300, 260, 4
    Xd = (rng.random((p, n)) * (rng.random((p, n)) < 0.05)).astype(np.float32)
    Xd[:128, :128] = (
        rng.random((128, 128)) * (rng.random((128, 128)) < 0.4)
    ).astype(np.float32)
    r, c = np.nonzero(Xd)
    X = build_tiled(r, c, Xd[r, c], Xd.shape, stripe_tiles=2, dense_tile_nnz=200)
    assert X.fwd.n_dblocks > 0
    Xs = jsparse.BCOO.fromdense(jnp.asarray(Xd))
    W0 = jnp.asarray(rng.random((p, k)).astype(np.float32))
    H0 = jnp.asarray(rng.random((k, n)).astype(np.float32))
    for alg in (
        nmf_tpu.MultUpdate(obj="mse", maxiter=5),
        nmf_tpu.MultUpdate(obj="div", maxiter=5),
        nmf_tpu.CoordinateDescent(maxiter=5),
    ):
        a = nmf_tpu.solve(alg, Xs, W0, H0)
        b = nmf_tpu.solve(alg, X, W0, H0)
        assert b.niters == a.niters
        np.testing.assert_allclose(np.asarray(b.W), np.asarray(a.W), rtol=2e-4, atol=1e-4)
        assert np.isclose(b.objvalue, a.objvalue, rtol=1e-4)

@pytest.mark.parametrize("tail_span", [2, 4, 16])  # 16 = the config6 span
def test_wide_tail_tiles_match_dense(tail_span):
    """tail_span > 1 (128 x span*128 wide chunk tiles for ultra-sparse
    residuals): mm/mtm/sddmm and value refreshes agree with dense math,
    with and without a dense head (ADVICE r2: this shipped build option
    previously had no suite coverage)."""
    from nmf_tpu.ops.pallas.sparse import tiled_mm, tiled_mtm, tiled_sddmm
    from nmf_tpu.ops.sparse_format import build_tiled

    rng = np.random.default_rng(17)
    p, n, k = 700, 520, 9
    Xd = (rng.random((p, n)) * (rng.random((p, n)) < 0.008)).astype(np.float32)
    Xd[:200, :256] = (
        rng.random((200, 256)) * (rng.random((200, 256)) < 0.5)
    ).astype(np.float32)
    r, c = np.nonzero(Xd)
    for dense_tile_nnz in (None, 256):
        X = build_tiled(
            r, c, Xd[r, c], Xd.shape, stripe_tiles=3, group=8, order="degree",
            dense_tile_nnz=dense_tile_nnz, tail_span=tail_span,
        )
        if dense_tile_nnz:
            assert X.fwd.n_dblocks > 0
        D = jnp.asarray(rng.random((n, k)).astype(np.float32))
        np.testing.assert_allclose(
            np.asarray(tiled_mm(X, D)), Xd @ np.asarray(D), rtol=3e-5, atol=2e-4
        )
        D2 = jnp.asarray(rng.random((p, k)).astype(np.float32))
        np.testing.assert_allclose(
            np.asarray(tiled_mtm(X, D2)), Xd.T @ np.asarray(D2), rtol=3e-5, atol=2e-4
        )
        W = jnp.asarray(rng.random((p, k)).astype(np.float32))
        H = jnp.asarray(rng.random((k, n)).astype(np.float32))
        got = np.asarray(tiled_sddmm(X, W, H))
        ref = (np.asarray(W) @ np.asarray(H))[
            np.asarray(X.row_idx), np.asarray(X.col_idx)
        ]
        np.testing.assert_allclose(got, ref, rtol=3e-5, atol=1e-4)
        Y = matops.scale_values(X, matops.nnz_values(X) * 2.0)
        np.testing.assert_allclose(
            np.asarray(tiled_mm(Y, D)), (2 * Xd) @ np.asarray(D), rtol=3e-5, atol=4e-4
        )


@pytest.mark.parametrize("stripe_tiles", [32, 64])
def test_rp_packing_paths_match_dense(stripe_tiles):
    """The kernel's two rp scalar-prefetch encodings (north-star SMEM fix):
    stripe_tiles <= 32 packs row panels at 5 bits / 6 per word with dynamic
    word+shift; larger stripes keep the 4-byte-lane form.  Both must agree
    with dense math, with row panels actually exercising the high rp values
    (rows span > 32 panels per stripe for the 8-bit case)."""
    from nmf_tpu.ops.pallas.sparse import tiled_mm, tiled_mtm, tiled_sddmm
    from nmf_tpu.ops.sparse_format import TILE, build_tiled

    rng = np.random.default_rng(23)
    p, n, k = stripe_tiles * TILE + 3 * TILE, 520, 9  # rp reaches stripe_tiles-1
    nnz = 6000
    r = rng.integers(0, p, nnz)
    c = rng.integers(0, n, nnz)
    Xd = np.zeros((p, n), np.float32)
    Xd[r, c] = rng.random(nnz).astype(np.float32)
    r, c = np.nonzero(Xd)
    X = build_tiled(r, c, Xd[r, c], Xd.shape, stripe_tiles=stripe_tiles,
                    order="natural")
    D = jnp.asarray(rng.random((n, k)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(tiled_mm(X, D)), Xd @ np.asarray(D), rtol=3e-5, atol=2e-4
    )
    D2 = jnp.asarray(rng.random((p, k)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(tiled_mtm(X, D2)), Xd.T @ np.asarray(D2), rtol=3e-5, atol=2e-4
    )
    W = jnp.asarray(rng.random((p, k)).astype(np.float32))
    H = jnp.asarray(rng.random((k, n)).astype(np.float32))
    got = np.asarray(tiled_sddmm(X, W, H))
    ref = (np.asarray(W) @ np.asarray(H))[
        np.asarray(X.row_idx), np.asarray(X.col_idx)
    ]
    np.testing.assert_allclose(got, ref, rtol=3e-5, atol=1e-4)


def test_stripe_tiles_packing_guard():
    """stripe_tiles beyond the byte-packed row-panel range must raise, not
    silently corrupt kernel output (ADVICE r2)."""
    from nmf_tpu.ops.sparse_format import TILE, _build_side_compact

    p = 300 * TILE  # 300 row panels
    rows = np.arange(0, p, TILE, dtype=np.int32)
    cols = np.zeros_like(rows)
    vals = np.ones(len(rows), np.float32)
    with pytest.raises(ValueError, match="stripe_tiles"):
        _build_side_compact(rows, cols, vals, p, 128, 300, 8)


@pytest.mark.parametrize("quad_seg", [32, 16])
def test_quad_tail_tiles_match_dense(quad_seg):
    """quad_tail_nnz: small tiles packed TILE//quad_seg per chunk (quad_seg-
    slot sub-segments, one row panel each; seg 32 = quad, seg 16 = the
    deep-tail octa variant).  mm/mtm/sddmm and value refreshes agree with
    dense math, with and without the dense-head store."""
    from nmf_tpu.ops.pallas.sparse import tiled_mm, tiled_mtm, tiled_sddmm
    from nmf_tpu.ops.sparse_format import build_tiled

    rng = np.random.default_rng(23)
    p, n, k = 700, 520, 9
    Xd = (rng.random((p, n)) * (rng.random((p, n)) < 0.01)).astype(np.float32)
    Xd[:200, :256] = (
        rng.random((200, 256)) * (rng.random((200, 256)) < 0.5)
    ).astype(np.float32)
    # a mid-density band that stays in plain chunks (> 32 nnz, < dense)
    Xd[256:384, 256:384] = (
        rng.random((128, 128)) * (rng.random((128, 128)) < 0.005)
    ).astype(np.float32)
    r, c = np.nonzero(Xd)
    for dense_tile_nnz in (None, 256):
        X = build_tiled(
            r, c, Xd[r, c], Xd.shape, stripe_tiles=3, group=8, order="degree",
            dense_tile_nnz=dense_tile_nnz, quad_tail_nnz=min(32, quad_seg),
            quad_seg=quad_seg,
        )
        assert X.fwd.n_qchunks > 0
        if dense_tile_nnz:
            assert X.fwd.n_dblocks > 0
        D = jnp.asarray(rng.random((n, k)).astype(np.float32))
        np.testing.assert_allclose(
            np.asarray(tiled_mm(X, D)), Xd @ np.asarray(D), rtol=3e-5, atol=2e-4
        )
        D2 = jnp.asarray(rng.random((p, k)).astype(np.float32))
        np.testing.assert_allclose(
            np.asarray(tiled_mtm(X, D2)), Xd.T @ np.asarray(D2), rtol=3e-5, atol=2e-4
        )
        W = jnp.asarray(rng.random((p, k)).astype(np.float32))
        H = jnp.asarray(rng.random((k, n)).astype(np.float32))
        got = np.asarray(tiled_sddmm(X, W, H))
        ref = (np.asarray(W) @ np.asarray(H))[
            np.asarray(X.row_idx), np.asarray(X.col_idx)
        ]
        np.testing.assert_allclose(got, ref, rtol=3e-5, atol=1e-4)
        Y = matops.scale_values(X, matops.nnz_values(X) * 2.0)
        np.testing.assert_allclose(
            np.asarray(tiled_mm(Y, D)), (2 * Xd) @ np.asarray(D), rtol=3e-5, atol=4e-4
        )


def test_quad_tail_solver_matches_bcoo():
    """Full solver runs on a quad-tail TiledCSR match the BCOO reference
    path (mm/mtm/sddmm + value refresh all flow through the quad store)."""
    from jax.experimental import sparse as jsparse
    from nmf_tpu.ops.sparse_format import build_tiled

    rng = np.random.default_rng(29)
    p, n, k = 300, 260, 4
    Xd = (rng.random((p, n)) * (rng.random((p, n)) < 0.02)).astype(np.float32)
    Xd[:128, :128] = (
        rng.random((128, 128)) * (rng.random((128, 128)) < 0.4)
    ).astype(np.float32)
    r, c = np.nonzero(Xd)
    X = build_tiled(
        r, c, Xd[r, c], Xd.shape, stripe_tiles=2, dense_tile_nnz=200,
        quad_tail_nnz=32,
    )
    assert X.fwd.n_qchunks > 0 and X.fwd.n_dblocks > 0
    Xs = jsparse.BCOO.fromdense(jnp.asarray(Xd))
    W0 = jnp.asarray(rng.random((p, k)).astype(np.float32))
    H0 = jnp.asarray(rng.random((k, n)).astype(np.float32))
    for alg in (
        nmf_tpu.MultUpdate(obj="mse", maxiter=5),
        nmf_tpu.MultUpdate(obj="div", maxiter=5),
        nmf_tpu.CoordinateDescent(maxiter=5),
        nmf_tpu.GreedyCD(maxiter=5),
    ):
        a = nmf_tpu.solve(alg, Xs, W0, H0)
        b = nmf_tpu.solve(alg, X, W0, H0)
        assert b.niters == a.niters
        np.testing.assert_allclose(np.asarray(b.W), np.asarray(a.W), rtol=2e-4, atol=1e-4)
        assert np.isclose(b.objvalue, a.objvalue, rtol=1e-4)


def test_slim_matches_full_solve():
    """slim() (the capacity-scale device view) must not change solver
    results: the mm/mtm kernels and the Gram-identity objective read none
    of the dropped maps, and stats serve sq_norm/total_sum/all_nonneg."""
    Xd, X, rng = make()
    S = X.slim()
    np.testing.assert_allclose(float(matops.sq_norm(S)), (Xd**2).sum(), rtol=1e-5)
    np.testing.assert_allclose(
        float(matops.total_sum(S)), Xd.sum(), rtol=1e-5
    )
    assert bool(matops.all_nonneg(S))
    assert S.dtype == X.dtype
    W0 = jnp.asarray(rng.random((Xd.shape[0], 8)).astype(np.float32))
    H0 = jnp.asarray(rng.random((8, Xd.shape[1])).astype(np.float32))
    from nmf_tpu.models.coorddesc import CoordinateDescent

    alg = CoordinateDescent(maxiter=5, tol=1e-30)
    a = nmf_tpu.solve(alg, X, W0, H0)
    b = nmf_tpu.solve(alg, S, W0, H0)
    np.testing.assert_allclose(np.asarray(b.W), np.asarray(a.W), rtol=1e-5, atol=1e-6)
    assert np.isclose(b.objvalue, a.objvalue, rtol=1e-5)


def test_renumbered_solve_matches_natural():
    """Degree-ordered TiledCSR solves run in renumbered coordinates (the
    skeleton pre-permutes the factors once and strips the tiling's perms —
    no per-product factor gathers); results must match the natural-order
    tiling up to float summation order."""
    rng = np.random.default_rng(5)
    p, n, k = 500, 380, 6
    Xd = np.maximum(rng.random((p, k)) @ rng.random((k, n)), 0)
    Xd = (Xd * (rng.random((p, n)) < 0.15)).astype(np.float32)
    r, c = np.nonzero(Xd)
    Xdeg = build_tiled(r, c, Xd[r, c], Xd.shape, order="degree")
    Xnat = build_tiled(r, c, Xd[r, c], Xd.shape, order="natural")
    W0 = jnp.asarray(rng.random((p, k)).astype(np.float32))
    H0 = jnp.asarray(rng.random((k, n)).astype(np.float32))
    for alg in (
        nmf_tpu.CoordinateDescent(maxiter=6, tol=1e-30),
        nmf_tpu.GreedyCD(maxiter=4, tol=1e-30),
        nmf_tpu.MultUpdate(obj="mse", maxiter=6, tol=1e-30),
    ):
        a = nmf_tpu.solve(alg, Xdeg, W0, H0)
        b = nmf_tpu.solve(alg, Xnat, W0, H0)
        assert a.niters == b.niters
        np.testing.assert_allclose(
            np.asarray(a.W), np.asarray(b.W), rtol=2e-4, atol=2e-5
        )
        assert np.isclose(a.objvalue, b.objvalue, rtol=1e-4)
    # the KL solver runs renumbered too (round 5): its CSR-order value
    # refreshes are order-independent of the tiling's coordinate space
    kl = nmf_tpu.MultUpdate(obj="div", maxiter=4, tol=1e-30)
    from nmf_tpu.models.common import _renumber_ok

    assert _renumber_ok(kl, Xdeg)
    a = nmf_tpu.solve(kl, Xdeg, W0, H0)
    b = nmf_tpu.solve(kl, Xnat, W0, H0)
    np.testing.assert_allclose(
        np.asarray(a.W), np.asarray(b.W), rtol=2e-3, atol=2e-4
    )


# ---------------------------------------------------------------------------
# Round-5 COO dust band (coo_tail_nnz)


def _powerlaw_coo(seed=11, p=700, n=520, nnz=24000):
    rng = np.random.default_rng(seed)
    r = np.minimum((rng.pareto(1.2, nnz) * p / 50), p - 1).astype(np.int64)
    c = np.minimum((rng.pareto(1.2, nnz) * n / 50), n - 1).astype(np.int64)
    key = np.unique(r * n + c)
    r, c = (key // n).astype(np.int32), (key % n).astype(np.int32)
    v = rng.random(len(r)).astype(np.float32)
    Xd = np.zeros((p, n), np.float32)
    Xd[r, c] = v
    return Xd, r, c, v, rng


@pytest.mark.parametrize(
    "opts",
    [
        dict(dense_tile_nnz=64, quad_tail_nnz=32, coo_tail_nnz=3),
        dict(coo_tail_nnz=2),
        dict(dense_tile_nnz=48, coo_tail_nnz=5, order="natural"),
        dict(dense_tile_nnz=64, quad_tail_nnz=16, quad_seg=16, coo_tail_nnz=3),
        dict(coo_tail_nnz=1000000),  # everything below dense -> COO band
    ],
    ids=["four-class", "coo-only-knob", "natural", "octa", "all-coo"],
)
def test_coo_band_matches_dense(opts):
    """Tiles at or below coo_tail_nnz ride the XLA segment-sum band; every
    product and the value-refresh path must match the dense reference."""
    from nmf_tpu.ops.pallas.sparse import tiled_mm, tiled_mtm, tiled_sddmm

    Xd, r, c, v, rng = _powerlaw_coo()
    p, n = Xd.shape
    k = 9
    X = build_tiled(r, c, v, (p, n), **opts)
    assert X.fwd.n_coo > 0 and X.bwd.n_coo > 0
    D = jnp.asarray(rng.random((n, k)).astype(np.float32))
    E = jnp.asarray(rng.random((p, k)).astype(np.float32))
    W = jnp.asarray(rng.random((p, k)).astype(np.float32))
    H = jnp.asarray(rng.random((k, n)).astype(np.float32))
    scale = np.abs(Xd).sum()
    np.testing.assert_allclose(
        np.asarray(tiled_mm(X, D)), Xd @ np.asarray(D),
        rtol=1e-5, atol=1e-6 * scale)
    np.testing.assert_allclose(
        np.asarray(tiled_mtm(X, E)), Xd.T @ np.asarray(E),
        rtol=1e-5, atol=1e-6 * scale)
    np.testing.assert_allclose(
        np.asarray(tiled_sddmm(X, W, H)),
        (np.asarray(W) @ np.asarray(H))[r, c], rtol=1e-5, atol=1e-5)
    # value refresh covers the COO region
    X2 = X.with_values(jnp.asarray(v * 3))
    np.testing.assert_allclose(
        np.asarray(tiled_mm(X2, D)), 3 * (Xd @ np.asarray(D)),
        rtol=1e-5, atol=3e-6 * scale)


def test_coo_band_slim_solve_and_renumber():
    """slim() keeps the COO band operands (kernels need them) while
    dropping its refresh map; a renumbered MSE solve over the slimmed
    four-class store matches the unslimmed natural-order solve."""
    Xd, r, c, v, rng = _powerlaw_coo(seed=12)
    p, n = Xd.shape
    k = 6
    Xs = build_tiled(
        r, c, v, (p, n), dense_tile_nnz=64, coo_tail_nnz=4
    ).slim()
    assert Xs.fwd.coo_vals is not None and Xs.fwd.coo_nnz is None
    Xnat = build_tiled(r, c, v, (p, n), order="natural", coo_tail_nnz=4)
    W0 = jnp.asarray(rng.random((p, k)).astype(np.float32))
    H0 = jnp.asarray(rng.random((k, n)).astype(np.float32))
    alg = nmf_tpu.CoordinateDescent(maxiter=5, tol=1e-30)
    a = nmf_tpu.solve(alg, Xs, W0, H0)
    b = nmf_tpu.solve(alg, Xnat, W0, H0)
    assert a.niters == b.niters
    np.testing.assert_allclose(
        np.asarray(a.W), np.asarray(b.W), rtol=2e-4, atol=2e-5)
    assert np.isclose(a.objvalue, b.objvalue, rtol=1e-4)


def test_coo_band_kl_solve_matches():
    """MU-div (sddmm + scale_values each iteration) over a four-class store
    with a COO band matches the no-band tiling."""
    Xd, r, c, v, rng = _powerlaw_coo(seed=13)
    p, n = Xd.shape
    k = 5
    Xc = build_tiled(r, c, v, (p, n), dense_tile_nnz=64, coo_tail_nnz=4)
    Xp = build_tiled(r, c, v, (p, n), dense_tile_nnz=64)
    W0 = jnp.asarray(rng.random((p, k)).astype(np.float32))
    H0 = jnp.asarray(rng.random((k, n)).astype(np.float32))
    alg = nmf_tpu.MultUpdate(obj="div", maxiter=4, tol=1e-30)
    a = nmf_tpu.solve(alg, Xc, W0, H0)
    b = nmf_tpu.solve(alg, Xp, W0, H0)
    np.testing.assert_allclose(
        np.asarray(a.W), np.asarray(b.W), rtol=2e-3, atol=2e-4)
    assert np.isclose(a.objvalue, b.objvalue, rtol=1e-3)
