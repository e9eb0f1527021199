"""On-device TPU smoke lane: real Mosaic lowering of the sparse kernels plus
one solve per solver family, with NaN guards.

Run on the chip with::

    NMF_TPU_LANE=1 python -m pytest tests -m tpu -q

(one TPU process at a time; see CLAUDE.md).  In the default CPU-pinned test
run every test here is skipped.  This lane exists because the CPU suite only
ever *interprets* the Pallas kernels — a regression in the real lowering
(e.g. an unsupported dot precision leaking in from a solver's
default_matmul_precision scope) is otherwise visible only in benchmarks.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = [
    pytest.mark.tpu,
    pytest.mark.skipif(
        jax.default_backend() not in ("tpu", "axon"),
        reason="needs a real TPU (NMF_TPU_LANE=1)",
    ),
]

import nmf_tpu
from nmf_tpu.ops.sparse_format import build_tiled


@pytest.fixture(scope="module")
def tiled_problem():
    rng = np.random.default_rng(0)
    p, n = 2000, 1500
    Xd = (rng.random((p, n)) * (rng.random((p, n)) < 0.02)).astype(np.float32)
    r, c = np.nonzero(Xd)
    X = build_tiled(r, c, Xd[r, c], Xd.shape)
    return Xd, X, rng


def test_tiled_mm_matches_dense_on_chip(tiled_problem):
    Xd, X, rng = tiled_problem
    from nmf_tpu.ops import matops

    D = jnp.asarray(rng.random((Xd.shape[1], 64)).astype(np.float32))
    got = np.asarray(matops.mm(X, D))
    np.testing.assert_allclose(got, Xd @ np.asarray(D), rtol=3e-5, atol=1e-3)
    D2 = jnp.asarray(rng.random((Xd.shape[0], 64)).astype(np.float32))
    got2 = np.asarray(matops.mtm(D2.T, X).T)
    np.testing.assert_allclose(got2, Xd.T @ np.asarray(D2), rtol=3e-5, atol=1e-3)


def test_tiled_sddmm_matches_dense_on_chip(tiled_problem):
    Xd, X, rng = tiled_problem
    from nmf_tpu.ops.pallas.sparse import tiled_sddmm

    W = jnp.asarray(rng.random((Xd.shape[0], 16)).astype(np.float32))
    H = jnp.asarray(rng.random((16, Xd.shape[1])).astype(np.float32))
    got = np.asarray(tiled_sddmm(X, W, H))
    ref = (np.asarray(W) @ np.asarray(H))[np.asarray(X.row_idx), np.asarray(X.col_idx)]
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=1e-4)


def test_tiled_multdiv_solve_on_chip(tiled_problem):
    """multdiv on tiled X exercises the Pallas SDDMM inside the jitted solve
    loop under the solver's default_matmul_precision scope."""
    Xd, X, rng = tiled_problem
    res = nmf_tpu.solve(
        nmf_tpu.MultUpdate(obj="div", maxiter=5),
        X,
        jnp.asarray(rng.random((Xd.shape[0], 8)).astype(np.float32)),
        jnp.asarray(rng.random((8, Xd.shape[1])).astype(np.float32)),
    )
    assert res.niters == 5 and np.isfinite(res.objvalue)
    assert not np.isnan(np.asarray(res.W)).any()


@pytest.mark.parametrize("algname", ["multmse", "projals", "cd", "greedycd", "alspgrad"])
def test_dense_solvers_finite_on_chip(algname):
    """Each solver survives its configured TPU matmul precision on a
    low-rank + noise problem (regression: projals' reduced-precision Gram
    went indefinite -> NaN Cholesky at large scale)."""
    rng = np.random.default_rng(1)
    p, n, k = 4096, 2048, 64
    Xd = rng.random((p, k), dtype=np.float32) @ rng.random((k, n), dtype=np.float32)
    Xd += 0.01 * rng.random((p, n), dtype=np.float32)
    X = jnp.asarray(Xd)
    W = jnp.asarray(rng.random((p, k), dtype=np.float32))
    H = jnp.asarray(rng.random((k, n), dtype=np.float32))
    algs = {
        "multmse": nmf_tpu.MultUpdate(obj="mse", maxiter=5),
        "projals": nmf_tpu.ProjectedALS(maxiter=5),
        "cd": nmf_tpu.CoordinateDescent(maxiter=5),
        "greedycd": nmf_tpu.GreedyCD(maxiter=3),
        "alspgrad": nmf_tpu.ALSPGrad(maxiter=2, maxsubiter=5),
    }
    res = nmf_tpu.solve(algs[algname], X, W, H)
    assert np.isfinite(res.objvalue)
    assert not np.isnan(np.asarray(res.W)).any()
    assert not np.isnan(np.asarray(res.H)).any()


def test_sharded_single_chip_mesh():
    """The sharded code path compiles and runs on a (1, 1) device mesh on the
    chip (the multi-chip layout with one real device)."""
    from nmf_tpu.parallel.mesh import make_mesh
    from nmf_tpu.parallel.sharding import shard_problem

    rng = np.random.default_rng(2)
    X = jnp.asarray(rng.random((512, 512), dtype=np.float32))
    W = jnp.asarray(rng.random((512, 8), dtype=np.float32))
    H = jnp.asarray(rng.random((8, 512), dtype=np.float32))
    mesh = make_mesh((1, 1), devices=jax.devices()[:1])
    X, W, H = shard_problem(mesh, X, W, H)
    res = nmf_tpu.solve(nmf_tpu.MultUpdate(obj="mse", maxiter=5), X, W, H)
    assert res.niters == 5 and np.isfinite(res.objvalue)


def test_sharded_sparse_compact_single_chip_mesh():
    """The compact sharded sparse kernels (chunk windows + dense-tile +
    quad-tail) lower through Mosaic inside shard_map on a (1, 1) mesh and
    match the dense products — the CPU suite only ever runs the jnp
    fallback inside shard_map, so this is the only Mosaic coverage of the
    mesh-parallel compact path."""
    from nmf_tpu.ops.sparse_shard import shard_tiled, sharded_mm, sharded_mtm
    from nmf_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(5)
    p, n = 2000, 1500
    Xd = (rng.random((p, n)) * (rng.random((p, n)) < 0.005)).astype(np.float32)
    Xd[:130, :130] += (
        (rng.random((130, 130)) < 0.9) * rng.random((130, 130))
    ).astype(np.float32)
    # guaranteed quad + COO tiles on clean 128-boundaries with natural
    # order (per-block degree compaction at this tiny scale merges any
    # constructed dust band — same trick as __graft_entry__'s lattice)
    d20 = np.arange(20)
    Xd[256:384, 256:384] = 0  # clear the background inside the quad tile
    Xd[256 + d20, 256 + d20] = 0.5
    Xd[1792:1920, 1280:1408] = 0  # and inside the COO tile
    Xd[1900, 1400] = 0.25
    r, c = np.nonzero(Xd)
    mesh = make_mesh((1, 1), devices=jax.devices()[:1])
    X = shard_tiled(
        r, c, Xd[r, c], Xd.shape, mesh, dense_tile_nnz=130, quad_tail_nnz=32,
        coo_tail_nnz=2, order="natural",
    )
    assert X.fwd.n_dblocks and X.fwd.n_qchunks and X.fwd.n_coo
    D = jnp.asarray(rng.random((n, 64)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(sharded_mm(X, D)), Xd @ np.asarray(D), rtol=3e-5, atol=1e-3
    )
    D2 = jnp.asarray(rng.random((p, 64)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(sharded_mtm(X, D2)), Xd.T @ np.asarray(D2), rtol=3e-5,
        atol=1e-3,
    )
    # one divergence sweep exercises sddmm/scale_values/ids on the compact
    # sharded layout on-chip
    res = nmf_tpu.solve(
        nmf_tpu.MultUpdate(obj="div", maxiter=3),
        X,
        jnp.asarray(np.abs(rng.random((p, 8))).astype(np.float32)),
        jnp.asarray(np.abs(rng.random((8, n))).astype(np.float32)),
    )
    assert res.niters == 3 and np.isfinite(res.objvalue)
