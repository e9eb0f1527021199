"""Sharded execution on a simulated 8-device CPU mesh: sharded results must
equal replicated results, and the canonical layout must actually distribute
the arrays."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import nmf_tpu as M
from nmf_tpu.parallel.mesh import auto_mesh_shape, make_mesh
from nmf_tpu.parallel.sharding import shard_problem


requires_multidevice = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 simulated devices"
)


def test_auto_mesh_shape():
    assert auto_mesh_shape(8) == (2, 4)
    assert auto_mesh_shape(4) == (2, 2)
    assert auto_mesh_shape(16) == (4, 4)
    assert auto_mesh_shape(1) == (1, 1)
    assert auto_mesh_shape(7) == (1, 7)


@requires_multidevice
def test_mesh_creation():
    mesh = make_mesh()
    assert set(mesh.axis_names) == {"rows", "cols"}
    assert np.prod(list(mesh.shape.values())) == 8


@requires_multidevice
@pytest.mark.parametrize("alg", ["multmse", "multdiv", "projals", "cd", "greedycd", "alspgrad"])
def test_sharded_equals_replicated(alg):
    rng = np.random.default_rng(111)
    p, n, k = 32, 48, 4
    Wg = np.maximum(rng.random((p, k)) - 0.2, 0)
    Hg = np.maximum(rng.random((k, n)) - 0.2, 0)
    X = Wg @ Hg + 0.01 * rng.random((p, n))
    W0 = rng.random((p, k))
    H0 = rng.random((k, n))

    mesh = make_mesh()

    ref = M.nnmf(
        jnp.asarray(X), k, alg=alg, init="custom",
        W0=jnp.asarray(W0), H0=jnp.asarray(H0), maxiter=12,
    )
    shd = M.nnmf(
        jnp.asarray(X), k, alg=alg, init="custom",
        W0=jnp.asarray(W0), H0=jnp.asarray(H0), maxiter=12, mesh=mesh,
    )
    assert shd.niters == ref.niters
    assert shd.converged == ref.converged
    np.testing.assert_allclose(
        np.asarray(shd.W), np.asarray(ref.W), rtol=1e-8, atol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(shd.H), np.asarray(ref.H), rtol=1e-8, atol=1e-10
    )
    assert np.isclose(shd.objvalue, ref.objvalue, rtol=1e-8)


@requires_multidevice
def test_shard_problem_layout():
    rng = np.random.default_rng(112)
    mesh = make_mesh()
    X = jnp.asarray(rng.random((16, 16)))
    W = jnp.asarray(rng.random((16, 4)))
    H = jnp.asarray(rng.random((4, 16)))
    Xs, Ws, Hs = shard_problem(mesh, X, W, H)
    # X is 2-D block sharded: each device holds a strict subset
    assert len(Xs.sharding.device_set) == 8
    x_shard = Xs.addressable_shards[0]
    assert x_shard.data.shape[0] < 16 or x_shard.data.shape[1] < 16
    # W row-sharded, k replicated
    w_shard = Ws.addressable_shards[0]
    assert w_shard.data.shape[1] == 4
    # H col-sharded, k replicated
    h_shard = Hs.addressable_shards[0]
    assert h_shard.data.shape[0] == 4


@requires_multidevice
def test_sharded_nndsvd_init_end_to_end():
    rng = np.random.default_rng(113)
    X = np.abs(rng.random((64, 64)))
    mesh = make_mesh()
    ret = M.nnmf(jnp.asarray(X), 8, alg="greedycd", init="nndsvdar", maxiter=5, mesh=mesh)
    assert np.isfinite(ret.objvalue)


@requires_multidevice
def test_sharded_replicates_and_update_H():
    rng = np.random.default_rng(115)
    p, n, k = 32, 32, 4
    X = np.abs(rng.random((p, n))).astype(np.float64)
    mesh = make_mesh()
    ret = M.nnmf(
        jnp.asarray(X), k, alg="multmse", init="random", replicates=3,
        maxiter=8, mesh=mesh, seed=2,
    )
    assert np.isfinite(ret.objvalue)
    W0 = np.abs(rng.random((p, k)))
    H0 = np.abs(rng.random((k, n))) + 0.01
    ret2 = M.nnmf(
        jnp.asarray(X), k, alg="cd", init="custom", W0=W0, H0=H0,
        update_H=False, maxiter=8, mesh=mesh,
    )
    assert np.array_equal(np.asarray(ret2.H), H0)
