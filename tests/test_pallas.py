"""Pallas kernel correctness in interpreter mode (CPU).

The kernels' numerics were additionally validated on a real v5e chip (see
config.py for the measured dispatch decision); these tests keep them
correct under CI without TPU hardware.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental.pallas import tpu as pltpu

from nmf_tpu.ops.pallas.objectives import kl_objective_pallas, mse_objective_pallas
from nmf_tpu.ops.pallas.mu import mu_factor_update, qht, wtq
from nmf_tpu.ops.pallas.elementwise import normalize1_cols_pallas, projectnn_pallas


@pytest.fixture(scope="module")
def problem():
    rng = np.random.default_rng(0)
    p, n, k = 300, 280, 8  # non-multiples of the tile sizes
    X = jnp.asarray(rng.random((p, n)), jnp.float32)
    W = jnp.asarray(rng.random((p, k)), jnp.float32)
    H = jnp.asarray(rng.random((k, n)), jnp.float32)
    return X, W, H


def test_mse_objective(problem):
    X, W, H = problem
    with pltpu.force_tpu_interpret_mode():
        got = float(mse_objective_pallas(X, W, H))
    want = float(0.5 * jnp.sum((X - W @ H) ** 2))
    assert np.isclose(got, want, rtol=1e-5)


def test_kl_objective(problem):
    X, W, H = problem
    import nmf_tpu

    with pltpu.force_tpu_interpret_mode():
        got = float(kl_objective_pallas(X, W, H))
    want = float(nmf_tpu.gkldiv(X, W @ H))
    assert np.isclose(got, want, rtol=1e-5)


def test_mu_factor_update(problem):
    X, W, H = problem
    delta = float(np.sqrt(np.finfo(np.float32).eps))
    G = W.T @ W
    C = W.T @ X
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(mu_factor_update(H, G, C, 0.01, delta))
    want = np.asarray(H * jnp.maximum(C - 0.01, 0) / (G @ H + delta))
    np.testing.assert_allclose(got, want, rtol=2e-5)


def test_wtq_qht(problem):
    X, W, H = problem
    delta = float(np.sqrt(np.finfo(np.float32).eps))
    Q = np.asarray(X / (W @ H + delta))
    with pltpu.force_tpu_interpret_mode():
        got_wtq = np.asarray(wtq(X, W, H, delta))
        got_qht = np.asarray(qht(X, W, H, delta))
    np.testing.assert_allclose(got_wtq, np.asarray(W).T @ Q, rtol=3e-5)
    np.testing.assert_allclose(got_qht, Q @ np.asarray(H).T, rtol=3e-5)


def test_elementwise(problem):
    rng = np.random.default_rng(1)
    A = jnp.asarray(rng.standard_normal((130, 120)), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(projectnn_pallas(A))
    np.testing.assert_array_equal(got, np.maximum(np.asarray(A), 0))
    Apos = jnp.abs(A) + 0.1
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(normalize1_cols_pallas(Apos))
    np.testing.assert_allclose(
        got, np.asarray(Apos / jnp.sum(Apos, axis=0, keepdims=True)), rtol=1e-6
    )
