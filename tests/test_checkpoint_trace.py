"""Checkpoint/resume and per-iteration tracing."""

import numpy as np
import jax.numpy as jnp
import pytest

import nmf_tpu
from nmf_tpu.models.checkpoint import latest_checkpoint, solve_checkpointed
from testproblems import laurberg6x3


def make_problem(seed=5):
    rng = np.random.default_rng(seed)
    X, Wg, Hg = laurberg6x3(0.3)
    W = Wg + rng.random(Wg.shape) * 0.1
    H = rng.random(Hg.shape)
    return jnp.asarray(X), jnp.asarray(W), jnp.asarray(H)


@pytest.mark.parametrize(
    "alg",
    [
        nmf_tpu.MultUpdate(obj="mse", maxiter=37, tol=1e-9),
        nmf_tpu.ALSPGrad(maxiter=17, tol=1e-9),
        nmf_tpu.CoordinateDescent(maxiter=23, tol=1e-9, shuffle=True),
    ],
    ids=lambda a: type(a).__name__,
)
def test_checkpointed_equals_plain(tmp_path, alg):
    X, W, H = make_problem()
    plain = nmf_tpu.solve(alg, X, W, H)
    ck = solve_checkpointed(
        alg, X, W, H, checkpoint_dir=str(tmp_path / "ck"), checkpoint_every=7
    )
    assert ck.niters == plain.niters
    assert ck.converged == plain.converged
    np.testing.assert_allclose(np.asarray(ck.W), np.asarray(plain.W), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(ck.H), np.asarray(plain.H), rtol=1e-12)
    assert np.isclose(ck.objvalue, plain.objvalue, rtol=1e-12)


def test_resume_after_interruption(tmp_path):
    X, W, H = make_problem()
    alg = nmf_tpu.MultUpdate(obj="mse", maxiter=40, tol=1e-12)
    plain = nmf_tpu.solve(alg, X, W, H)

    # run only the first 2 chunks, "crash", then resume with the full budget
    partial_alg = nmf_tpu.MultUpdate(obj="mse", maxiter=20, tol=1e-12)
    ckdir = str(tmp_path / "ck")
    solve_checkpointed(partial_alg, X, W, H, checkpoint_dir=ckdir, checkpoint_every=10)
    assert latest_checkpoint(ckdir)[1] == 20

    resumed = solve_checkpointed(alg, X, W, H, checkpoint_dir=ckdir, checkpoint_every=10)
    assert resumed.niters == plain.niters
    np.testing.assert_allclose(np.asarray(resumed.W), np.asarray(plain.W), rtol=1e-12)
    assert np.isclose(resumed.objvalue, plain.objvalue, rtol=1e-12)


def test_step_agreement_logic(tmp_path):
    """Multi-host resume picks the largest step present on EVERY process;
    single-process agreed_checkpoint == latest_checkpoint."""
    from nmf_tpu.models.checkpoint import _common_latest, agreed_checkpoint

    # pure agreement logic (exercised across real processes in
    # test_multihost.py::test_two_process_checkpoint_resume)
    assert _common_latest([[5, 10], [5]]) == 5
    assert _common_latest([[5, 10, 15], [10, 15], [5, 15]]) == 15
    assert _common_latest([[10], [5]]) is None
    assert _common_latest([]) is None

    X, W, H = make_problem()
    alg = nmf_tpu.MultUpdate(obj="mse", maxiter=10, tol=1e-12)
    ckdir = str(tmp_path / "ck")
    solve_checkpointed(alg, X, W, H, checkpoint_dir=ckdir, checkpoint_every=5)
    assert agreed_checkpoint(ckdir) == latest_checkpoint(ckdir)
    assert agreed_checkpoint(str(tmp_path / "none")) is None


def test_trace_history():
    X, W, H = make_problem()
    alg = nmf_tpu.MultUpdate(obj="mse", maxiter=30, tol=1e-9)
    res = nmf_tpu.solve(alg, X, W, H, trace=True)
    assert res.trace is not None
    objs = np.asarray(res.trace.objvalue)
    devs = np.asarray(res.trace.relchange)
    assert objs.shape == (30,)
    valid = objs[: res.niters]
    assert np.isfinite(valid).all()
    assert np.isnan(objs[res.niters :]).all()
    # MU monotonically decreases the objective
    assert (np.diff(valid) <= 1e-12).all()
    # final trace entry equals the reported objective
    assert np.isclose(valid[-1], res.objvalue, rtol=1e-10)
    assert np.isfinite(devs[: res.niters]).all()


def test_trace_through_nnmf():
    rng = np.random.default_rng(3)
    X = jnp.asarray(np.abs(rng.random((10, 12))))
    res = nmf_tpu.nnmf(X, 3, alg="cd", init="random", maxiter=15, trace=True)
    assert res.trace is not None
    assert np.isfinite(np.asarray(res.trace.objvalue)[: res.niters]).all()
