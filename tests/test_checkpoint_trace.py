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


@pytest.mark.parametrize(
    "alg",
    [
        nmf_tpu.MultUpdate(obj="div", maxiter=29, tol=1e-9),
        nmf_tpu.GreedyCD(maxiter=19, tol=1e-9),
        nmf_tpu.CoordinateDescent(maxiter=23, tol=1e-9, shuffle=True),
        nmf_tpu.ALSPGrad(maxiter=17, tol=1e-9),
    ],
    ids=lambda a: type(a).__name__,
)
def test_chunked_dispatch_equals_monolithic(alg):
    """config.dispatch_chunk (the capacity-scale <=N-iters-per-dispatch
    driver) must be bit-identical to the one-while_loop solve — it resumes
    the same jitted body from the carried state."""
    from nmf_tpu import config

    X, W, H = make_problem()
    plain = nmf_tpu.solve(alg, X, W, H)
    config.set_dispatch_chunk(5)
    try:
        chunked = nmf_tpu.solve(alg, X, W, H)
    finally:
        config.set_dispatch_chunk(None)
    assert chunked.niters == plain.niters
    assert chunked.converged == plain.converged
    np.testing.assert_array_equal(np.asarray(chunked.W), np.asarray(plain.W))
    np.testing.assert_array_equal(np.asarray(chunked.H), np.asarray(plain.H))
    assert chunked.objvalue == plain.objvalue


def test_nnmf_dispatch_chunk_param():
    """nnmf(dispatch_chunk=) scopes the config knob and restores it."""
    from nmf_tpu import config

    X, _, _ = make_problem()
    Xa = jnp.abs(X)
    r1 = nmf_tpu.nnmf(Xa, 3, alg="cd", init="random", seed=1, maxiter=12)
    assert config.dispatch_chunk is None
    r2 = nmf_tpu.nnmf(
        Xa, 3, alg="cd", init="random", seed=1, maxiter=12, dispatch_chunk=4
    )
    assert config.dispatch_chunk is None
    assert r1.niters == r2.niters
    np.testing.assert_array_equal(np.asarray(r1.W), np.asarray(r2.W))
    assert r1.objvalue == r2.objvalue
