"""Benchmark harness — prints ONE JSON line.

Headline config (BASELINE.json configs[0]): dense 500x500 X, rank-8, MU-MSE,
100 iterations.  Metric: iterations/sec of the full jitted solve loop
(including the per-iteration convergence test, matching the reference's
nmf_skeleton semantics).

``vs_baseline`` is the speedup over a reference-equivalent implementation:
the same Lee-Seung MU-MSE sweep + stop-condition written in numpy on CPU
BLAS — the exact performance layer the Julia reference sits on
(/root/reference/src/multupd.jl:96-115 via LinearAlgebra.mul!).
"""

import json
import time

import numpy as np

P, N, K = 500, 500, 8
ITERS = 100
DTYPE = np.float32


def numpy_baseline(X, W, H, iters):
    """Reference-equivalent MU-MSE loop on CPU BLAS (same math as
    src/multupd.jl:96-115 with the Gram-form matmuls + stop test)."""
    delta = np.sqrt(np.finfo(DTYPE).eps).astype(DTYPE)
    tol = DTYPE(1e-30)
    t0 = time.perf_counter()
    for _ in range(iters):
        preW, preH = W.copy(), H.copy()
        WtX = W.T @ X
        WtWH = (W.T @ W) @ H
        H = H * (np.maximum(0, WtX) / (WtWH + delta))
        XHt = X @ H.T
        WHHt = W @ (H @ H.T)
        W = W * (np.maximum(0, XHt) / (WHHt + delta))
        dev_w = ((W - preW) ** 2).sum(0)
        sum_w = ((W + preW) ** 2).sum(0)
        dev_h = ((H - preH) ** 2).sum(1)
        sum_h = ((H + preH) ** 2).sum(1)
        if not ((dev_w > tol**2 * sum_w) | (dev_h > tol**2 * sum_h)).any():
            break
    elapsed = time.perf_counter() - t0
    objv = 0.5 * ((X - W @ H) ** 2).sum()
    return iters / elapsed, objv


def main():
    import jax
    import jax.numpy as jnp

    from nmf_tpu.models.common import _solve_while
    from nmf_tpu.models.multupd import MultUpdate

    rng = np.random.default_rng(0)
    X = rng.random((P, N), dtype=DTYPE)
    W0 = rng.random((P, K), dtype=DTYPE)
    H0 = rng.random((K, N), dtype=DTYPE)

    upd = MultUpdate(obj="mse")
    Xd = jnp.asarray(X)
    Wd = jnp.asarray(W0)
    Hd = jnp.asarray(H0)
    tol = jnp.asarray(1e-30, DTYPE)

    # warm-up / compile (maxiter is traced: same executable as the timed run)
    jax.block_until_ready(
        _solve_while(upd, Xd, Wd, Hd, jnp.asarray(2, jnp.int32), tol)
    )
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = _solve_while(upd, Xd, Wd, Hd, jnp.asarray(ITERS, jnp.int32), tol)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    its_per_sec = ITERS / best
    objv_tpu = float(out[4])

    base_its, objv_np = numpy_baseline(X.copy(), W0.copy(), H0.copy(), ITERS)

    rel = abs(objv_tpu - float(objv_np)) / max(float(objv_np), 1e-30)
    assert rel < 0.05, f"convergence mismatch vs baseline: {objv_tpu} vs {objv_np}"

    print(
        json.dumps(
            {
                "metric": f"mu_mse_{P}x{N}_k{K}_iters_per_sec",
                "value": round(its_per_sec, 2),
                "unit": "iterations/sec",
                "vs_baseline": round(its_per_sec / base_its, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
