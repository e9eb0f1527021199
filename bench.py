"""Benchmark harness — prints ONE JSON line.

Headline config (BASELINE.json configs[0]): dense 500x500 X, rank-8, MU-MSE.
Metric: iterations/sec of the full jitted solve loop (including the
per-iteration convergence test, matching the reference's nmf_skeleton
semantics).

Timing methodology: on this TPU the runtime's ``block_until_ready`` does not
synchronize with device completion (tunnel transport), so we (a) force a
device->host readback of the final objective and (b) time *differentially* —
run N_small and N_big iterations and divide the elapsed-time delta by the
iteration delta, which cancels the fixed dispatch+readback latency (~30-50ms)
out of the measurement.

``vs_baseline`` is the speedup over a reference-equivalent implementation:
the same Lee-Seung MU-MSE sweep + stop-condition in numpy on CPU BLAS — the
exact performance layer the Julia reference sits on
(/root/reference/src/multupd.jl:96-115 via LinearAlgebra.mul!).
"""

import json
import time

import numpy as np

P, N, K = 500, 500, 8
DTYPE = np.float32
N_SMALL, N_BIG = 100, 2100


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


def _probe_device(timeout_s=150):
    """The axon tunnel wedges silently (device ops hang forever, ~0% CPU).
    Probe with a tiny jitted matmul in a watchdog thread so a wedged tunnel
    produces a fast, honest error line instead of hanging the driver."""
    import threading

    ok = []

    def work():
        import jax
        import jax.numpy as jnp

        y = jax.jit(lambda a: a @ a)(jnp.ones((256, 256)))
        ok.append(float(y[0, 0]))

    t = threading.Thread(target=work, daemon=True)
    t.start()
    t.join(timeout_s)
    return bool(ok)


def main():
    if not _probe_device():
        print(
            json.dumps(
                {
                    "metric": f"mu_mse_{P}x{N}_k{K}_iters_per_sec",
                    "value": 0,
                    "unit": "iterations/sec",
                    "vs_baseline": 0,
                    "error": "device probe hung: axon tunnel wedged",
                }
            )
        )
        return

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

    def run(iters):
        t0 = time.perf_counter()
        out = _solve_while(upd, Xd, Wd, Hd, jnp.asarray(iters, jnp.int32), tol)
        objv = float(out[4])  # forced device->host readback
        return time.perf_counter() - t0, objv, int(out[2])

    run(2)  # compile + warm (maxiter is traced: same executable)
    t_small = min(run(N_SMALL)[0] for _ in range(3))
    t_big, objv_tpu, niters = min(run(N_BIG) for _ in range(3))
    assert niters == N_BIG, f"early exit at {niters}"
    its_per_sec = (N_BIG - N_SMALL) / (t_big - t_small)

    base_its, objv_np = numpy_baseline(X.copy(), W0.copy(), H0.copy(), N_SMALL)
    out100 = _solve_while(upd, Xd, Wd, Hd, jnp.asarray(N_SMALL, jnp.int32), tol)
    rel = abs(float(out100[4]) - float(objv_np)) / max(float(objv_np), 1e-30)
    assert rel < 0.05, f"convergence mismatch vs baseline at {N_SMALL} iters: {rel}"

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
