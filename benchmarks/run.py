"""Benchmark suite over the BASELINE.json configs.

Usage: python benchmarks/run.py [config1 config2 ... | all]

Each config prints one JSON line: {"metric", "value", "unit", ...extras}.
Timing is differential (run N_small and N_big in-graph iterations, divide the
elapsed delta) with a forced device->host readback, which cancels the
dispatch/transport latency of the TPU tunnel out of the measurement — see
bench.py for the methodology note.

Configs (BASELINE.json):
  1. dense 500x500, k=8, MU-MSE, random init
  2. dense 2000x1000, k=32, MU-KL (multdiv), NNDSVDar init via randomized SVD
  3. dense 100k x 10k, k=64, ALSPGrad + ProjectedALS
  4. sparse MovieLens-25M-shaped (163k x 59k, ~25M nnz), k=128, HALS cd +
     greedycd on BCOO
  5. weak-scaling of the sharded MU sweep over a simulated CPU mesh
     (1 -> 8 devices); on real multi-host pods the same code path scales via
     jax.distributed + GSPMD
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _timed(fn, n_small, n_big, repeats=3):
    """Differential timing of fn(iters) -> scalar-readback."""
    fn(2)
    t_small = min(_once(fn, n_small) for _ in range(repeats))
    t_big = min(_once(fn, n_big) for _ in range(repeats))
    return (n_big - n_small) / (t_big - t_small)


def _once(fn, iters):
    t0 = time.perf_counter()
    fn(iters)
    return time.perf_counter() - t0


def _solver_rate(upd, X, W, H, n_small, n_big, dtype=np.float32):
    import jax
    import jax.numpy as jnp

    from nmf_tpu.models.common import _solve_while

    tol = jnp.asarray(1e-30, X.dtype if hasattr(X, "dtype") else dtype)

    def run(iters):
        out = _solve_while(upd, X, W, H, jnp.asarray(iters, jnp.int32), tol)
        float(out[4])

    return _timed(run, n_small, n_big)


def config1():
    import jax.numpy as jnp

    from nmf_tpu.models.multupd import MultUpdate

    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.random((500, 500), dtype=np.float32))
    W = jnp.asarray(rng.random((500, 8), dtype=np.float32))
    H = jnp.asarray(rng.random((8, 500), dtype=np.float32))
    rate = _solver_rate(MultUpdate(obj="mse"), X, W, H, 100, 2100)
    return {
        "metric": "c1_mu_mse_500x500_k8",
        "value": round(rate, 1),
        "unit": "iterations/sec",
    }


def config2():
    import jax
    import jax.numpy as jnp

    import nmf_tpu
    from nmf_tpu.models.multupd import MultUpdate

    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.random((2000, 1000), dtype=np.float32))

    t0 = time.perf_counter()
    W, H = nmf_tpu.nndsvd(X, 32, variant="ar", key=jax.random.PRNGKey(0))
    jax.block_until_ready((W, H))
    _ = float(W.sum())  # readback sync
    init_time = time.perf_counter() - t0

    rate = _solver_rate(MultUpdate(obj="div"), X, W, H, 50, 550)
    return {
        "metric": "c2_mu_kl_2000x1000_k32_nndsvdar",
        "value": round(rate, 1),
        "unit": "iterations/sec",
        "nndsvdar_init_sec": round(init_time, 3),
    }


def config3():
    import jax.numpy as jnp

    from nmf_tpu.models.alspgrad import ALSPGrad
    from nmf_tpu.models.projals import ProjectedALS

    rng = np.random.default_rng(0)
    p, n, k = 100_000, 10_000, 64
    # low-rank + noise so the solvers do real work
    X = jnp.asarray(
        (rng.random((p, k)).astype(np.float32) @ rng.random((k, n)).astype(np.float32))
        + 0.01 * rng.random((p, n)).astype(np.float32)
    )
    W = jnp.asarray(rng.random((p, k), dtype=np.float32))
    H = jnp.asarray(rng.random((k, n), dtype=np.float32))

    pa, _ = ProjectedALS(maxiter=100)._resolved(np.float32)
    rate_pa = _solver_rate(pa, X, W, H, 3, 23)
    al, _ = ALSPGrad(maxiter=100, maxsubiter=20)._resolved(np.float32)
    rate_al = _solver_rate(al, X, W, H, 2, 10)
    return {
        "metric": "c3_100kx10k_k64",
        "value": round(rate_pa, 2),
        "unit": "projals_iterations/sec",
        "alspgrad_iters_per_sec": round(rate_al, 3),
    }


def config4():
    import jax.numpy as jnp

    from nmf_tpu.models.coorddesc import CoordinateDescent
    from nmf_tpu.models.greedycd import GreedyCD
    from nmf_tpu.ops.sparse_format import build_tiled

    rng = np.random.default_rng(0)
    p, n, k, nnz = 163_000, 59_000, 128, 25_000_000
    # MovieLens-style power-law marginals (real ratings matrices are heavily
    # skewed); dedup keeps ~21M nnz
    rows = np.minimum((rng.pareto(1.2, nnz) * p / 50), p - 1).astype(np.int64)
    cols = np.minimum((rng.pareto(1.2, nnz) * n / 50), n - 1).astype(np.int64)
    rows = rng.permutation(p)[rows]
    cols = rng.permutation(n)[cols]
    key = np.unique(rows * n + cols)
    rows, cols = (key // n).astype(np.int32), (key % n).astype(np.int32)
    nnz = len(key)
    vals = (rng.random(nnz) * 4 + 1).astype(np.float32)  # ratings-like
    X = build_tiled(rows, cols, vals, (p, n))  # compact layout + degree sort
    W = jnp.asarray(rng.random((p, k), dtype=np.float32))
    H = jnp.asarray(rng.random((k, n), dtype=np.float32))

    cd, _ = CoordinateDescent(maxiter=100)._resolved(np.float32)
    rate_cd = _solver_rate(cd, X, W, H, 2, 8)
    g, _ = GreedyCD(maxiter=100)._resolved(np.float32)
    rate_g = _solver_rate(g, X, W, H, 2, 6)
    return {
        "metric": "c4_sparse_163kx59k_powerlaw_k128_tiled",
        "value": round(rate_cd, 3),
        "unit": "hals_iterations/sec",
        "greedycd_iters_per_sec": round(rate_g, 3),
        "nnz": nnz,
    }


def config5():
    """Weak scaling of the sharded MU sweep on a simulated device mesh.

    Per-device problem size is fixed; the mesh grows 1 -> max devices.  On
    CPU-simulated devices this validates the sharded program (collective
    structure, per-device shapes); wall-clock efficiency numbers on real ICI
    require a pod.
    """
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from nmf_tpu.models.common import _solve_while
    from nmf_tpu.models.multupd import MultUpdate
    from nmf_tpu.parallel.mesh import make_mesh
    from nmf_tpu.parallel.sharding import shard_problem

    ndev = len(jax.devices())
    base_p, base_n, k = 512, 512, 32
    rng = np.random.default_rng(0)
    results = {}
    meshes = [m for m in (1, 2, 4, 8) if m <= ndev]
    for d in meshes:
        shape = {1: (1, 1), 2: (1, 2), 4: (2, 2), 8: (2, 4)}[d]
        p, n = base_p * shape[0], base_n * shape[1]
        X = jnp.asarray(rng.random((p, n), dtype=np.float32))
        W = jnp.asarray(rng.random((p, k), dtype=np.float32))
        H = jnp.asarray(rng.random((k, n), dtype=np.float32))
        mesh = make_mesh(shape, devices=jax.devices()[:d])
        X, W, H = shard_problem(mesh, X, W, H)
        rate = _solver_rate(MultUpdate(obj="mse"), X, W, H, 20, 120)
        results[d] = rate
    eff = (
        results[meshes[-1]] / results[meshes[0]] if len(meshes) > 1 else 1.0
    )
    return {
        "metric": "c5_weak_scaling_sim_mesh",
        "value": round(eff, 3),
        "unit": f"iters_rate_ratio_{meshes[-1]}dev_vs_1dev_fixed_per_dev_size",
        "rates": {str(d): round(r, 1) for d, r in results.items()},
        "note": "CPU-simulated mesh; validates sharded program, not ICI",
    }


CONFIGS = {
    "config1": config1,
    "config2": config2,
    "config3": config3,
    "config4": config4,
    "config5": config5,
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("configs", nargs="*", default=["config1"])
    args = ap.parse_args()
    names = args.configs or ["config1"]
    if names == ["all"] or "all" in names:
        names = list(CONFIGS)
    for name in names:
        try:
            print(json.dumps(CONFIGS[name]()), flush=True)
        except Exception as e:  # keep the suite going; report the failure
            print(json.dumps({"metric": name, "error": repr(e)}), flush=True)


if __name__ == "__main__":
    main()
