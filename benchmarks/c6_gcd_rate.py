"""Config6 GreedyCD rate via 1-iteration-per-dispatch chunking (the tunnel
worker kills single dispatches somewhere in the 50-95 s device-time range;
one greedy iteration is ~45 s)."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import numpy as np
from run import _movielens_like

def main():
    import dataclasses
    import jax, jax.numpy as jnp
    from nmf_tpu.models.common import _prepare, _solve_while_from
    from nmf_tpu.models.greedycd import GreedyCD
    from nmf_tpu.ops.sparse_format import build_tiled
    import nmf_tpu.config as config

    config.set_greedycd_cascade(slab_rows=131072)
    rng = np.random.default_rng(0)
    p = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000
    nnz_draw = int(sys.argv[3]) if len(sys.argv) > 3 else 90_000_000
    k = 256
    rows, cols, vals = _movielens_like(rng, p=p, n=n, nnz=nnz_draw)
    t0 = time.perf_counter()
    X = build_tiled(rows, cols, vals, (p, n), dense_tile_nnz=2048,
                    group=8, coo_tail_nnz=32).slim()
    X = dataclasses.replace(X, row_perm=None, row_rank=None,
                            col_perm=None, col_rank=None)
    print("build", round(time.perf_counter() - t0, 1), "s", flush=True)

    from functools import partial

    g, _ = GreedyCD(maxiter=100)._resolved(np.float32)
    tol = jnp.asarray(1e-30, jnp.float32)

    @jax.jit
    def dev_init(key):
        kw, kh = jax.random.split(key)
        W = jax.random.uniform(kw, (p, k), jnp.float32)
        H = jax.random.uniform(kh, (k, n), jnp.float32)
        return W, H

    W, H = dev_init(jax.random.PRNGKey(0))
    state = _prepare(g, X, W, H)

    # donate the carried buffers: at the config7 scale (W = 2.56 GB) a
    # non-donating per-iter dispatch holds input+output copies of W/H/state
    # simultaneously and ResourceExhausts the chip
    @partial(jax.jit, donate_argnums=(1, 2, 3))
    def one_iter(X, w, h, st):
        w, h, st, t, _conv, _ = _solve_while_from(
            g, st, X, w, h, 0, jnp.asarray(1, jnp.int32), tol,
            with_objective=False,
        )
        return w, h, st

    t0 = time.perf_counter()
    W, H, state = one_iter(X, W, H, state)  # compile + iter 1
    jax.block_until_ready(W); float(jnp.sum(H))
    print(f"iter1 (compile+run): {time.perf_counter()-t0:.1f}s", flush=True)
    times = []
    for i in range(6):
        t0 = time.perf_counter()
        W, H, state = one_iter(X, W, H, state)
        float(jnp.sum(H))
        times.append(time.perf_counter() - t0)
        print(f"iter{i+2}: {times[-1]:.1f}s", flush=True)
    per = sum(times) / len(times)
    print(f"greedycd chunked-dispatch rate: {1.0/per:.4f} it/s "
          f"({per:.1f} s/iter incl dispatch)", flush=True)

if __name__ == "__main__":
    main()
