"""Config6 GreedyCD probe: ONE W-halfstep in its own dispatch, to separate
'single dispatch too long (worker watchdog)' from 'program broken at this
scale'.  Prints timing or the full error."""
import sys, os, time, traceback
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import numpy as np
from run import _movielens_like

def main():
    import dataclasses
    import jax, jax.numpy as jnp
    from nmf_tpu.models.greedycd import _halfstep
    from nmf_tpu.ops.sparse_format import build_tiled
    import nmf_tpu.config as config

    slab = int(sys.argv[1]) if len(sys.argv) > 1 else 131072
    config.set_greedycd_cascade(slab_rows=slab)
    rng = np.random.default_rng(0)
    p, n, k = 2_000_000, 200_000, 256
    rows, cols, vals = _movielens_like(rng, p=p, n=n, nnz=90_000_000)
    t0 = time.perf_counter()
    X = build_tiled(rows, cols, vals, (p, n), dense_tile_nnz=2048,
                    group=8, tail_span=16).slim()
    X = dataclasses.replace(X, row_perm=None, row_rank=None,
                            col_perm=None, col_rank=None)
    print("build", round(time.perf_counter() - t0, 1), "s", flush=True)

    @jax.jit
    def w_half(X, key):
        kw, kh = jax.random.split(key)
        W0 = jax.random.uniform(kw, (p, k), jnp.float32)
        Ht = jax.random.uniform(kh, (n, k), jnp.float32)
        Wn = _halfstep(X, W0, Ht, 0.0)
        return jnp.sum(Wn)

    try:
        t0 = time.perf_counter()
        s = float(w_half(X, jax.random.PRNGKey(0)))
        print(f"W-halfstep (compile+run): {time.perf_counter()-t0:.1f}s sum={s:.3e}", flush=True)
        t0 = time.perf_counter()
        s = float(w_half(X, jax.random.PRNGKey(1)))
        print(f"W-halfstep warm: {time.perf_counter()-t0:.1f}s", flush=True)
    except Exception:
        traceback.print_exc()

if __name__ == "__main__":
    main()
