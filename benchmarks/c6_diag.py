"""Config6 compile diagnostic: build the 2Mx200k slab once, then attempt
ONE jitted HALS chunk and print the FULL compile/runtime error."""
import sys, os, time, traceback
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import numpy as np
from run import _movielens_like

def main():
    import jax.numpy as jnp
    from nmf_tpu.models.common import _renumber_ok, _solve_while, renumbered_problem
    from nmf_tpu.models.coorddesc import CoordinateDescent
    from nmf_tpu.ops.sparse_format import build_tiled

    dense = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    group = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    solver = sys.argv[3] if len(sys.argv) > 3 else "cd"
    span = int(sys.argv[4]) if len(sys.argv) > 4 else 16
    quad = int(sys.argv[5]) if len(sys.argv) > 5 else 0
    coo = int(sys.argv[6]) if len(sys.argv) > 6 else 0
    rng = np.random.default_rng(0)
    p, n, k = 2_000_000, 200_000, 256
    rows, cols, vals = _movielens_like(rng, p=p, n=n, nnz=90_000_000)
    t0 = time.perf_counter()
    X = build_tiled(rows, cols, vals, (p, n), dense_tile_nnz=dense,
                    group=group, tail_span=span, quad_tail_nnz=quad or None,
                    coo_tail_nnz=coo or None).slim()
    print("build", round(time.perf_counter() - t0, 1), "s", flush=True)
    import jax

    if solver == "cd":
        cd, _ = CoordinateDescent(maxiter=100)._resolved(np.float32)
    else:
        from nmf_tpu.models.greedycd import GreedyCD

        cd, _ = GreedyCD(maxiter=100)._resolved(np.float32)
    if _renumber_ok(cd, X):
        import dataclasses
        X = dataclasses.replace(
            X, row_perm=None, row_rank=None, col_perm=None, col_rank=None
        )
        print("renumbered (perms stripped; device-side random init)", flush=True)
    tol = jnp.asarray(1e-30, jnp.float32)

    @jax.jit
    def run_prog(X, key, iters):
        kw, kh = jax.random.split(key)
        W0 = jax.random.uniform(kw, (p, k), jnp.float32)
        H0 = jax.random.uniform(kh, (k, n), jnp.float32)
        return _solve_while(cd, X, W0, H0, iters, tol)

    key = jax.random.PRNGKey(0)
    try:
        out = run_prog(X, key, jnp.asarray(2, jnp.int32))
        print("objv:", float(out[4]), flush=True)
        t0 = time.perf_counter()
        out = run_prog(X, key, jnp.asarray(6, jnp.int32))
        float(out[4])
        dt = time.perf_counter() - t0
        print(f"6 iters in {dt:.1f}s -> {6/dt:.3f} it/s (incl dispatch)", flush=True)
    except Exception:
        traceback.print_exc()

if __name__ == "__main__":
    main()
