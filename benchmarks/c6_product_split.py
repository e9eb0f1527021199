"""config6 sparse-product decomposition: time X @ D with stores selectively
disabled to attribute the per-product cost (narrow chunks vs dense blocks vs
COO band).  Differential chained-loop timing with readback."""
import os
import sys
import time
import dataclasses
import json
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import numpy as np
from run import _movielens_like


def main():
    import jax
    import jax.numpy as jnp

    from nmf_tpu.ops.pallas.sparse import tiled_mm, tiled_mtm
    from nmf_tpu.ops.sparse_format import build_tiled

    rng = np.random.default_rng(0)
    p, n, k = 2_000_000, 200_000, 256
    rows, cols, vals = _movielens_like(rng, p=p, n=n, nnz=90_000_000)
    nnz = len(vals)
    X = build_tiled(rows, cols, vals, (p, n), dense_tile_nnz=2048, group=8,
                    coo_tail_nnz=32).slim()
    X = dataclasses.replace(
        X, row_perm=None, row_rank=None, col_perm=None, col_rank=None
    )

    def strip(X, *, coo=False, dense=False):
        kw = {}
        if coo:
            kw.update(coo_rows=None, coo_cols=None, coo_vals=None, n_coo=0)
        if dense:
            kw.update(dvals=None, dblk_panel=None, dblk_stripe=None,
                      dblk_rp=None, n_dblocks=0)
        return dataclasses.replace(
            X, fwd=dataclasses.replace(X.fwd, **kw),
            bwd=dataclasses.replace(X.bwd, **kw),
        )

    variants = {
        "full": X,
        "no_coo": strip(X, coo=True),
        "no_dense": strip(X, dense=True),
        "narrow_only": strip(X, coo=True, dense=True),
    }

    @jax.jit
    def chain(X, D, iters):
        def body(i, D):
            Y = tiled_mm(X, D)
            Z = tiled_mtm(X, Y)
            return Z / jnp.max(jnp.abs(Z))

        return jax.lax.fori_loop(0, iters, body, D)

    D0 = jnp.asarray(rng.random((n, k), dtype=np.float32))

    def timed(Xv, n_small=1, n_big=5):
        def run(it):
            t0 = time.perf_counter()
            out = chain(Xv, D0, jnp.asarray(it, jnp.int32))
            float(out.sum())
            return time.perf_counter() - t0

        run(1)
        t_s = min(run(n_small) for _ in range(2))
        t_b = min(run(n_big) for _ in range(2))
        return (t_b - t_s) / (n_big - n_small) / 2  # sec per product

    for name, Xv in variants.items():
        sec = timed(Xv)
        print(json.dumps({
            "metric": "c6_product_split", "variant": name,
            "sec_per_product": round(sec, 4),
            "note": "mm+mtm averaged; full nnz " + str(nnz),
        }), flush=True)


if __name__ == "__main__":
    main()
