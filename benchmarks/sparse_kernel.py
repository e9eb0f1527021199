"""Sparse gather-matmul kernel micro-benchmark (real TPU).

Chains D -> normalize(X' (X D)) inside one jitted fori_loop (data dependency
forces sequential execution) and times differentially (N_big - N_small
in-graph iterations, forced readback) to cancel the tunnel dispatch latency.
Each iteration is 2 sparse products = 2*nnz MAC-rows of work.

Usage:
  python benchmarks/sparse_kernel.py [--dist uniform|powerlaw] [--p P] [--n N]
      [--k K] [--density D | --nnz NNZ] [--paths bcoo,compact]
      [--precisions highest,high,fast] [--groups 8] [--iters 20]

Prints one JSON line per (path, precision) with Mnnz/s.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_data(dist, p, n, nnz, seed=0):
    rng = np.random.default_rng(seed)
    if dist == "uniform":
        rows = rng.integers(0, p, nnz).astype(np.int64)
        cols = rng.integers(0, n, nnz).astype(np.int64)
    else:  # powerlaw: zipf-ish marginals on both axes (ratings-like)
        rows = (np.minimum(rng.pareto(1.2, nnz) * p / 50, p - 1)).astype(np.int64)
        cols = (np.minimum(rng.pareto(1.2, nnz) * n / 50, n - 1)).astype(np.int64)
        rperm = rng.permutation(p)
        cperm = rng.permutation(n)
        rows, cols = rperm[rows], cperm[cols]
    key = rows * n + cols
    key = np.unique(key)
    rows, cols = key // n, key % n
    vals = (rng.random(len(key)) + 0.5).astype(np.float32)
    return rows, cols, vals


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dist", default="uniform")
    ap.add_argument("--p", type=int, default=20000)
    ap.add_argument("--n", type=int, default=10000)
    ap.add_argument("--k", type=int, default=128)
    ap.add_argument("--density", type=float, default=0.01)
    ap.add_argument("--nnz", type=int, default=0)
    ap.add_argument("--paths", default="bcoo,compact")
    ap.add_argument("--precisions", default="highest,fast")
    ap.add_argument("--groups", default="8")
    ap.add_argument("--dense", default="0", help="comma list of dense_tile_nnz thresholds (0=off)")
    ap.add_argument("--spans", default="1", help="comma list of tail_span values")
    ap.add_argument("--quads", default="0",
                    help="comma list of quad_tail_nnz values (0=off); an "
                    "entry may be nnz:seg to set the sub-segment width, "
                    "e.g. 16:16 for the octa variant")
    ap.add_argument("--coo", default="0",
                    help="comma list of coo_tail_nnz values (0=off): tiles "
                    "at or below ride the XLA segment-sum dust band")
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--small", type=int, default=2)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    nnz = args.nnz or int(args.p * args.n * args.density)
    rows, cols, vals = make_data(args.dist, args.p, args.n, nnz)
    nnz = len(vals)
    D0 = np.random.default_rng(1).random((args.n, args.k), np.float32)

    def timed(chain, X, tag, extra):
        D = jnp.asarray(D0)

        def run(iters):
            t0 = time.perf_counter()
            out = chain(X, D, jnp.asarray(iters, jnp.int32))
            _ = float(out.sum())
            return time.perf_counter() - t0

        run(1)  # compile
        t_small = min(run(args.small) for _ in range(3))
        t_big = min(run(args.iters) for _ in range(3))
        per_iter = (t_big - t_small) / (args.iters - args.small)
        mnnz = 2 * nnz / per_iter / 1e6
        print(
            json.dumps(
                {
                    "path": tag,
                    "mnnz_per_sec": round(mnnz, 1),
                    "ms_per_product": round(per_iter / 2 * 1e3, 3),
                    "nnz": nnz,
                    "dist": args.dist,
                    "k": args.k,
                    **extra,
                }
            ),
            flush=True,
        )

    paths = args.paths.split(",")

    if "bcoo" in paths:
        from jax.experimental import sparse as jsparse

        order = np.lexsort((cols, rows))
        idx = np.stack([rows[order], cols[order]], 1)
        Xb = jsparse.BCOO(
            (jnp.asarray(vals[order]), jnp.asarray(idx)),
            shape=(args.p, args.n),
            indices_sorted=True,
            unique_indices=True,
        )

        @jax.jit
        def chain_bcoo(X, D, iters):
            dn = (((1,), (0,)), ((), ()))
            dt = (((0,), (0,)), ((), ()))

            def body(i, D):
                Y = jsparse.bcoo_dot_general(X, D, dimension_numbers=dn)
                Z = jsparse.bcoo_dot_general(X, Y, dimension_numbers=dt)
                return Z / jnp.max(jnp.abs(Z))

            return jax.lax.fori_loop(0, iters, body, D)

        timed(chain_bcoo, Xb, "bcoo", {})

    from nmf_tpu.ops.pallas.sparse import tiled_mm, tiled_mtm
    from nmf_tpu.ops.sparse_format import build_tiled

    def tiled_chain(precision):
        @jax.jit
        def chain(X, D, iters):
            def body(i, D):
                Y = tiled_mm(X, D, precision=precision)
                Z = tiled_mtm(X, Y, precision=precision)
                return Z / jnp.max(jnp.abs(Z))

            return jax.lax.fori_loop(0, iters, body, D)

        return chain

    for prec in args.precisions.split(","):
        if "compact" in paths:
            for g in [int(x) for x in args.groups.split(",")]:
                for dn in [int(x) for x in args.dense.split(",")]:
                    for span in [int(x) for x in args.spans.split(",")]:
                        for qspec, coo in [
                            (q, c)
                            for q in args.quads.split(",")
                            for c in [int(x) for x in args.coo.split(",")]
                        ]:
                            quad, _, qs = qspec.partition(":")
                            quad, qseg = int(quad), int(qs or 32)
                            Xc = build_tiled(
                                rows, cols, vals, (args.p, args.n),
                                layout="compact", group=g,
                                dense_tile_nnz=dn or None, tail_span=span,
                                quad_tail_nnz=quad or None, quad_seg=qseg,
                                coo_tail_nnz=coo or None,
                            )
                            pad = Xc.fwd.vals.size / max(nnz, 1)
                            extra = {"precision": prec, "group": g,
                                     "pad": round(pad, 2), "span": span}
                            if coo:
                                extra.update(
                                    coo_tail_nnz=coo,
                                    coo_nnz_frac=round(
                                        Xc.fwd.n_coo / max(nnz, 1), 3),
                                )
                            if dn:
                                dnnz = (
                                    int(Xc.fwd.dense_nnz.shape[0])
                                    if Xc.fwd.n_dblocks else 0
                                )
                                extra.update(
                                    dense_thresh=dn,
                                    dense_blocks=Xc.fwd.n_dblocks,
                                    dense_nnz_frac=round(dnnz / max(nnz, 1), 3),
                                )
                            if quad:
                                qn = Xc.fwd.n_qchunks
                                qnnz = int(
                                    (np.asarray(Xc.fwd.qinv) < nnz).sum()
                                ) if qn else 0
                                extra.update(
                                    quad_tail_nnz=quad,
                                    quad_seg=qseg,
                                    quad_chunks=qn,
                                    quad_nnz_frac=round(qnnz / max(nnz, 1), 3),
                                )
                            timed(tiled_chain(prec), Xc, "compact", extra)


if __name__ == "__main__":
    main()
