"""Host ingestion profile: build_tiled wall time by phase at benchmark scale.

Usage:
  python benchmarks/ingest_profile.py [--nnz 90000000] [--p 2000000]
      [--n 200000] [--dense 2048] [--span 1] [--coo 32] [--profile]

Prints one JSON line per phase (generation excluded) plus the end-to-end
Mnnz/s — the ingestion-rate table the pod sizing needs (VERDICT r3 #5:
config 5 is O(1B) nnz).  ``--profile`` additionally dumps the top cProfile
rows of one `_build_side_compact` call.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nnz", type=int, default=90_000_000)
    ap.add_argument("--p", type=int, default=2_000_000)
    ap.add_argument("--n", type=int, default=200_000)
    ap.add_argument("--dense", type=int, default=2048)
    ap.add_argument("--span", type=int, default=1)
    ap.add_argument("--coo", type=int, default=32)
    ap.add_argument("--profile", action="store_true")
    args = ap.parse_args()

    from run import _movielens_like

    from nmf_tpu.io.loader import _load_lib

    rng = np.random.default_rng(0)
    t0 = time.perf_counter()
    rows, cols, vals = _movielens_like(rng, p=args.p, n=args.n, nnz=args.nnz)
    nnz = len(vals)
    gen = time.perf_counter() - t0
    print(json.dumps({"phase": "generate(excluded)", "sec": round(gen, 1),
                      "nnz": nnz, "native_lib": _load_lib() is not None}),
          flush=True)

    import nmf_tpu.ops.sparse_format as sf

    # phase 1: CSR-order sort of the COO (build_tiled's first step)
    t0 = time.perf_counter()
    from nmf_tpu.io.loader import gather3, stable_argsort

    so = stable_argsort(rows.astype(np.int64) * args.n + cols)
    r1, c1, v1 = gather3(so, rows.astype(np.int32), cols.astype(np.int32),
                         vals)
    t_csr = time.perf_counter() - t0
    print(json.dumps({"phase": "csr_sort", "sec": round(t_csr, 1)}), flush=True)

    # phase 2: degree ranking
    t0 = time.perf_counter()
    rdeg = np.bincount(r1, minlength=args.p)
    cdeg = np.bincount(c1, minlength=args.n)
    rp = np.argsort(-rdeg, kind="stable").astype(np.int32)
    cp = np.argsort(-cdeg, kind="stable").astype(np.int32)
    rrank = np.empty(args.p, np.int32); rrank[rp] = np.arange(args.p, dtype=np.int32)
    crank = np.empty(args.n, np.int32); crank[cp] = np.arange(args.n, dtype=np.int32)
    rt, ct = rrank[r1], crank[c1]
    t_deg = time.perf_counter() - t0
    print(json.dumps({"phase": "degree_rank", "sec": round(t_deg, 1)}), flush=True)

    # phases 3/4: per-orientation compact binning
    def one_side(rr, cc, P, N, label):
        t0 = time.perf_counter()
        side = sf._build_side_compact(
            rr, cc, v1, P, N, 32, 16 if args.span > 1 else 8,
            args.dense, args.span, None, 32, args.coo or None,
        )
        dt = time.perf_counter() - t0
        # .nbytes on the jnp arrays directly — np.asarray here read 1.8 GB
        # back over the TPU tunnel and dominated the first profile run
        store_mb = sum(
            int(getattr(side, f).nbytes) // 2**20 for f in ("coords", "vals")
        ) + (int(side.dvals.nbytes) // 2**20 if side.n_dblocks else 0)
        print(json.dumps({"phase": label, "sec": round(dt, 1),
                          "chunks": int(side.vals.shape[0]),
                          "dense_blocks": side.n_dblocks,
                          "store_mb": store_mb}), flush=True)
        return dt

    if args.profile:
        import cProfile
        import pstats

        pr = cProfile.Profile()
        pr.enable()
        t_f = one_side(rt, ct, args.p, args.n, "build_fwd")
        pr.disable()
        pstats.Stats(pr).sort_stats("cumulative").print_stats(18)
    else:
        t_f = one_side(rt, ct, args.p, args.n, "build_fwd")
    t_b = one_side(ct, rt, args.n, args.p, "build_bwd")

    total = t_csr + t_deg + t_f + t_b
    print(json.dumps({
        "metric": "ingest_rate",
        "value": round(nnz / total / 1e6, 2),
        "unit": "Mnnz_per_sec_end_to_end",
        "total_sec": round(total, 1),
        "nnz": nnz,
        "dense_tile_nnz": args.dense,
        "tail_span": args.span,
        "coo_tail_nnz": args.coo,
    }), flush=True)


if __name__ == "__main__":
    main()
