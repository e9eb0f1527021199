"""Produce the round's committed benchmark artifact (BENCH_full_rNN.json).

Runs every measurement the docs cite, each in its own process (the TPU
tunnel allows one JAX process at a time), and appends one JSON line per
result with a "section" tag.  VERDICT r2 missing #1: every number in
docs/tpu_results.md must be reproducible from a committed artifact — this
script is the reproduction command.

    python benchmarks/collect_full.py --out BENCH_full_r03.json
    python benchmarks/collect_full.py --out /tmp/b.json --only configs,ttt

Sections:
  configs  benchmarks/run.py config1..config6 (it/s + compile times)
  ttt      benchmarks/run.py ttt1..ttt4 (wall-time-to-tolerance)
  sparse   benchmarks/sparse_kernel.py uniform + powerlaw kernel tables
           (incl. the round-3 quad-tail variants)
  cold     benchmarks/cold_init.py twice per cache mode (fresh-process
           cold-start cost, with and without the persistent XLA cache)
  c5d      local-CPU weak-scaling tables (from /tmp if present, else run)
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)


def run_lines(cmd, timeout, env=None):
    """Run a command, return its stdout JSON lines (non-JSON passed over)."""
    e = dict(os.environ)
    if env:
        e.update(env)
    try:
        out = subprocess.run(
            cmd, capture_output=True, text=True, timeout=timeout, env=e,
            cwd=REPO,
        )
    except subprocess.TimeoutExpired:
        return [{"error": "timeout", "cmd": " ".join(cmd)}]
    lines = []
    for ln in out.stdout.splitlines():
        ln = ln.strip()
        if ln.startswith("{"):
            try:
                lines.append(json.loads(ln))
            except json.JSONDecodeError:
                pass
    if not lines and out.returncode != 0:
        lines.append({"error": (out.stdout + out.stderr)[-1500:],
                      "cmd": " ".join(cmd)})
    return lines


PROBE_SRC = """
import time, jax, jax.numpy as jnp
t0 = time.time()
y = jax.jit(lambda a: a @ a)(jnp.ones((256, 256)))
print("probe_ok", float(y[0, 0]), round(time.time() - t0, 1))
"""


def probe_tpu(timeout=150):
    """Quick liveness check: the axon tunnel wedges silently (ops hang at
    ~0% CPU) and nothing local un-wedges it.  A tiny jitted matmul that
    doesn't come back within `timeout` means every section below would hang
    to its full per-section timeout — fail fast instead."""
    try:
        out = subprocess.run(
            [sys.executable, "-c", PROBE_SRC], capture_output=True,
            text=True, timeout=timeout, cwd=REPO,
        )
    except subprocess.TimeoutExpired:
        return False
    return "probe_ok" in out.stdout


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="BENCH_full_r05.json")
    ap.add_argument("--only", default="configs,ttt,spa,sparse,cold,c5d,ingest")
    ap.add_argument("--skip-config6", action="store_true",
                    help="skip the 90M-nnz north-star slice (long host build)")
    ap.add_argument("--no-probe", action="store_true",
                    help="skip the TPU liveness probe (e.g. CPU-only runs)")
    args = ap.parse_args()
    if not args.no_probe and not probe_tpu():
        print("TPU probe hung: tunnel is wedged, aborting before the long "
              "sections (retry later; nothing local fixes it)",
              file=sys.stderr)
        sys.exit(3)
    only = set(args.only.split(","))
    py = sys.executable
    results = []

    def emit(section, rows):
        for r in rows:
            r = dict(r)
            r["section"] = section
            results.append(r)
            print(json.dumps(r), flush=True)

    if "configs" in only:
        names = ["config1", "config2", "config3", "config4", "config5"]
        if not args.skip_config6:
            names += ["config6", "config7"]
        emit("configs", run_lines([py, f"{HERE}/run.py"] + names, 7200))
    if "ttt" in only:
        emit("ttt", run_lines(
            [py, f"{HERE}/run.py", "ttt1", "ttt2", "ttt3", "ttt4"], 3600
        ))
    if "spa" in only:
        emit("spa", run_lines([py, f"{HERE}/run.py", "spa4"], 3600))
    if "ingest" in only:
        emit("ingest", run_lines([py, f"{HERE}/ingest_profile.py"], 3600))
    if "sparse" in only:
        emit("sparse_uniform", run_lines(
            [py, f"{HERE}/sparse_kernel.py", "--dist", "uniform",
             "--paths", "bcoo,compact", "--precisions", "highest",
             "--dense", "0,130", "--quads", "0,32"], 3600,
        ))
        emit("sparse_powerlaw", run_lines(
            [py, f"{HERE}/sparse_kernel.py", "--dist", "powerlaw",
             "--p", "40000", "--n", "20000",
             "--paths", "bcoo,compact", "--precisions", "highest",
             "--dense", "0,130", "--quads", "0,32", "--coo", "0,3"], 3600,
        ))
    if "cold" in only:
        cache = "/tmp/nmf_bench_xla_cache"
        subprocess.run(["rm", "-rf", cache])
        emit("cold_nocache", run_lines(
            [py, f"{HERE}/cold_init.py", "--no-cache"], 1200))
        emit("cold_populate", run_lines(
            [py, f"{HERE}/cold_init.py", "--cache-dir", cache], 1200))
        emit("cold_cached", run_lines(
            [py, f"{HERE}/cold_init.py", "--cache-dir", cache], 1200))
    if "c5d" in only:
        found = False
        for base in ("c5d_k64", "c5d_k256"):
            # fresh /tmp runs win; committed tables (benchmarks/results/,
            # regenerated whenever the harness changes) are the fallback —
            # /tmp does not survive container restarts
            for path in (f"/tmp/{base}.jsonl",
                         f"{HERE}/results/{base}_cpu.jsonl"):
                if not os.path.exists(path):
                    continue
                with open(path) as f:
                    rows = [json.loads(ln) for ln in f
                            if ln.strip().startswith("{")]
                if rows:
                    emit(f"c5d_{base}.jsonl", rows)
                    found = True
                    break
        if not found:
            emit("c5d_k64", run_lines(
                [py, f"{HERE}/run.py", "config5d", "--launch", "1,2,4,8",
                 "--k", "64", "--bp", "1024", "--bn", "1024"], 3600,
                env={"JAX_PLATFORMS": ""},
            ))

    meta = {
        "section": "meta",
        "generated_by": "benchmarks/collect_full.py",
        "unix_time": time.time(),
    }
    results.append(meta)
    with open(os.path.join(REPO, args.out), "w") as f:
        for r in results:
            f.write(json.dumps(r) + "\n")
    print(f"wrote {len(results)} rows to {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
