"""One-command pod launcher for the distributed benchmarks.

Turns a hosts file (one hostname/IP per line; first line = coordinator)
into the per-host ``benchmarks/run.py config5d --distributed`` launch
lines, and optionally executes them over ssh.  The identical worker runs
on local CPU processes (``--dry-run``), so the launch path is CI-checkable
without hardware.  See docs/pod_runbook.md for the full recipe.

Usage:
  # print the launch lines for a v5e-16 slice (4 hosts), weak-scaling size
  python benchmarks/pod_launch.py hosts.txt

  # the 10M x 1M rank-256 north star (BASELINE.md config 5)
  python benchmarks/pod_launch.py hosts.txt --north-star

  # actually launch over ssh (expects the repo at the same path everywhere)
  python benchmarks/pod_launch.py hosts.txt --ssh

  # no hardware: validate the exact worker + launch plumbing on 2 local
  # CPU processes with tiny shapes (used by CI)
  python benchmarks/pod_launch.py --dry-run
"""

from __future__ import annotations

import argparse
import os
import shlex
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build_commands(hosts, args):
    """Per-host command lines for the config5d worker.

    Mesh: (R, C) from the process count via benchmarks/run.py
    ``_mesh_shape_for`` (4 hosts -> 16 chips is still ONE process per host
    under jax.distributed; each process drives its 4 local chips, GSPMD
    places the (4, 4) device mesh).
    """
    nproc = len(hosts)
    coord = f"{hosts[0]}:{args.port}"
    if args.north_star:
        # 10M x 1M rank-256, ~1B nnz: per-DEVICE block on a v5e-16 =
        # 2.5M x 250k rows/cols at (4, 4); density gives ~62.5M nnz/device
        bp, bn, k, density = 2_500_000, 250_000, 256, 1e-4
        extra = ["--dense-tile-nnz", "192"]
    else:
        bp, bn, k, density = args.bp, args.bn, args.k, args.density
        extra = []
    cmds = []
    for i, _host in enumerate(hosts):
        cmd = [
            "python", os.path.join(REPO, "benchmarks", "run.py"), "config5d",
            "--distributed", "--coordinator", coord,
            "--num-processes", str(nproc), "--process-id", str(i),
            "--k", str(k), "--bp", str(bp), "--bn", str(bn),
            "--density", str(density), "--compile-cache",
        ] + extra
        cmds.append(cmd)
    return cmds


def dry_run():
    """Validate the exact pod worker on 2 local CPU processes (tiny
    shapes): the same code path a pod runs, minus the chips.  Exit 0 iff a
    c5d JSON line is produced."""
    cmd = [
        sys.executable, os.path.join(REPO, "benchmarks", "run.py"), "config5d",
        "--launch", "2", "--k", "8", "--bp", "256", "--bn", "256",
        "--density", "0.02", "--n-small", "1", "--n-big", "3", "--no-spa",
    ]
    out = subprocess.run(cmd, capture_output=True, text=True, timeout=1200)
    ok = '"metric": "c5d_weak_scaling"' in out.stdout
    print(out.stdout.strip())
    if not ok:
        print(out.stderr[-2000:], file=sys.stderr)
        print("DRY RUN FAILED", file=sys.stderr)
        return 1
    print("DRY RUN OK: pod worker + launch plumbing validated on 2 local processes")
    return 0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("hosts", nargs="?", help="file: one host per line, first = coordinator")
    ap.add_argument("--port", type=int, default=8476)
    ap.add_argument("--k", type=int, default=256)
    ap.add_argument("--bp", type=int, default=4096)
    ap.add_argument("--bn", type=int, default=4096)
    ap.add_argument("--density", type=float, default=0.02)
    ap.add_argument("--north-star", action="store_true",
                    help="10M x 1M rank-256 sparse (BASELINE config 5)")
    ap.add_argument("--ssh", action="store_true", help="execute over ssh")
    ap.add_argument("--dry-run", action="store_true",
                    help="validate the worker on 2 local CPU processes")
    args = ap.parse_args()

    if args.dry_run:
        sys.exit(dry_run())
    if not args.hosts:
        ap.error("hosts file required (or --dry-run)")
    with open(args.hosts) as f:
        hosts = [ln.strip() for ln in f if ln.strip() and not ln.startswith("#")]
    cmds = build_commands(hosts, args)
    if not args.ssh:
        for host, cmd in zip(hosts, cmds):
            print(f"{host}: {shlex.join(cmd)}")
        return
    procs = [
        subprocess.Popen(["ssh", host, shlex.join(cmd)])
        for host, cmd in zip(hosts, cmds)
    ]
    rc = 0
    for pr in procs:
        rc |= pr.wait()
    sys.exit(rc)


if __name__ == "__main__":
    main()
