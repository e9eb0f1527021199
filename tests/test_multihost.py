"""Multi-process distributed solve: two local processes form a jax.distributed
cluster (CPU backend, 4 virtual devices each -> 8-device global mesh) and run
a sharded solve.  This exercises the exact multi-host code path
(jax.distributed.initialize + GSPMD over a global mesh) that a TPU pod uses,
minus the ICI transport."""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_WORKER = r"""
import os, sys
import jax

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address=sys.argv[1],
    num_processes=int(sys.argv[2]),
    process_id=int(sys.argv[3]),
)
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, sys.argv[4])
from nmf_tpu.models.common import _solve_while
from nmf_tpu.models.multupd import MultUpdate
from nmf_tpu.parallel.mesh import make_mesh
from jax.sharding import NamedSharding, PartitionSpec as P

ndev = len(jax.devices())
assert ndev == 8, f"expected 8 global devices, got {ndev}"
mesh = make_mesh((2, 4))

rng = np.random.default_rng(0)
p, n, k = 64, 64, 4
Xh = rng.random((p, n)).astype(np.float32)
Wh = rng.random((p, k)).astype(np.float32)
Hh = rng.random((k, n)).astype(np.float32)

def put(arr, spec):
    return jax.make_array_from_callback(
        arr.shape,
        NamedSharding(mesh, spec),
        lambda idx: arr[idx],
    )

X = put(Xh, P("rows", "cols"))
W = put(Wh, P("rows", None))
H = put(Hh, P(None, "cols"))

out = _solve_while(
    MultUpdate(obj="mse"), X, W, H, jnp.asarray(10, jnp.int32),
    jnp.asarray(1e-30, jnp.float32),
)
objv = float(out[4])
niters = int(out[2])
print(f"RESULT {sys.argv[3]} {niters} {objv:.8e}", flush=True)
"""


@pytest.mark.skipif(os.environ.get("NMF_TPU_SKIP_MULTIHOST") == "1", reason="disabled")
def test_two_process_distributed_solve(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"

    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen(
            [
                sys.executable,
                str(worker),
                coord,
                "2",
                str(i),
                os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            env=env,
            text=True,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        for i in range(2)
    ]
    outs = []
    for pr in procs:
        out, _ = pr.communicate(timeout=300)
        outs.append(out)
        assert pr.returncode == 0, out

    results = {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("RESULT"):
                _, pid, niters, objv = line.split()
                results[pid] = (int(niters), float(objv))
    assert set(results) == {"0", "1"}, outs
    # both processes agree on the global result
    assert results["0"] == results["1"]
    assert results["0"][0] == 10
    assert np.isfinite(results["0"][1])


def test_init_distributed_idempotent():
    from nmf_tpu.parallel.mesh import init_distributed

    # calling on an uninitialized single process must not crash the test
    # process (it would try to become a 1-process cluster); just check the
    # symbol exists and is callable without args raising TypeError.
    assert callable(init_distributed)
