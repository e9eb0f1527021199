"""Test configuration.

Tests run on CPU with 8 virtual devices (the standard way to exercise
pjit/sharding without a pod) and with x64 enabled so float64 parity tests
against the reference's defaults are exact.

TPU smoke lane: ``NMF_TPU_LANE=1 python -m pytest tests -m tpu`` skips the
CPU pinning (and x64, which TPUs lack) and runs only the ``@pytest.mark.tpu``
on-device tests (tests/test_tpu_smoke.py).
"""

import os
import sys

TPU_LANE = os.environ.get("NMF_TPU_LANE") == "1"

if not TPU_LANE:
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if not TPU_LANE:
    # NOTE: under the axon TPU plugin the JAX_PLATFORMS env var is ignored;
    # the config update below is what actually pins the test run to CPU.
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
