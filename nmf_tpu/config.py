"""Global configuration knobs.

``use_pallas``: route dense MU ops through the hand-written Pallas kernels in
``nmf_tpu.ops.pallas``.  Default **False**: measured on v5e (4096x4096, k=64,
chained-loop timing), XLA's autofusion beats the hand kernels on these dense
patterns (wtq 0.065 ms vs 0.228 ms; fused-objective 0.062 ms vs 0.159 ms) —
XLA already fuses the elementwise quotient/update into the matmul pipeline,
exactly as the TPU programming model predicts ("don't hand-schedule what the
compiler already does").  The kernels remain available (a) as an opt-in
backend, (b) for interpret-mode testing, and (c) as the scaffolding for the
sparse gather-matmul path where XLA has no good answer.

``matmul_precision``: None leaves jax defaults (on TPU: bf16 passes for f32
matmuls — fastest, ~1e-3 convergence floor); "highest" forces full-precision
f32 for reference-matching convergence on TPU.  CPU is always full precision.
Use ``jax.default_matmul_precision("highest")`` around a solve, or set this
knob and call ``apply_matmul_precision`` at entry points.
"""

from __future__ import annotations

import jax

__all__ = ["use_pallas", "set_use_pallas", "pallas_enabled", "matmul_precision"]

_use_pallas: bool = False
matmul_precision: str | None = None


def set_use_pallas(value: bool):
    global _use_pallas
    if value not in (True, False):
        raise ValueError("use_pallas must be True or False")
    _use_pallas = value


def use_pallas() -> bool:
    return _use_pallas


def _on_tpu() -> bool:
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False


def pallas_enabled() -> bool:
    return _use_pallas and _on_tpu()
