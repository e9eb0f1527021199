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

``matmul_precision``: global override for the matmul precision used inside
solver loops.  ``None`` (default) means **auto**: on TPU each solver gets the
per-solver default from ``SOLVER_PRECISION`` (measured in
``benchmarks/precision_sweep.py``); on CPU matmuls are always exact f32/f64.
Set to one of jax's precision names ("default", "high" = 3-pass bf16 on TPU,
"highest" = exact f32) to force it everywhere, e.g.
``nmf_tpu.config.set_matmul_precision("highest")`` for reference-matching
convergence floors at ~2-6x per-iteration cost on bandwidth-light shapes.

Background (v5e, measured — benchmarks/precision_sweep.py, docs/precision.md):
with jax's TPU default, f32 matmuls run as single bf16 passes; iterative NMF
solvers then plateau at ~1e-3 relative reconstruction error instead of
reaching the f32 floor (~1e-6).  "high" (3-pass bf16) recovers most of the
floor; "highest" (6-pass) matches CPU convergence.
"""

from __future__ import annotations

import contextlib
import os

import jax

__all__ = [
    "use_pallas",
    "set_use_pallas",
    "pallas_enabled",
    "matmul_precision",
    "set_matmul_precision",
    "solver_precision",
    "precision_scope",
    "SOLVER_PRECISION",
    "verbose_chunk",
    "set_verbose_chunk",
    "effective_verbose_chunk",
    "enable_compilation_cache",
    "greedycd_cascade",
    "set_greedycd_cascade",
    "fnnls_cascade",
    "set_fnnls_cascade",
    "dispatch_chunk",
    "set_dispatch_chunk",
    "dispatch_chunk_scope",
]

_use_pallas: bool = False
matmul_precision: str | None = None

#: Iterations batched per device round-trip in ``verbose=True`` solves.
#: None = auto: 16 on TPU (a dispatch+readback over the axon tunnel costs
#: ~30-50 ms, so per-iteration stepping is seconds/row), 1 elsewhere (exact
#: per-iteration wall clock in the table, like the reference).
verbose_chunk: int | None = None


def set_verbose_chunk(value: int | None):
    global verbose_chunk
    if value is not None and (not isinstance(value, int) or value < 1):
        raise ValueError("verbose_chunk must be a positive int or None")
    verbose_chunk = value


def effective_verbose_chunk() -> int:
    if verbose_chunk is not None:
        return verbose_chunk
    return 16 if _on_tpu() else 1


#: Max solver iterations per device dispatch for non-verbose solves.
#: None = unchunked: the whole solve is ONE while_loop dispatch (lowest
#: overhead; the default).  At capacity scale a single dispatch of more
#: than ~50-95 s device time crashes the TPU worker over the axon tunnel
#: (measured, BENCH_full_r04 c6_greedycd rows) — a chunk keeps every
#: dispatch under that watchdog while producing bit-identical results:
#: the chunked driver resumes the SAME jitted while_loop body from the
#: carried solver state (``_solve_while_from``), so the update/stop
#: sequence is unchanged, only the host re-entry granularity differs.
#: Also settable via NMF_TPU_DISPATCH_CHUNK (read at import).
dispatch_chunk: int | None = (
    int(os.environ["NMF_TPU_DISPATCH_CHUNK"])
    if os.environ.get("NMF_TPU_DISPATCH_CHUNK")
    else None
)


def set_dispatch_chunk(value: int | None):
    """Set the global iterations-per-dispatch cap (None = unchunked)."""
    global dispatch_chunk
    if value is not None and (not isinstance(value, int) or value < 1):
        raise ValueError("dispatch_chunk must be a positive int or None")
    dispatch_chunk = value


class dispatch_chunk_scope:
    """Scoped override of :data:`dispatch_chunk` (used by
    ``nnmf(dispatch_chunk=...)``)."""

    def __init__(self, value: int | None):
        if value is not None and (not isinstance(value, int) or value < 1):
            raise ValueError("dispatch_chunk must be a positive int or None")
        self.value = value

    def __enter__(self):
        global dispatch_chunk
        self.saved = dispatch_chunk
        dispatch_chunk = self.value
        return self

    def __exit__(self, *exc):
        global dispatch_chunk
        dispatch_chunk = self.saved
        return False

#: Per-solver matmul precision applied on TPU when ``matmul_precision`` is
#: None (auto).  Values are jax precision names; a missing key = backend
#: default (single-pass bf16).  Measured on v5e (2000x1000 exact-rank-32,
#: benchmarks/precision_sweep.py; full table in docs/precision.md):
#:
#: - MultUpdate:mse stays on the fast default — precision only moves its
#:   floor 2.2x (9.4e-4 -> 4.3e-4, algorithmically slow convergence) at 4.6x
#:   per-iteration cost.
#: - MultUpdate:div "high": 2x better floor at 12% cost.
#: - ProjectedALS "high": 15x better floor (4.0e-4 -> 2.7e-5) at 1.75x cost.
#: - CoordinateDescent "high": 1.8x better floor at 9% cost (sequential
#:   k-loop dominates, matmuls are cheap).
#: - GreedyCD "high": 52x better floor (2.9e-3 -> 5.5e-5) at 1.5x cost —
#:   this is the ``nnmf`` default algorithm, so bf16 Grams would silently
#:   cap its quality.
#: - ALSPGrad "highest": 37x better floor AND ~14% *faster* — exact
#:   gradients make the data-dependent inner PG/line-search loops converge
#:   in fewer trials.
SOLVER_PRECISION: dict[str, str | None] = {
    "MultUpdate:div": "high",
    "ProjectedALS": "high",
    "CoordinateDescent": "high",
    "GreedyCD": "high",
    "ALSPGrad": "highest",
}


def set_matmul_precision(value: str | None):
    """Force a global matmul precision for all solver loops (None = auto)."""
    global matmul_precision
    allowed = (
        None,
        "default",
        "bfloat16",
        "high",
        "tensorfloat32",
        "float32",
        "highest",
    )
    if value not in allowed:
        raise ValueError(f"matmul_precision must be one of {allowed}")
    matmul_precision = value


def solver_precision(alg) -> str | None:
    """Resolve the effective matmul precision for a solver options object
    (or class-name string).  Looks up ``"Name:obj"`` first (e.g.
    ``"MultUpdate:div"``), then ``"Name"``."""
    if matmul_precision is not None:
        return matmul_precision
    if not _on_tpu():
        return None
    name = alg if isinstance(alg, str) else type(alg).__name__
    obj = getattr(alg, "obj", None)
    if obj is not None:
        keyed = SOLVER_PRECISION.get(f"{name}:{obj}")
        if keyed is not None:
            return keyed
    return SOLVER_PRECISION.get(name)


def precision_scope(value: str | None):
    """Context manager applying a jax matmul precision (None = no-op)."""
    if value is None:
        return contextlib.nullcontext()
    return jax.default_matmul_precision(value)


#: GreedyCD compaction-cascade knobs (shrink factor per level, smallest
#: buffer, and the row count below which compaction is skipped entirely).
#: Defaults were chosen from the config4 trip histogram
#: (benchmarks/greedycd_trips.py); env-seeded so benchmarks can sweep them
#: in fresh processes (``NMF_TPU_CASCADE_SHRINK`` / ``_MIN`` / ``_OFF_ROWS``).
#: The knobs are read at *trace* time; ``set_greedycd_cascade`` clears the
#: jit caches on change so later solves retrace with the new schedule.
def _env_int(name: str, default: int, lo: int) -> int:
    import os

    try:
        val = int(os.environ.get(name, default))
    except ValueError:
        return default
    # clamp: shrink < 2 makes the cascade-size loop spin forever at trace
    # time; min/off_rows < 1 grow the caps list unboundedly
    return max(val, lo)


greedycd_cascade: dict[str, int] = {
    "shrink": _env_int("NMF_TPU_CASCADE_SHRINK", 4, 2),
    # floor 128: the r5 on-chip sweep (benchmarks/results/r05_fourclass.jsonl)
    # measured config4 GreedyCD 5.72 (min=1024) -> 6.77 it/s (min=128), with
    # a plateau below 128 that only adds cascade levels (compile time)
    "min": _env_int("NMF_TPU_CASCADE_MIN", 128, 1),
    "off_rows": _env_int("NMF_TPU_CASCADE_OFF_ROWS", 4096, 1),
    # above this many rows the update runs as a lax.map over row slabs
    # (memory: the full-width G/S/D scratch is 4 (rows x k) f32 arrays —
    # 8 GB at 2M x 256); 512k rows ~= 2 GB of scratch at k=256
    "slab_rows": _env_int("NMF_TPU_CASCADE_SLAB_ROWS", 524_288, 1),
}

#: FNNLS compaction-cascade knobs (ops/fnnls.py) — same machinery as the
#: GreedyCD cascade, over the NNLS right-hand-side columns: ``off_cols`` is
#: the column count below which the plain masked loop runs uncompacted.
#: Trace-time constants like the GreedyCD knobs.
#: FNNLS compaction-cascade schedule — trace-time constants like the
#: GreedyCD knobs; change via :func:`set_fnnls_cascade` (which clears the
#: jit caches), never by mutating this dict after a jitted caller traced.
fnnls_cascade: dict[str, int] = {
    "shrink": _env_int("NMF_TPU_FNNLS_SHRINK", 4, 2),
    "min": _env_int("NMF_TPU_FNNLS_MIN", 256, 1),
    "off_cols": _env_int("NMF_TPU_FNNLS_OFF_COLS", 2048, 1),
}


def set_fnnls_cascade(shrink: int | None = None, min: int | None = None,
                      off_cols: int | None = None):
    """Override the FNNLS cascade schedule (None = keep current).  Same
    trace-time contract as :func:`set_greedycd_cascade`: a change drops the
    jit caches so already-traced SPA/FNNLS programs retrace with the new
    schedule instead of silently keeping the old one."""
    changed = False
    for key, val in (("shrink", shrink), ("min", min), ("off_cols", off_cols)):
        if val is not None:
            if not isinstance(val, int) or val < (2 if key == "shrink" else 1):
                raise ValueError(f"cascade {key} must be an int >= "
                                 f"{2 if key == 'shrink' else 1}")
            changed |= fnnls_cascade[key] != val
            fnnls_cascade[key] = val
    if changed:
        jax.clear_caches()


def set_greedycd_cascade(shrink: int | None = None, min: int | None = None,
                         off_rows: int | None = None,
                         slab_rows: int | None = None):
    """Override the GreedyCD cascade schedule (None = keep current).

    The knobs are trace-time constants, so changing them drops jax's jit
    caches (``jax.clear_caches()``) — otherwise an already-traced solve of
    the same shape would silently keep the old schedule."""
    changed = False
    for key, val in (("shrink", shrink), ("min", min), ("off_rows", off_rows),
                     ("slab_rows", slab_rows)):
        if val is not None:
            if not isinstance(val, int) or val < (2 if key == "shrink" else 1):
                raise ValueError(f"cascade {key} must be an int >= "
                                 f"{2 if key == 'shrink' else 1}")
            changed |= greedycd_cascade[key] != val
            greedycd_cascade[key] = val
    if changed:
        jax.clear_caches()


def set_use_pallas(value: bool):
    global _use_pallas
    if value not in (True, False):
        raise ValueError("use_pallas must be True or False")
    _use_pallas = value


def use_pallas() -> bool:
    return _use_pallas


def enable_compilation_cache(path: str | None = None):
    """Persist XLA compilations to disk so cold-start costs (e.g. the
    nndsvdar init's QR/SVD pipeline, measured at ~21 s to compile on v5e —
    docs/tpu_results.md) are paid once per machine, not once per process.

    Thin wrapper over jax's compilation cache with NMF-suited defaults:
    cache everything (no minimum compile time / entry size).  ``path``
    defaults to ``~/.cache/nmf_tpu_xla``.
    """
    import os

    path = path or os.path.join(
        os.path.expanduser("~"), ".cache", "nmf_tpu_xla"
    )
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return path


def _on_tpu() -> bool:
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False


def pallas_enabled() -> bool:
    return _use_pallas and _on_tpu()
