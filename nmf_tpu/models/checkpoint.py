"""Checkpoint / resume for long factorization runs.

The reference has no checkpointing; its only resume affordances are
``init=:custom`` (resume from saved factors) and ``initdata`` (reuse a
precomputed SVD) — both of which exist here too (SURVEY.md §5).  For the
10M x 1M-scale runs this module adds real mid-solve checkpointing with
**identical semantics to an uninterrupted solve**: the full solver state
(ALSPGrad's decaying tolg, CD's shuffle key, the iteration counter) is saved
alongside the factors, and the solve resumes through the same jitted
while_loop (``_solve_while_from``).

Storage backend: numpy ``.npz``, **multi-host-safe**.  Each process writes
one file per step (``ckpt_{step}.proc{pid}.npz``) containing

* fully-addressable leaves as plain arrays, and
* for distributed ``jax.Array`` leaves, only this process's addressable
  shards (deduplicated by index), each with its global-index bounds —

so no process ever gathers (or holds) another host's data.  Restore rebuilds
each distributed leaf with ``jax.make_array_from_callback`` against the live
template's sharding, reading shards from the local file; this assumes the
same process/mesh layout at save and restore time (the standard single-file-
per-host checkpoint contract).  The pytree structure is rebuilt from a
template at restore time, so no pickling is involved.
"""

from __future__ import annotations

import os
import re

import jax
import jax.numpy as jnp
import numpy as np

from .common import Result, _impl_for, _objective, _solve_while_from

__all__ = ["solve_checkpointed", "save_state", "load_state", "latest_checkpoint"]

_STEP_RE = re.compile(r"ckpt_(\d+)\.proc(\d+)\.npz$")


def _idx_bounds(index, shape) -> np.ndarray:
    """Normalize a shard index (tuple of slices) to an (ndim, 2) int64 array
    of [start, stop) bounds."""
    out = np.empty((len(shape), 2), np.int64)
    for d, (sl, dim) in enumerate(zip(index, shape)):
        out[d, 0] = 0 if sl.start is None else sl.start
        out[d, 1] = dim if sl.stop is None else sl.stop
    return out


def _bounds_key(index, shape) -> tuple:
    return tuple(map(tuple, _idx_bounds(index, shape)))


def save_state(directory: str, step: int, tree) -> str:
    """Save a pytree checkpoint for iteration ``step`` (this process's part;
    on multi-host every process must call this)."""
    os.makedirs(directory, exist_ok=True)
    leaves = jax.tree_util.tree_leaves(tree)
    payload = {}
    for i, leaf in enumerate(leaves):
        if isinstance(leaf, jax.Array) and not leaf.is_fully_addressable:
            seen = set()
            j = 0
            for s in leaf.addressable_shards:
                key = _bounds_key(s.index, leaf.shape)
                if key in seen:
                    continue
                seen.add(key)
                payload[f"l{i}_s{j}_data"] = np.asarray(s.data)
                payload[f"l{i}_s{j}_idx"] = _idx_bounds(s.index, leaf.shape)
                j += 1
        else:
            payload[f"l{i}_full"] = np.asarray(leaf)
    pid = jax.process_index()
    path = os.path.join(directory, f"ckpt_{step}.proc{pid}.npz")
    tmp = path + ".tmp.npz"  # .npz suffix stops np.savez appending another
    np.savez(tmp, **payload)
    os.replace(tmp, path)
    return path


def load_state(path: str, template):
    """Load this process's checkpoint file, shaping (and sharding) it like
    ``template``: leaves that are live ``jax.Array``s are placed with the
    template's sharding; distributed leaves are reassembled shard-by-shard
    via ``jax.make_array_from_callback``."""
    with np.load(path) as data:
        files = set(data.files)
        t_leaves, treedef = jax.tree_util.tree_flatten(template)
        out = []
        for i, t in enumerate(t_leaves):
            dtype = getattr(t, "dtype", None)
            if f"l{i}_full" in files:
                arr = jnp.asarray(data[f"l{i}_full"], dtype)
                if isinstance(t, jax.Array):
                    arr = jax.device_put(arr, t.sharding)
                out.append(arr)
                continue
            if f"l{i}_s0_data" not in files:
                raise ValueError(f"Checkpoint {path} is missing leaf {i}.")
            shards = {}
            j = 0
            while f"l{i}_s{j}_data" in files:
                key = tuple(map(tuple, data[f"l{i}_s{j}_idx"]))
                shards[key] = np.asarray(data[f"l{i}_s{j}_data"], dtype)
                j += 1
            shape = t.shape

            def cb(index, _shards=shards, _shape=shape):
                return _shards[_bounds_key(index, _shape)]

            out.append(jax.make_array_from_callback(shape, t.sharding, cb))
    return jax.tree_util.tree_unflatten(treedef, out)


def latest_checkpoint(directory: str) -> tuple[str, int] | None:
    """Latest (path, step) for THIS process's checkpoint files."""
    if not os.path.isdir(directory):
        return None
    pid = jax.process_index()
    best = None
    for name in os.listdir(directory):
        m = _STEP_RE.match(name)
        if m and int(m.group(2)) == pid:
            step = int(m.group(1))
            if best is None or step > best[1]:
                best = (os.path.join(directory, name), step)
    return best


def solve_checkpointed(
    alg,
    X,
    W,
    H,
    *,
    checkpoint_dir: str,
    checkpoint_every: int = 10,
    keep: int = 3,
) -> Result:
    """Solve with periodic checkpointing, resuming from the latest checkpoint
    in ``checkpoint_dir`` if one exists.  The returned Result is identical to
    an uninterrupted ``solve(alg, X, W, H)`` (same niters/converged/objv up
    to the usual floating-point reproducibility).  The objective is computed
    once, on the final factors — checkpoint chunks skip it, matching the
    reference's evaluate-at-the-end contract (src/common.jl:85-87)."""
    upd, tol = alg._resolved(W.dtype)
    impl = _impl_for(upd)
    maxiter = alg.maxiter
    tol = jnp.asarray(tol, W.dtype)

    state = impl.prepare(upd, X, W, H)
    t = 0
    template = (W, H, state, jnp.zeros((), jnp.int32))
    resume = latest_checkpoint(checkpoint_dir)
    if resume is not None:
        W, H, state, t_arr = load_state(resume[0], template)
        t = int(t_arr)

    converged = False
    while t < maxiter and not converged:
        chunk_end = min(t + checkpoint_every, maxiter)
        W, H, state, t_arr, converged_a, _ = _solve_while_from(
            upd, state, X, W, H, t, chunk_end, tol, with_objective=False
        )
        t = int(t_arr)
        converged = bool(converged_a)
        save_state(checkpoint_dir, t, (W, H, state, t_arr))
        _prune(checkpoint_dir, keep)

    objv = float(_objective(upd, state, X, W, H))
    return Result(W, H, t, converged, objv)


def _prune(directory: str, keep: int):
    """Keep the newest ``keep`` steps of THIS process's files."""
    pid = jax.process_index()
    entries = []
    for name in os.listdir(directory):
        m = _STEP_RE.match(name)
        if m and int(m.group(2)) == pid:
            entries.append((int(m.group(1)), name))
    entries.sort()
    for _, name in entries[:-keep] if keep > 0 else []:
        try:
            os.remove(os.path.join(directory, name))
        except OSError:
            pass
