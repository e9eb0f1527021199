"""Fast non-negative least squares (FNNLS, Bro & de Jong 1997), batched.

The reference delegates SPA's H estimate to
``NonNegLeastSquares.nonneg_lsq(W, X, alg=:fnnls)``
(/root/reference/src/spa.jl:64).  Here FNNLS is a first-class component:
an active-set state machine expressed as bounded ``lax.while_loop``s over a
boolean passive-set mask, batched over the right-hand-side columns.

The passive-set linear solve uses the masking trick: rows/cols outside the
passive set are replaced by identity so a single dense ``solve`` yields the
sub-system solution with zeros elsewhere — no dynamic shapes.

Lockstep mitigation (the GreedyCD trick, models/greedycd.py): a plain
``vmap`` over columns runs EVERY column for the slowest column's outer-iter
count, each step costing a k x k solve per column — NNLS solutions are
sparse and most columns finish in a few coordinate additions while a heavy
tail drives the loop.  The batched driver therefore runs an adaptive
*compaction cascade*: masked full-width steps run only while the
active-column count exceeds the next (1/shrink-sized) buffer, then the
still-active columns are gathered into that buffer and the loop continues
there, shrinking again as columns finish.  Finished columns' carries are
held fixed by the step mask, so results are bit-identical to the plain
vmapped loop (pinned in tests/test_fnnls.py).  Knobs live in
``config.fnnls_cascade``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import matops

__all__ = ["fnnls", "nnls_gram"]


class _Carry(NamedTuple):
    x: jax.Array  # current solution (k,)
    P: jax.Array  # passive-set mask (k,) bool
    w: jax.Array  # dual / negative gradient (k,)
    atb: jax.Array  # this column's A'b (k,)
    outer: jax.Array
    done: jax.Array
    # flat state machine (round 5): the nested outer-while / cond /
    # inner-while form compiled three masked-solve instances per cascade
    # level; the flat form runs ONE solve per step with a phase flag
    s: jax.Array  # trial passive solution (k,)
    phase: jax.Array  # False = add coordinate, True = backtracking
    it: jax.Array  # backtracking step count (inner bound k+1)


def _masked_solve(AtA, Atb, P):
    """Solve the passive subsystem: rows/cols outside P become identity."""
    k = AtA.shape[0]
    dt = AtA.dtype
    Pm = P[:, None] & P[None, :]
    eye = jnp.eye(k, dtype=dt)
    A = jnp.where(Pm, AtA, eye)
    b = jnp.where(P, Atb, jnp.zeros((), dt))
    return jnp.linalg.solve(A, b)


def _make_flat_body(AtA, tol):
    """One step of the FLAT FNNLS state machine for a single column.

    Same math as the Bro & de Jong nest (outer add-coordinate loop, inner
    backtracking loop), but flattened into a single step function with a
    ``phase`` flag so batched drivers run ONE while_loop whose body holds
    exactly ONE masked solve — the nested outer-while/cond/inner-while form
    compiled three solve instances per program, and the SPA cascade
    compiles the program once per level (measured 287 s first-call at
    spa4; the ALSPGrad flattening precedent was 340 s -> 40 s).

    Per-column semantics are unchanged: ADD picks the most-violated
    inactive coordinate (or freezes via ``done`` with ``outer`` counting,
    exactly like the nested freeze branch); the trial passive solution is
    committed when feasible, else the step switches to BACKTRACK, whose
    alpha-steps run until feasible or the ``k+1`` inner bound — the same
    solve sequence in the same order, so results are bit-identical (pinned
    against the reference oracle in tests/test_fnnls.py).  ``outer``
    counts committed/frozen outer steps only, preserving the ``max_outer``
    contract."""
    k = AtA.shape[0]
    dt = AtA.dtype
    zero = jnp.zeros((), dt)
    neg_inf = jnp.asarray(-jnp.inf, dt)

    def body(c: _Carry):
        is_add = ~c.phase
        # ADD: most-violated inactive coordinate (garbage under BACKTRACK,
        # masked below)
        w_masked = jnp.where(c.P, neg_inf, c.w)
        j = jnp.argmax(w_masked)
        stop = jnp.all(c.P) | (w_masked[j] <= tol)
        newly_done = is_add & stop
        P_add = c.P.at[j].set(True)
        # BACKTRACK: alpha-step toward the (infeasible) trial solution
        sel = c.P & (c.s <= tol)
        denom = c.x - c.s
        ratio = jnp.where(
            sel & (denom != 0), c.x / jnp.where(denom != 0, denom, 1), jnp.inf
        )
        alpha = jnp.min(ratio)
        x_bt = c.x + alpha * (c.s - c.x)
        P_bt = c.P & (x_bt > tol)
        # the one shared solve
        P_next = jnp.where(is_add, P_add, P_bt)
        x_pre = jnp.where(is_add, c.x, x_bt)
        s_next = _masked_solve(AtA, c.atb, P_next)
        it_next = jnp.where(is_add, jnp.zeros_like(c.it), c.it + 1)
        feasible = ~jnp.any(P_next & (s_next <= tol))
        accept = feasible | (~is_add & (it_next >= k + 1))
        x_acc = jnp.where(P_next, s_next, zero)
        w_acc = c.atb - AtA @ x_acc
        advance = ~newly_done
        commit = advance & accept
        x = jnp.where(commit, x_acc, jnp.where(advance, x_pre, c.x))
        P = jnp.where(advance, P_next, c.P)
        w = jnp.where(commit, w_acc, c.w)
        s = jnp.where(advance, s_next, c.s)
        phase = jnp.where(advance, ~accept, c.phase)
        it = jnp.where(advance, jnp.where(accept, jnp.zeros_like(c.it), it_next), c.it)
        outer = c.outer + (newly_done | commit).astype(c.outer.dtype)
        done = c.done | newly_done
        return _Carry(x, P, w, c.atb, outer, done, s, phase, it)

    return body


def _init_carry(AtB_cols):
    """Batched initial carry from (n, k) right-hand Grams."""
    n, k = AtB_cols.shape
    return _Carry(
        jnp.zeros((n, k), AtB_cols.dtype),
        jnp.zeros((n, k), bool),
        AtB_cols,
        AtB_cols,
        jnp.zeros((n,), jnp.int32),
        jnp.zeros((n,), bool),
        jnp.zeros((n, k), AtB_cols.dtype),
        jnp.zeros((n,), bool),
        jnp.zeros((n,), jnp.int32),
    )


def nnls_gram(AtA, AtB, *, max_outer: int | None = None,
              cascade: bool | None = None):
    """Batched FNNLS on precomputed Grams: minimize ``||A x_j - b_j||`` s.t.
    ``x_j >= 0`` for every column j of B, given ``AtA = A'A`` and
    ``AtB = A'B`` (k x n).  Returns the (k x n) solution.

    ``cascade`` selects the compaction-cascade driver (None = on when the
    column count clears ``config.fnnls_cascade["off_cols"]``); results are
    identical either way.
    """
    from .. import config

    k, n = AtA.shape[0], AtB.shape[1]
    if max_outer is None:
        max_outer = 3 * k + 10
    dt = AtA.dtype
    # NonNegLeastSquares.jl's fnnls tolerance: 10*eps*||AtA||_1*k.
    tol = 10 * jnp.finfo(dt).eps * jnp.max(jnp.sum(jnp.abs(AtA), axis=0)) * k
    body1 = _make_flat_body(AtA, tol)
    body_vec = jax.vmap(body1)

    knobs = config.fnnls_cascade
    if cascade is None:
        cascade = n >= knobs["off_cols"]

    def active_of(c: _Carry):
        return (~c.done) & (c.outer < max_outer)

    def masked_step(c: _Carry):
        new = body_vec(c)
        a = active_of(c)
        pick = lambda nw, od: jnp.where(
            a.reshape((-1,) + (1,) * (nw.ndim - 1)), nw, od
        )
        return jax.tree_util.tree_map(pick, new, c)

    if not cascade:
        out = jax.lax.while_loop(
            lambda c: jnp.any(active_of(c)), masked_step, _init_carry(AtB.T)
        )
        return out.x.T

    # ---- compaction cascade (models/greedycd.py:183-230, same machinery):
    # static buffer sizes n, n/shrink, ... down to the floor; each level
    # runs masked full-width steps only while the active count exceeds the
    # next buffer, then gathers the still-active columns into it.
    shrink, floor = knobs["shrink"], knobs["min"]
    caps = []
    cur = n
    while cur // shrink >= floor:
        cur = cur // shrink
        caps.append(cur)

    x_full = jnp.zeros((n, k), dt)
    idx = None  # level-0 buffer is the identity mapping
    carry = _init_carry(AtB.T)
    for next_cap in caps:

        def level_cond(c, nc=next_cap):
            return jnp.sum(active_of(c)) > nc

        carry = jax.lax.while_loop(level_cond, masked_step, carry)
        # checkpoint this level's solutions (columns finishing here keep
        # them); fill slots carry idx == n and drop in the OOB scatter
        if idx is None:
            x_full = carry.x
        else:
            x_full = x_full.at[idx].set(carry.x, mode="drop")
        act = active_of(carry)
        nr = carry.x.shape[0]
        (loc,) = jnp.nonzero(act, size=next_cap, fill_value=nr)
        fill = loc >= nr
        safe = jnp.minimum(loc, nr - 1)
        carry = jax.tree_util.tree_map(lambda a: a[safe], carry)
        # freeze fill slots (duplicate a real column's carry, never step)
        carry = carry._replace(done=fill | carry.done)
        idx = jnp.where(fill, n, loc if idx is None else idx[safe])

    carry = jax.lax.while_loop(
        lambda c: jnp.any(active_of(c)), masked_step, carry
    )
    if idx is None:
        x_full = carry.x
    else:
        x_full = x_full.at[idx].set(carry.x, mode="drop")
    return x_full.T


def fnnls(A, B, *, precise: bool = True, cascade: bool | None = None):
    """minimize ``||A X - B||_F`` s.t. ``X >= 0`` columnwise
    (the reference's ``nonneg_lsq(W, X, alg=:fnnls)``, src/spa.jl:64).

    ``precise=True`` runs the tiny k x k active-set iteration in float64 when
    x64 is enabled (exact-separability tests require machine-precision
    recovery); the result is cast back to the input dtype.
    """
    dt = A.dtype
    work_dt = dt
    if precise and jax.config.jax_enable_x64:
        work_dt = jnp.float64
    Aw = A.astype(work_dt)
    AtA = Aw.T @ Aw
    if matops.is_sparse(B):
        AtB = matops.mtm(Aw.T, matops.scale_values(B, matops.nnz_values(B).astype(work_dt)))
    else:
        AtB = Aw.T @ B.astype(work_dt)
    return nnls_gram(AtA, AtB, cascade=cascade).astype(dt)
