"""Fast non-negative least squares (FNNLS, Bro & de Jong 1997), batched.

The reference delegates SPA's H estimate to
``NonNegLeastSquares.nonneg_lsq(W, X, alg=:fnnls)``
(/root/reference/src/spa.jl:64).  Here FNNLS is a first-class component:
an active-set state machine expressed as bounded ``lax.while_loop``s over a
boolean passive-set mask, ``vmap``-batched over the right-hand-side columns —
all n columns of X advance in lockstep on the TPU, each step being k x k
masked solves (k is small, replicated across the mesh).

The passive-set linear solve uses the masking trick: rows/cols outside the
passive set are replaced by identity so a single dense ``solve`` yields the
sub-system solution with zeros elsewhere — no dynamic shapes.
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
    outer: jax.Array
    done: jax.Array


def _masked_solve(AtA, Atb, P):
    """Solve the passive subsystem: rows/cols outside P become identity."""
    k = AtA.shape[0]
    dt = AtA.dtype
    Pm = P[:, None] & P[None, :]
    eye = jnp.eye(k, dtype=dt)
    A = jnp.where(Pm, AtA, eye)
    b = jnp.where(P, Atb, jnp.zeros((), dt))
    return jnp.linalg.solve(A, b)


def _fnnls_single(AtA, Atb, max_outer, tol):
    k = AtA.shape[0]
    dt = AtA.dtype
    zero = jnp.zeros((), dt)
    neg_inf = jnp.asarray(-jnp.inf, dt)

    def inner(x, P):
        """Backtrack until the passive solution is feasible (s_P > 0)."""

        class _IC(NamedTuple):
            x: jax.Array
            P: jax.Array
            s: jax.Array
            it: jax.Array

        def cond(c: _IC):
            bad = jnp.any(c.P & (c.s <= tol))
            return jnp.logical_and(bad, c.it < k + 1)

        def body(c: _IC):
            sel = c.P & (c.s <= tol)
            denom = c.x - c.s
            ratio = jnp.where(
                sel & (denom != 0), c.x / jnp.where(denom != 0, denom, 1), jnp.inf
            )
            alpha = jnp.min(ratio)
            x = c.x + alpha * (c.s - c.x)
            P = c.P & (x > tol)
            s = _masked_solve(AtA, Atb, P)
            return _IC(x, P, s, c.it + 1)

        s0 = _masked_solve(AtA, Atb, P)
        out = jax.lax.while_loop(
            cond, body, _IC(x, P, s0, jnp.zeros((), jnp.int32))
        )
        x = jnp.where(out.P, out.s, zero)
        return x, out.P

    def cond(c: _Carry):
        return jnp.logical_and(~c.done, c.outer < max_outer)

    def body(c: _Carry):
        # Pick the most violated inactive coordinate.
        w_masked = jnp.where(c.P, neg_inf, c.w)
        j = jnp.argmax(w_masked)
        stop = jnp.all(c.P) | (w_masked[j] <= tol)

        def step(c: _Carry):
            P = c.P.at[j].set(True)
            x, P = inner(c.x, P)
            w = Atb - AtA @ x
            return _Carry(x, P, w, c.outer + 1, jnp.zeros((), bool))

        return jax.lax.cond(
            stop,
            lambda c: _Carry(c.x, c.P, c.w, c.outer + 1, jnp.ones((), bool)),
            step,
            c,
        )

    init = _Carry(
        jnp.zeros((k,), dt),
        jnp.zeros((k,), bool),
        Atb,
        jnp.zeros((), jnp.int32),
        jnp.zeros((), bool),
    )
    return jax.lax.while_loop(cond, body, init).x


def nnls_gram(AtA, AtB, *, max_outer: int | None = None):
    """Batched FNNLS on precomputed Grams: minimize ``||A x_j - b_j||`` s.t.
    ``x_j >= 0`` for every column j of B, given ``AtA = A'A`` and
    ``AtB = A'B`` (k x n).  Returns the (k x n) solution."""
    k = AtA.shape[0]
    if max_outer is None:
        max_outer = 3 * k + 10
    dt = AtA.dtype
    # NonNegLeastSquares.jl's fnnls tolerance: 10*eps*||AtA||_1*k.
    tol = 10 * jnp.finfo(dt).eps * jnp.max(jnp.sum(jnp.abs(AtA), axis=0)) * k
    solve = jax.vmap(lambda atb: _fnnls_single(AtA, atb, max_outer, tol), in_axes=1, out_axes=1)
    return solve(AtB)


def fnnls(A, B, *, precise: bool = True):
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
    return nnls_gram(AtA, AtB).astype(dt)
