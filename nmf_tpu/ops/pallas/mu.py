"""Fused Pallas kernels for the multiplicative-update hot loop.

Two fusions the XLA autofuser cannot do across HBM materialization points:

* ``mu_factor_update``: the MSE factor update
  ``F <- F * max(0, C - lam) / (G @ F + delta)`` (F: k x m factor, G: k x k
  Gram, C: k x m cross term) — the Gram matmul's result feeds the VPU update
  directly from VMEM; the k x m intermediate ``G @ F`` never reaches HBM.
  Serves both halves of the sweep: H directly (G=W'W, C=W'X) and W via
  transposition (G=HH', C=(XH')').

* ``wtq`` / ``qht``: the divergence sweep's Gram-of-quotient products
  ``W' Q`` and ``Q H'`` with ``Q = X / (W H + delta)`` computed tile-wise —
  the reference holds a full p x n Q buffer (src/multupd.jl:128-145); here Q
  only ever exists as a VMEM tile between the two MXU matmuls.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .objectives import _pad_to

__all__ = ["mu_factor_update", "wtq", "qht"]

_BM = 256
_BN = 256


def _mu_update_kernel(f_ref, g_ref, c_ref, lam_ref, out_ref, *, delta):
    gf = jnp.dot(g_ref[:], f_ref[:], preferred_element_type=jnp.float32)
    f = f_ref[:].astype(jnp.float32)
    c = c_ref[:].astype(jnp.float32)
    lam = lam_ref[0, 0].astype(jnp.float32)
    num = jnp.maximum(c - lam, 0.0)
    out_ref[:] = (f * num / (gf + delta)).astype(out_ref.dtype)


@partial(jax.jit, static_argnames=("delta",))
def mu_factor_update(F, G, C, lam, delta):
    """``F * max(0, C - lam) / (G @ F + delta)`` fused (MSE MU step,
    src/multupd.jl:96-115 semantics)."""
    k, m = F.shape
    Fp = _pad_to(F, _BN, (1,))
    Cp = _pad_to(C, _BN, (1,))
    mp = Fp.shape[1]
    lam2d = jnp.asarray(lam, jnp.float32).reshape(1, 1)
    grid = (mp // _BN,)
    out = pl.pallas_call(
        partial(_mu_update_kernel, delta=float(delta)),
        grid=grid,
        in_specs=[
            pl.BlockSpec((k, _BN), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, k), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, _BN), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda j: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((k, _BN), lambda j: (0, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((k, mp), F.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * k * k * mp + 4 * k * mp,
            bytes_accessed=3 * k * mp * F.dtype.itemsize,
            transcendentals=0,
        ),
    )(Fp, G, Cp, lam2d)
    return out[:, :m]


def _wtq_kernel(x_ref, w_ref, h_ref, out_ref, *, delta):
    i = pl.program_id(1)  # p-tile (reduction axis)
    wh = jnp.dot(w_ref[:], h_ref[:], preferred_element_type=jnp.float32)
    q = x_ref[:].astype(jnp.float32) / (wh + delta)
    partial_out = jnp.dot(
        w_ref[:].T.astype(jnp.float32), q, preferred_element_type=jnp.float32
    )

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    out_ref[:] += partial_out.astype(out_ref.dtype)


@partial(jax.jit, static_argnames=("delta",))
def wtq(X, W, H, delta):
    """``W' @ (X / (W H + delta))`` (k x n) without materializing Q."""
    p, n = X.shape
    k = W.shape[1]
    Xp = _pad_to(_pad_to(X, _BM, (0,)), _BN, (1,))
    Wp = _pad_to(W, _BM, (0,))
    Hp = _pad_to(H, _BN, (1,))
    pp, np_ = Xp.shape
    grid = (np_ // _BN, pp // _BM)  # j outer, i inner: finish each block's sum
    out = pl.pallas_call(
        partial(_wtq_kernel, delta=float(delta)),
        grid=grid,
        in_specs=[
            pl.BlockSpec((_BM, _BN), lambda j, i: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((_BM, k), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, _BN), lambda j, i: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((k, _BN), lambda j, i: (0, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((k, np_), W.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * pp * np_ * k + 2 * pp * np_,
            bytes_accessed=(pp * np_ + (pp * k + k * np_) * 2) * X.dtype.itemsize,
            transcendentals=0,
        ),
    )(Xp, Wp, Hp)
    return out[:, :n]


def _qht_kernel(x_ref, w_ref, h_ref, out_ref, *, delta):
    j = pl.program_id(1)  # n-tile (reduction axis)
    wh = jnp.dot(w_ref[:], h_ref[:], preferred_element_type=jnp.float32)
    q = x_ref[:].astype(jnp.float32) / (wh + delta)
    partial_out = jnp.dot(
        q, h_ref[:].T.astype(jnp.float32), preferred_element_type=jnp.float32
    )

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    out_ref[:] += partial_out.astype(out_ref.dtype)


@partial(jax.jit, static_argnames=("delta",))
def qht(X, W, H, delta):
    """``(X / (W H + delta)) @ H'`` (p x k) without materializing Q."""
    p, n = X.shape
    k = W.shape[1]
    Xp = _pad_to(_pad_to(X, _BM, (0,)), _BN, (1,))
    Wp = _pad_to(W, _BM, (0,))
    Hp = _pad_to(H, _BN, (1,))
    pp, np_ = Xp.shape
    grid = (pp // _BM, np_ // _BN)  # i outer, j inner
    out = pl.pallas_call(
        partial(_qht_kernel, delta=float(delta)),
        grid=grid,
        in_specs=[
            pl.BlockSpec((_BM, _BN), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((_BM, k), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, _BN), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_BM, k), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((pp, k), W.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * pp * np_ * k + 2 * pp * np_,
            bytes_accessed=(pp * np_ + (pp * k + k * np_) * 2) * X.dtype.itemsize,
            transcendentals=0,
        ),
    )(Xp, Wp, Hp)
    return out[:p, :]
