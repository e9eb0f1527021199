"""Fused Pallas objective kernels.

``0.5*||X - WH||^2`` and ``gkldiv(X, WH)`` computed tile-wise: each grid step
does one MXU matmul (W_tile @ H_tile) and a fused VPU reduction, accumulating
into a scalar — the p x n product never exists in HBM (the reference
materializes a full WH buffer for every objective evaluation, e.g.
/root/reference/src/multupd.jl:63-81).

TPU grid steps run sequentially per core, so the scalar accumulator uses the
standard revisit pattern: zero it on the first step, add on every step.
Inputs are zero-padded to tile multiples — both objectives vanish on
(x=0, wh=0) padding.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["mse_objective_pallas", "kl_objective_pallas"]

_BM = 256
_BN = 256


def _pad_to(x, m, axes):
    pads = [(0, 0)] * x.ndim
    changed = False
    for ax in axes:
        r = (-x.shape[ax]) % m
        if r:
            pads[ax] = (0, r)
            changed = True
    return jnp.pad(x, pads) if changed else x


def _obj_kernel(x_ref, w_ref, h_ref, out_ref, *, kind):
    i = pl.program_id(0)
    j = pl.program_id(1)

    wh = jnp.dot(w_ref[:], h_ref[:], preferred_element_type=jnp.float32)
    x = x_ref[:].astype(jnp.float32)
    if kind == "mse":
        d = x - wh
        partial_sum = 0.5 * jnp.sum(d * d)
    else:  # generalized KL, StatsBase.gkldiv semantics (a=0 -> contributes b)
        pos = x > 0
        safe_x = jnp.where(pos, x, 1.0)
        safe_wh = jnp.where(wh > 0, wh, 1.0)
        term = jnp.where(pos, safe_x * (jnp.log(safe_x) - jnp.log(safe_wh)) - x + wh, wh)
        partial_sum = jnp.sum(term)

    @pl.when(jnp.logical_and(i == 0, j == 0))
    def _():
        out_ref[0, 0] = jnp.zeros((), jnp.float32)

    out_ref[0, 0] += partial_sum


@partial(jax.jit, static_argnames=("kind",))
def _objective_pallas(X, W, H, kind):
    p, n = X.shape
    k = W.shape[1]
    Xp = _pad_to(X, _BM, (0,))
    Xp = _pad_to(Xp, _BN, (1,))
    Wp = _pad_to(W, _BM, (0,))
    Hp = _pad_to(H, _BN, (1,))
    pp, np_ = Xp.shape

    grid = (pp // _BM, np_ // _BN)
    out = pl.pallas_call(
        partial(_obj_kernel, kind=kind),
        grid=grid,
        in_specs=[
            pl.BlockSpec((_BM, _BN), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((_BM, k), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, _BN), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * pp * np_ * k + 4 * pp * np_,
            bytes_accessed=(pp * np_ + pp * k * grid[1] + k * np_ * grid[0]) * X.dtype.itemsize,
            transcendentals=0 if kind == "mse" else pp * np_,
        ),
    )(Xp, Wp, Hp)
    return out[0, 0].astype(W.dtype)


def mse_objective_pallas(X, W, H):
    """0.5*||X - W@H||^2 without materializing WH."""
    return _objective_pallas(X, W, H, "mse")


def kl_objective_pallas(X, W, H):
    """gkldiv(X, W@H) without materializing WH."""
    return _objective_pallas(X, W, H, "kl")
