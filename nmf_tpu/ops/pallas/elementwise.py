"""Fused elementwise Pallas kernels (nonneg projection, column normalize).

These mirror the reference's scalar utility loops
(/root/reference/src/utils.jl:26-41).  Under jit XLA already fuses the jnp
versions into neighboring ops, so these kernels exist for the cases where an
op stands alone at a pipeline boundary (e.g. projecting a factor right after
a Cholesky solve) and as the named components of the north-star kernel set.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .objectives import _pad_to

__all__ = ["projectnn_pallas", "normalize1_cols_pallas"]

_BM = 512
_BN = 512


def _proj_kernel(x_ref, out_ref):
    out_ref[:] = jnp.maximum(x_ref[:], jnp.zeros((), x_ref.dtype))


@jax.jit
def projectnn_pallas(A):
    """max(A, 0) as a standalone VPU kernel."""
    m, n = A.shape
    Ap = _pad_to(_pad_to(A, _BM, (0,)), _BN, (1,))
    mp, np_ = Ap.shape
    out = pl.pallas_call(
        _proj_kernel,
        grid=(mp // _BM, np_ // _BN),
        in_specs=[pl.BlockSpec((_BM, _BN), lambda i, j: (i, j), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((_BM, _BN), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(Ap.shape, A.dtype),
    )(Ap)
    return out[:m, :n]


def _colsum_kernel(x_ref, out_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    out_ref[:] += jnp.sum(x_ref[:], axis=0, keepdims=True).astype(out_ref.dtype)


def _scale_kernel(x_ref, s_ref, out_ref):
    out_ref[:] = x_ref[:] / s_ref[:]


@jax.jit
def normalize1_cols_pallas(A):
    """Scale each column of A to sum to one (two fused passes)."""
    m, n = A.shape
    Ap = _pad_to(A, _BM, (0,))
    mp = Ap.shape[0]
    sums = pl.pallas_call(
        _colsum_kernel,
        grid=(mp // _BM,),
        in_specs=[pl.BlockSpec((_BM, n), lambda i: (i, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, n), A.dtype),
    )(Ap)
    out = pl.pallas_call(
        _scale_kernel,
        grid=(mp // _BM,),
        in_specs=[
            pl.BlockSpec((_BM, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_BM, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(Ap.shape, A.dtype),
    )(Ap, sums)
    return out[:m, :]
