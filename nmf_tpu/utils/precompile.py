"""Compile-cache warmup.

The reference precompiles the full (alg x init) grid on an 8x6 random matrix
at package build via PrecompileTools (/root/reference/src/NMF.jl:25-38).  The
JAX analogue is warming the jit cache: `warmup()` runs the same grid on a
tiny problem so subsequent solves of any configuration skip tracing.  Note
XLA compilation is shape-specialized, so this warms tracing + the compiler's
persistent cache, not every future shape.
"""

from __future__ import annotations

import numpy as np

__all__ = ["warmup"]

_ALGS = ("multmse", "multdiv", "projals", "alspgrad", "cd", "greedycd")
_INITS = ("random", "nndsvd", "nndsvda", "nndsvdar", "spa")


def warmup(dtype=np.float32, algs=_ALGS, inits=_INITS, k: int = 4):
    """Run every (alg, init) pair on a tiny random matrix (reference
    precompile workload shape: 8x6, k=4)."""
    import jax.numpy as jnp

    from ..models.interface import nnmf

    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.random((8, 6)).astype(dtype))
    for alg in algs:
        for init in inits:
            nnmf(X, k, alg=alg, init=init, maxiter=2)
    nnmf(X, k, alg="spa", init="spa")
    return len(algs) * len(inits) + 1
