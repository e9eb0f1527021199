"""Dense NMF demo (counterpart of /root/reference/examples/densenmf.jl).

Usage: python examples/densenmf.py [alg]
with alg in: multmse multdiv projals alspgrad cd greedycd (default multmse).

Generates an 8x100 noisy rank-5 matrix, runs nnmf with NNDSVDar init and
verbose tracing, and prints the factors and metrics.
"""

import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import nmf_tpu
from nmf_tpu.utils.numeric import printf_mat


def main():
    alg = sys.argv[1] if len(sys.argv) > 1 else "multmse"

    rng = np.random.default_rng(5678)
    p, n, k = 8, 100, 5
    Wg = rng.random((p, k)) * 2.0
    Hg = rng.random((k, n))
    X = np.maximum(Wg @ Hg + rng.standard_normal((p, n)) * 0.1, 0.0)
    X = jnp.asarray(X, jnp.float32)

    ret = nmf_tpu.nnmf(X, k, alg=alg, init="nndsvdar", maxiter=100, verbose=True)

    print(f"\nniters     = {ret.niters}")
    print(f"converged  = {ret.converged}")
    print(f"objvalue   = {ret.objvalue:.6e}")
    rel = float(
        jnp.linalg.norm(X - ret.W @ ret.H) / jnp.linalg.norm(X)
    )
    print(f"rel. error = {rel:.4f}")
    print("\nW =")
    printf_mat(ret.W)


if __name__ == "__main__":
    main()
