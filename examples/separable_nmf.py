"""Separable NMF via SPA (counterpart of
/root/reference/examples/separable_nmf.jl): generate exactly separable data,
factorize with alg="spa", init="spa", report reconstruction quality."""

import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import nmf_tpu


def main():
    m, n, k = 100, 50, 5
    W, H = nmf_tpu.separable_data(m, n, k, key=jax.random.PRNGKey(0))
    X = W @ H

    ret = nmf_tpu.nnmf(X, k, alg="spa", init="spa")
    err = float(nmf_tpu.sqL2dist(X, ret.W @ ret.H))
    print(f"niters={ret.niters} converged={ret.converged} objv={ret.objvalue:.3e}")
    print(f"sqL2dist(X, WH) = {err:.3e}")


if __name__ == "__main__":
    main()
