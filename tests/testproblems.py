"""Shared test fixtures, mirroring /root/reference/test/testproblems.jl.

``laurberg6x3``: Example 3 of Laurberg et al. 2008 ("Theorems on Positive
Data: On the Uniqueness of NMF") — for alpha = 0.1 or 0.3 the rank-3 NMF of
the 6x6 product is unique up to scaling, so solvers can be tested for
*recovery*, not just objective decrease.
"""

import numpy as np


def laurberg6x3(alpha, dtype=np.float64):
    H = np.array(
        [
            [alpha, 1, 1, alpha, 0, 0],
            [1, alpha, 0, 0, alpha, 1],
            [0, 0, alpha, 1, 1, alpha],
        ],
        dtype=dtype,
    )
    W = np.ascontiguousarray(H.T)
    X = W @ H
    return X, W, H
