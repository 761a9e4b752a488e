"""Branch-induced-sparsity factorization of kinematic-tree mass matrices.

TPU-native port of the spatial_v2 sparsity kit (SURVEY.md §2.4:
spatial_v2/sparsity/{LTL,LTDL,mpyL,mpyLt,mpyLi,mpyLit,expandLambda,mpyH}.m,
Featherstone RBDA ch. 6): the joint-space inertia matrix H of a kinematic
tree is only filled on ancestor pairs, so it factors as H = L' L (LTL) or
H = L' D L (LTDL) where L has the *same* tree sparsity — no fill-in, no
pivoting.

The tree structure (`lam`, the parent array) is static Python data, so the
ancestor loops below unroll at trace time into straight-line jnp ops: the
factorizations jit, vmap over batches of configurations, and differentiate.
For the 18-body mc3D tree each factorization is a few hundred fused scalar
ops — far cheaper than a dense Cholesky and exactly the reference's
algorithmic intent.

Convention: `lam[i]` is the parent index of variable i, -1 at roots
(multi-DoF joints are pre-expanded; see `expand_lambda`).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def expand_lambda(lam, nf):
    """Expand a per-joint parent array for multi-DoF joints
    (spatial_v2/sparsity/expandLambda.m).

    lam: (n,) parent indices (-1 root); nf: (n,) DoF counts per joint.
    Returns the (sum(nf),) expanded parent array over individual variables.
    """
    lam = np.asarray(lam, dtype=np.int64)
    nf = np.asarray(nf, dtype=np.int64)
    start = np.concatenate([[0], np.cumsum(nf)[:-1]])  # first var of joint i
    out = []
    for i in range(lam.shape[0]):
        for k in range(nf[i]):
            if k == 0:
                p = lam[i]
                out.append(start[p] + nf[p] - 1 if p >= 0 else -1)
            else:
                out.append(start[i] + k - 1)
    return np.asarray(out, dtype=np.int64)


def _ancestors(lam, k):
    """Static list of proper ancestors of k, innermost-first."""
    out = []
    i = int(lam[k])
    while i >= 0:
        out.append(i)
        i = int(lam[i])
    return out


def ltdl(H, lam):
    """Factor H = L' D L with unit-lower-triangular tree-sparse L
    (spatial_v2/sparsity/LTDL.m).  Returns (L, d) with d the diagonal of D.

    Outer-to-inner elimination: process variables from leaves (n-1) to
    roots; each column only touches the ancestor chain, so there is no
    fill-in outside the tree sparsity pattern.
    """
    n = H.shape[0]
    H = jnp.asarray(H)
    for k in range(n - 1, -1, -1):
        anc = _ancestors(lam, k)
        for i in anc:
            a = H[k, i] / H[k, k]
            # subtract a * (row k restricted to ancestors of i, incl. i)
            for j in [i] + _ancestors(lam, i):
                H = H.at[i, j].add(-a * H[k, j])
            H = H.at[k, i].set(a)
    d = jnp.diagonal(H)
    L = jnp.eye(n, dtype=H.dtype)
    for k in range(n):
        for i in _ancestors(lam, k):
            L = L.at[k, i].set(H[k, i])
    return L, d


def ltl(H, lam):
    """Factor H = L' L with tree-sparse lower-triangular L
    (spatial_v2/sparsity/LTL.m)."""
    L, d = ltdl(H, lam)
    s = jnp.sqrt(d)
    return L * s[:, None]


def mpy_l(L, lam, x):
    """y = L @ x exploiting tree sparsity (spatial_v2/sparsity/mpyL.m)."""
    n = L.shape[0]
    ys = []
    for k in range(n):
        y = L[k, k] * x[k]
        for i in _ancestors(lam, k):
            y = y + L[k, i] * x[i]
        ys.append(y)
    return jnp.stack(ys)

def mpy_lt(L, lam, x):
    """y = L' @ x exploiting tree sparsity (spatial_v2/sparsity/mpyLt.m)."""
    n = L.shape[0]
    y = [L[k, k] * x[k] for k in range(n)]
    for k in range(n):
        for i in _ancestors(lam, k):
            y[i] = y[i] + L[k, i] * x[k]
    return jnp.stack(y)


def solve_l(L, lam, b):
    """x = L^-1 b: forward substitution restricted to ancestor chains
    (spatial_v2/sparsity/mpyLi.m semantics).  Rows ascend; x[i] for every
    ancestor i < k is already known when row k is processed."""
    n = L.shape[0]
    x = list(b)
    for k in range(n):
        for i in _ancestors(lam, k):
            x[k] = x[k] - L[k, i] * x[i]
        x[k] = x[k] / L[k, k]
    return jnp.stack(x)


def solve_lt(L, lam, b):
    """x = L'^-1 b: back substitution along descendant chains
    (spatial_v2/sparsity/mpyLit.m semantics).  Column-oriented: once x[k]
    is fixed, its contribution is removed from every ancestor row."""
    n = L.shape[0]
    x = list(b)
    for k in range(n - 1, -1, -1):
        x[k] = x[k] / L[k, k]
        for i in _ancestors(lam, k):
            x[i] = x[i] - L[k, i] * x[k]
    return jnp.stack(x)


def solve_ltl(H_factor_L, lam, b):
    """Solve H x = b given L from `ltl` (H = L' L): L'(Lx)=b -> two sweeps."""
    return solve_l(H_factor_L, lam, solve_lt(H_factor_L, lam, b))


def mpy_h(L, d, lam, x):
    """y = H @ x from the LTDL factor without forming H
    (spatial_v2/sparsity/mpyH.m): y = L' (d * (L x))."""
    return mpy_lt(L, lam, d * mpy_l(L, lam, x))
