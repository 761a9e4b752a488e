"""Block cyclic reduction for quasi-definite block-tridiagonal KKT systems.

Same system as ops.block_tridiag (symmetric block-tridiagonal K with
quasi-definite diagonal blocks: leading NP x NP positive definite, trailing
ND x ND negative definite), but solved by parallel-in-time cyclic reduction
instead of the sequential Schur sweep:

    level l: eliminate the odd-indexed blocks (all at once, batched);
             the even blocks + new Schur couplings form level l+1.

Quasi-definiteness is closed under Schur complementation with this sign
partition (Vanderbei 1995), so every level factors pivot-free with the same
two-Cholesky scheme, and a failed Cholesky is again the inertia signal.

Why this exists: the sweep in ops.block_tridiag is a `lax.scan` of NB ~ 21
sequential small-block steps per KKT solve — on TPU each step is a
latency-bound batched 36x36 Cholesky, so the solver is dispatch/latency
limited, not FLOP limited.  Cyclic reduction trades ~2x the FLOPs for
ceil(log2(NB)) ~ 5 levels of *batched* factor/update ops (each level's odd
blocks are processed together, fusing with any outer scenario vmap into
(B * n_odd) batched Cholesky/matmul calls) — the parallel-prefix analogue
of the reference's sequential Riccati recursion
(quadruped_SRBM_NLP.m:495-513).

Levels are unrolled statically in Python (NB is a compile-time constant),
so the factor object is a plain pytree and everything jits/vmaps.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp


class _Level(NamedTuple):
    lp: jnp.ndarray  # (n_odd, NP, NP) primal Cholesky of odd blocks
    ld: jnp.ndarray  # (n_odd, ND, ND) dual-Schur Cholesky of odd blocks
    bm: jnp.ndarray  # (n_odd, ND, NP) B sub-blocks of odd blocks
    X: jnp.ndarray  # (n_odd, BS, BS)  A_odd^{-1} C_left
    Y: jnp.ndarray  # (n_odd, BS, BS)  A_odd^{-1} C_right^T (zero-padded)


class CRFactor(NamedTuple):
    levels: Any  # tuple[_Level, ...]
    root_lp: jnp.ndarray
    root_ld: jnp.ndarray
    root_bm: jnp.ndarray
    ok: jnp.ndarray  # scalar bool: every Cholesky finite (inertia signal)


def _factor_blocks(A, np_, nd):
    """Batched quasi-definite factor of (m, BS, BS) blocks."""
    P = A[:, :np_, :np_]
    B = A[:, np_:, :np_]
    D = -A[:, np_:, np_:]
    lp = jnp.linalg.cholesky(P)
    pib = jax.scipy.linalg.cho_solve((lp, True), jnp.swapaxes(B, 1, 2))
    ld = jnp.linalg.cholesky(D + B @ pib)
    return lp, ld, B


def _solve_blocks(lp, ld, B, r, np_, nd):
    """Batched solve of [[P,B'],[B,-D]] x = r;  r: (m, BS) or (m, BS, k)."""
    vec = r.ndim == 2
    if vec:
        r = r[..., None]
    r1, r2 = r[:, :np_], r[:, np_:]
    a0 = jax.scipy.linalg.cho_solve((lp, True), r1)
    b = -jax.scipy.linalg.cho_solve((ld, True), r2 - B @ a0)
    a = jax.scipy.linalg.cho_solve((lp, True), r1 - jnp.swapaxes(B, 1, 2) @ b)
    out = jnp.concatenate([a, b], axis=1)
    return out[..., 0] if vec else out


def cr_factor(A, C, np_: int, nd: int) -> CRFactor:
    """Factor K (A: (NB, BS, BS) diagonals, C: (NB-1, BS, BS) sub-diagonals,
    block (k+1, k)) by block cyclic reduction.  Returns a CRFactor whose
    `ok` is False if any Cholesky produced non-finite values."""
    nb, bs, _ = A.shape
    dtype = A.dtype
    levels = []
    ok = jnp.asarray(True)
    zero_blk = jnp.zeros((1, bs, bs), dtype)

    m = nb
    while m > 1:
        n_odd = m // 2
        n_even = (m + 1) // 2
        # pad C so every odd block has a "right" coupling slot (zero if absent)
        C_pad = jnp.concatenate([C, zero_blk], axis=0) if C.shape[0] < m else C
        A_odd = A[1::2]  # (n_odd, BS, BS), odd indices 1,3,..
        C_left = C_pad[0::2][:n_odd]  # C_{j-1} for j odd: indices 0,2,..
        C_right = C_pad[1::2][:n_odd]  # C_j for j odd: indices 1,3,..

        lp, ld, bm = _factor_blocks(A_odd, np_, nd)
        ok = ok & jnp.all(jnp.isfinite(lp)) & jnp.all(jnp.isfinite(ld))

        rhs = jnp.concatenate([C_left, jnp.swapaxes(C_right, 1, 2)], axis=2)
        G = _solve_blocks(lp, ld, bm, rhs, np_, nd)  # (n_odd, BS, 2 BS)
        X, Y = G[:, :, :bs], G[:, :, bs:]

        levels.append(_Level(lp=lp, ld=ld, bm=bm, X=X, Y=Y))

        # even blocks, updated by both odd neighbours
        A_even = A[0::2]
        # odd block j=2i+1 updates its right (even) neighbour j+1 only when
        # that block exists: n_right = #odd blocks with a right neighbour
        n_right = min(n_odd, n_even - 1)
        upd = jnp.zeros_like(A_even)
        # right odd neighbour 2i+1 exists for i < n_odd: -C_{2i}' A^{-1} C_{2i}
        upd = upd.at[:n_odd].add(jnp.swapaxes(C_left, 1, 2) @ X)
        # left odd neighbour 2i-1 exists for i >= 1: -C_{2i-1} A^{-1} C_{2i-1}'
        upd = upd.at[1 : 1 + n_right].add((C_right @ Y)[:n_right])
        A = A_even - upd

        # new couplings between even blocks (2i) and (2i+2): -C_{2i+1} X_i,
        # valid where block 2i+2 exists, i.e. i < n_even - 1
        C = -(C_right @ X)[: n_even - 1]
        m = n_even

    root_lp, root_ld, root_bm = _factor_blocks(A[:1], np_, nd)
    ok = ok & jnp.all(jnp.isfinite(root_lp)) & jnp.all(jnp.isfinite(root_ld))
    return CRFactor(
        levels=tuple(levels),
        root_lp=root_lp,
        root_ld=root_ld,
        root_bm=root_bm,
        ok=ok,
    )


def cr_solve(fac: CRFactor, b: jnp.ndarray, np_: int, nd: int) -> jnp.ndarray:
    """Solve K x = b given a CRFactor.  b: (NB, BS) -> x: (NB, BS)."""
    # forward reduction: restrict the rhs level by level, caching A_odd^{-1} b_odd
    bs = b.shape[1]
    stack = []  # (s_odd, m) per level
    for lev in fac.levels:
        m = b.shape[0]
        n_odd = m // 2
        n_even = (m + 1) // 2
        n_right = min(n_odd, n_even - 1)
        b_odd = b[1::2]
        s_odd = _solve_blocks(lev.lp, lev.ld, lev.bm, b_odd, np_, nd)
        b_even = b[0::2]
        upd = jnp.zeros_like(b_even)
        # b'_{j-1} -= C_{j-1}' A_j^{-1} b_j = X' b_j   (A_j symmetric)
        upd = upd.at[:n_odd].add(jnp.einsum("kij,ki->kj", lev.X, b_odd))
        # b'_{j+1} -= C_j A_j^{-1} b_j = Y' b_j
        upd = upd.at[1 : 1 + n_right].add(
            jnp.einsum("kij,ki->kj", lev.Y[:n_right], b_odd[:n_right])
        )
        stack.append((s_odd, m))
        b = b_even - upd

    x = _solve_blocks(fac.root_lp, fac.root_ld, fac.root_bm, b, np_, nd)

    # backward expansion: x_odd = s_odd - X x_left - Y x_right
    for lev, (s_odd, m) in zip(reversed(fac.levels), reversed(stack)):
        n_odd = m // 2
        n_even = (m + 1) // 2
        x_even = x  # (n_even, BS)
        x_left = x_even[:n_odd]
        # right even neighbour of odd j=2i+1 is even index i+1 (zero if absent)
        x_right_full = jnp.concatenate(
            [x_even[1:], jnp.zeros((1, bs), x.dtype)], axis=0
        )[:n_odd]
        x_odd = (
            s_odd
            - jnp.einsum("kij,kj->ki", lev.X, x_left)
            - jnp.einsum("kij,kj->ki", lev.Y, x_right_full)
        )
        x = jnp.zeros((m, bs), x.dtype)
        x = x.at[0::2].set(x_even)
        x = x.at[1::2].set(x_odd)
    return x
