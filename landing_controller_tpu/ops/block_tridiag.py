"""Block-tridiagonal quasi-definite KKT factorization (Riccati-style sweep).

Solves K x = b where K is symmetric block-tridiagonal with NB uniform
blocks of size B = NP + ND:

    K = [[A_0, C_0',        ],
         [C_0, A_1, C_1',   ],
         [     C_1, A_2, ...]]

and every diagonal block is *quasi-definite*: its leading NP x NP part is
positive definite (primal variables + regularization) and its trailing
ND x ND part is negative definite (equality multipliers, -delta_c).  Quasi-
definiteness is closed under Schur complementation (Vanderbei 1995), so the
block LDL' sweep

    S_0 = A_0,   S_k = A_k - C_{k-1} S_{k-1}^{-1} C_{k-1}'

needs no pivoting: each S_k factors as two Cholesky factorizations
(P = Lp Lp', then Dtilde = D + B P^-1 B' = Ld Ld') whose failure doubles as
the inertia test that drives the solver's delta ladder.

This is the structural heart of the TPU solver: the sequential-in-time
sweep is a `lax.scan` over the horizon (the same recursion shape as the
reference's Riccati value-function sweep, quadruped_SRBM_NLP.m:495-513),
with all dense work in MXU-friendly B x B blocks, vmappable over scenarios.
Per-scenario cost is O(NB * B^3) instead of the dense O((NB*B)^3).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class QDFactor(NamedTuple):
    lp: jnp.ndarray  # (NB, NP, NP) Cholesky of the primal parts
    ld: jnp.ndarray  # (NB, ND, ND) Cholesky of the dual Schur parts
    bmat: jnp.ndarray  # (NB, ND, NP) the B sub-blocks of each S_k
    c: jnp.ndarray  # (NB-1, B, B) the off-diagonal blocks (as given)
    ok: jnp.ndarray  # scalar bool: all Cholesky factorizations finite


def _qd_factor_block(S, np_, nd):
    """Factor one quasi-definite block S = [[P, B'], [B, -D]]."""
    P = S[:np_, :np_]
    B = S[np_:, :np_]
    D = -S[np_:, np_:]
    lp = jnp.linalg.cholesky(P)
    pib = jax.scipy.linalg.cho_solve((lp, True), B.T)  # P^-1 B'
    dt = D + B @ pib
    ld = jnp.linalg.cholesky(dt)
    return lp, ld, B


def _qd_solve_block(lp, ld, B, r, np_, nd):
    """Solve [[P, B'],[B, -D]] [a; b] = [r1; r2] given the block factor.

    a0 = P^-1 r1;  b = -Dt^-1 (r2 - B a0);  a = P^-1 (r1 - B' b).
    Works for r of shape (B,) or (B, m).
    """
    vec = r.ndim == 1
    if vec:
        r = r[:, None]
    r1, r2 = r[:np_], r[np_:]
    a0 = jax.scipy.linalg.cho_solve((lp, True), r1)
    b = -jax.scipy.linalg.cho_solve((ld, True), r2 - B @ a0)
    a = jax.scipy.linalg.cho_solve((lp, True), r1 - B.T @ b)
    out = jnp.concatenate([a, b], axis=0)
    return out[:, 0] if vec else out


def qd_block_tridiag_factor(A, C, np_: int, nd: int) -> QDFactor:
    """Factor the block-tridiagonal quasi-definite system.

    A: (NB, B, B) diagonal blocks; C: (NB-1, B, B) sub-diagonal blocks
    (block (k+1, k)).  Returns a QDFactor whose `ok` flag is False if any
    block Cholesky produced non-finite values (wrong inertia -> caller
    bumps its regularization ladder).
    """
    nb, bs, _ = A.shape

    def scan_fn(Sprev_factor, inputs):
        Ak, Ck_prev = inputs
        lp_prev, ld_prev, B_prev = Sprev_factor
        # S_k = A_k - C_{k-1} S_{k-1}^-1 C_{k-1}'
        X = _qd_solve_block(lp_prev, ld_prev, B_prev, Ck_prev.T, np_, nd)  # S^-1 C'
        Sk = Ak - Ck_prev @ X
        fac = _qd_factor_block(Sk, np_, nd)
        return fac, fac

    fac0 = _qd_factor_block(A[0], np_, nd)
    _, facs = jax.lax.scan(scan_fn, fac0, (A[1:], C))
    lp = jnp.concatenate([fac0[0][None], facs[0]], axis=0)
    ld = jnp.concatenate([fac0[1][None], facs[1]], axis=0)
    bm = jnp.concatenate([fac0[2][None], facs[2]], axis=0)
    ok = jnp.all(jnp.isfinite(lp)) & jnp.all(jnp.isfinite(ld))
    return QDFactor(lp=lp, ld=ld, bmat=bm, c=C, ok=ok)


def qd_block_tridiag_solve(fac: QDFactor, b: jnp.ndarray, np_: int, nd: int) -> jnp.ndarray:
    """Solve K x = b given the factorization.  b: (NB, B) -> x: (NB, B)."""

    # forward sweep: e_k = b_k - C_{k-1} S_{k-1}^-1 e_{k-1}
    def fwd(carry, inputs):
        e_prev_solved, = carry
        bk, Ck_prev = inputs
        ek = bk - Ck_prev @ e_prev_solved
        return (None, ), ek

    # need S_k^-1 e_k inside the recursion; carry the solved vector
    def fwd2(e_prev_solved, inputs):
        bk, Ck_prev, lp, ld, bm = inputs
        ek = bk - Ck_prev @ e_prev_solved
        sk_inv_ek = _qd_solve_block(lp, ld, bm, ek, np_, nd)
        return sk_inv_ek, ek

    e0 = b[0]
    s0 = _qd_solve_block(fac.lp[0], fac.ld[0], fac.bmat[0], e0, np_, nd)
    _, es = jax.lax.scan(
        fwd2, s0, (b[1:], fac.c, fac.lp[1:], fac.ld[1:], fac.bmat[1:])
    )
    e = jnp.concatenate([e0[None], es], axis=0)

    # backward sweep: x_k = S_k^-1 (e_k - C_k' x_{k+1})
    def bwd(x_next, inputs):
        ek, Ck, lp, ld, bm = inputs
        xk = _qd_solve_block(lp, ld, bm, ek - Ck.T @ x_next, np_, nd)
        return xk, xk

    x_last = _qd_solve_block(fac.lp[-1], fac.ld[-1], fac.bmat[-1], e[-1], np_, nd)
    _, xs = jax.lax.scan(
        bwd,
        x_last,
        (e[:-1][::-1], fac.c[::-1], fac.lp[:-1][::-1], fac.ld[:-1][::-1], fac.bmat[:-1][::-1]),
    )
    return jnp.concatenate([xs[::-1], x_last[None]], axis=0)
