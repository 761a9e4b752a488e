"""Pallas TPU kernels for batched small-block KKT linear algebra.

The IP solver's hot loop factors and solves block-tridiagonal quasi-definite
KKT systems whose blocks are tiny (36-84) next to the TPU's native tile
(8x128 VPU, 128x128 MXU).  XLA's batched Cholesky / triangular-solve on such
shapes lowers to long latency-bound op chains; this module instead puts the
*batch* dimension on the TPU lanes and unrolls the factorization over the
(static, small) block dimension, so every elementary step is a full-width
VPU op over 128 scenarios at once:

- ``chol_inverse``: batched PD inverse via lane-vectorized right-looking
  Cholesky + forward substitution + L^-T L^-1, with the positive-pivot test
  returned per instance (the solver's inertia signal).
- ``qd_inverse``: batched inverse of a quasi-definite KKT block
  S = [[P, B'], [B, -D]] (P > 0, D > 0) via the two-Cholesky Schur scheme
  (Vanderbei 1995) fused into one kernel.

With explicit block inverses, every downstream sweep op (Schur updates,
forward/backward substitution) becomes a *batched matmul* that XLA maps
straight onto the MXU — the TPU-native replacement for the per-block
``cho_solve`` chains.  This is the Pallas mandate of BASELINE.json ("KKT
block factorization via Riccati-style sweeps ... on-chip"); the reference's
counterpart is the IPOPT/KNITRO native sparse KKT factorization
(quadruped_SRBM_NLP.m:253-292 option block).

All kernels are f32 with the batch padded to LANE=128; the block dimension
is a compile-time constant (static shapes, SURVEY.md §7.3).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128

# The unrolled two-Cholesky scheme keeps ~5-6 (BS, BS, LANE) temporaries
# live; at BS=84 (kinodynamic blocks) that is ~20 MB — above Mosaic's
# default 16 MB scoped-vmem limit (v5e has 128 MB VMEM).  Raise the
# kernel's limit so the big-block variants compile; small blocks are
# unaffected.
_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def _lane_matmul(Amat, Bmat, nk: int, transpose_b: bool = False):
    """Lane-batched matmul: (i,k,L),(k,j,L)->(i,j,L) via rank-1 accumulation.

    With transpose_b, B is (j,k,L) and we contract over its second axis.
    Unrolled over the (static, small) contraction dim; each step is one
    full-width VPU fma on an (i,j,LANE) tile.
    """
    ni = Amat.shape[0]
    nj = Bmat.shape[0] if transpose_b else Bmat.shape[1]
    acc = jnp.zeros((ni, nj, Amat.shape[2]), Amat.dtype)
    for k in range(nk):
        a_k = Amat[:, k, :]  # (i, L)
        b_k = Bmat[:, k, :] if transpose_b else Bmat[k, :, :]  # (j, L)
        acc = acc + a_k[:, None, :] * b_k[None, :, :]
    return acc


def _lane_chol_inverse(A, n: int):
    """Lane-batched PD inverse of (n, n, LANE); returns (Ainv, min_pivot).

    Right-looking Cholesky (n rank-1 downdates), forward substitution for
    L^-1 (n rank-1 updates), then Ainv = L^-T L^-1 (n rank-1 accumulations).
    min_pivot <= 0 signals an indefinite block (the inertia test).
    """
    dtype = A.dtype
    lanes = A.shape[2]
    # in-kernel row-index plane (captured numpy constants and scatter-style
    # .at[].set updates are not Mosaic-lowerable; columns/rows are collected
    # in Python lists and stacked instead)
    rows = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
    M = A
    cols = []
    min_piv = jnp.full((lanes,), jnp.inf, dtype)
    for j in range(n):
        dj = M[j, j, :]
        min_piv = jnp.minimum(min_piv, dj)
        inv_sq = jax.lax.rsqrt(jnp.maximum(dj, jnp.asarray(1e-30, dtype)))
        col = M[:, j, :] * inv_sq[None, :]
        col = jnp.where(rows >= j, col, 0.0)
        cols.append(col)
        M = M - col[:, None, :] * col[None, :, :]
    L = jnp.stack(cols, axis=1)  # (n, n, lanes)
    # X = L^-1 by right-looking forward substitution; `acc` carries the
    # running corrections -sum_{k<i} L[i,k] x_k for the not-yet-final rows
    acc = jnp.zeros_like(A)
    x_rows = []
    for i in range(n):
        ei = (rows == i).astype(dtype)  # (n, 1) unit column
        xi = (ei + acc[i]) / L[i, i, :][None, :]
        x_rows.append(xi)
        li = jnp.where(rows > i, L[:, i, :], 0.0)  # (n, lanes)
        acc = acc - li[:, None, :] * xi[None, :, :]
    X = jnp.stack(x_rows, axis=0)  # (n, n, lanes)
    # Ainv = X' X: contraction over the FIRST axis, Ainv[i,j] = sum_k X[k,i] X[k,j]
    out = jnp.zeros_like(A)
    for k in range(n):
        xk = X[k]  # (n, lanes)
        out = out + xk[:, None, :] * xk[None, :, :]
    return out, min_piv


def _qd_inverse_kernel(S_ref, out_ref, ok_ref, *, np_: int, nd: int):
    S = S_ref[:]  # (BS, BS, LANE)
    dtype = S.dtype
    P = S[:np_, :np_, :]
    Bm = S[np_:, :np_, :]  # (nd, np, L)
    D = -S[np_:, np_:, :]
    Pinv, piv_p = _lane_chol_inverse(P, np_)
    # E = Pinv @ B' : (np, nd, L); contraction over np (B given as (nd,np,L))
    E = _lane_matmul(Pinv, Bm, nk=np_, transpose_b=True)
    # Dt = D + B @ E : (nd, nd, L)
    Dt = D + _lane_matmul(Bm, E, nk=np_)
    W, piv_d = _lane_chol_inverse(Dt, nd)
    # EW = E @ W : (np, nd, L)
    EW = _lane_matmul(E, W, nk=nd)
    # TL = Pinv - EW @ E' : contraction over nd with E as (np, nd, L)
    TL = Pinv - _lane_matmul(EW, E, nk=nd, transpose_b=True)
    # WE' = (EW)' : (nd, np, L) — W symmetric
    WEt = _lane_matmul(W, E, nk=nd, transpose_b=True)
    top = jnp.concatenate([TL, EW], axis=1)
    bot = jnp.concatenate([WEt, -W], axis=1)
    out_ref[:] = jnp.concatenate([top, bot], axis=0)
    okv = jnp.minimum(piv_p, piv_d)
    okv = jnp.where(jnp.isfinite(okv), okv, -1.0)
    ok_ref[:] = okv[None, :]


def _chol_inverse_kernel(A_ref, out_ref, ok_ref, *, n: int):
    Ainv, piv = _lane_chol_inverse(A_ref[:], n)
    out_ref[:] = Ainv
    piv = jnp.where(jnp.isfinite(piv), piv, -1.0)
    ok_ref[:] = piv[None, :]


def _pad_to_lanes(x, m):
    m_pad = -(-m // LANE) * LANE
    if m_pad != m:
        x = jnp.concatenate(
            [x, jnp.zeros(x.shape[:-1] + (m_pad - m,), x.dtype)], axis=-1
        )
    return x, m_pad


@functools.partial(jax.jit, static_argnames=("np_", "nd", "interpret"))
def qd_inverse(S, np_: int, nd: int, interpret: bool = False):
    """Batched quasi-definite block inverse.

    S: (m, BS, BS) with BS = np_ + nd, each block [[P, B'], [B, -D]] with
    P (np_ x np_) positive definite and D (nd x nd) positive definite.
    Returns (Sinv (m, BS, BS), ok (m,) bool) where ok[i] is the
    positive-pivot inertia test for instance i.
    """
    m, bs, _ = S.shape
    assert bs == np_ + nd
    dtype = S.dtype
    St = jnp.transpose(S, (1, 2, 0))  # (BS, BS, m) — batch to lanes
    St, m_pad = _pad_to_lanes(St, m)
    # padded lanes hold all-zero blocks: give them identity P/D so the
    # factorization stays finite (their ok flag is dropped below)
    if m_pad != m:
        eye = jnp.eye(bs, dtype=dtype)
        lane_is_pad = (jnp.arange(m_pad) >= m)[None, None, :]
        sign = jnp.concatenate(
            [jnp.ones(np_, dtype), -jnp.ones(nd, dtype)]
        )
        St = jnp.where(lane_is_pad, (eye * sign[None, :])[:, :, None], St)
    grid = (m_pad // LANE,)
    out, ok = pl.pallas_call(
        functools.partial(_qd_inverse_kernel, np_=np_, nd=nd),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bs, bs, LANE), lambda i: (0, 0, i), memory_space=pltpu.VMEM)
        ],
        out_specs=[
            pl.BlockSpec((bs, bs, LANE), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LANE), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bs, bs, m_pad), dtype),
            jax.ShapeDtypeStruct((1, m_pad), dtype),
        ],
        interpret=interpret,
        compiler_params=_COMPILER_PARAMS,
    )(St)
    Sinv = jnp.transpose(out[:, :, :m], (2, 0, 1))
    return Sinv, ok[0, :m] > 0.0


def qd_inverse_ref(S, np_: int, nd: int):
    """jnp reference for qd_inverse (CPU fallback + parity oracle).

    Same two-Cholesky Schur scheme:
      Sinv = [[Pinv - E W E', E W], [W E', -W]],
      E = Pinv B', W = (D + B E)^-1.
    """
    P = S[:, :np_, :np_]
    Bm = S[:, np_:, :np_]
    D = -S[:, np_:, np_:]
    lp = jnp.linalg.cholesky(P)
    E = jax.scipy.linalg.cho_solve((lp, True), jnp.swapaxes(Bm, 1, 2))
    Dt = D + Bm @ E
    ld = jnp.linalg.cholesky(Dt)
    eye_d = jnp.broadcast_to(jnp.eye(nd, dtype=S.dtype), Dt.shape)
    W = jax.scipy.linalg.cho_solve((ld, True), eye_d)
    W = 0.5 * (W + jnp.swapaxes(W, 1, 2))
    eye_p = jnp.broadcast_to(jnp.eye(np_, dtype=S.dtype), P.shape)
    Pinv = jax.scipy.linalg.cho_solve((lp, True), eye_p)
    EW = E @ W
    TL = Pinv - EW @ jnp.swapaxes(E, 1, 2)
    Sinv = jnp.concatenate(
        [
            jnp.concatenate([TL, EW], axis=2),
            jnp.concatenate([jnp.swapaxes(EW, 1, 2), -W], axis=2),
        ],
        axis=1,
    )
    ok = jnp.all(jnp.isfinite(lp), axis=(1, 2)) & jnp.all(
        jnp.isfinite(ld), axis=(1, 2)
    )
    return Sinv, ok


def _qd_inverse_dispatch(S, np_: int, nd: int):
    if jax.default_backend() == "tpu":
        return qd_inverse(S, np_, nd)
    return qd_inverse_ref(S, np_, nd)


def make_qd_inverse(np_: int, nd: int, force: str | None = None):
    """Build a batched QD-block-inverse fn (m, BS, BS) -> (Sinv, ok) whose
    vmap rule folds mapped axes into the batch (lane) dimension.

    force: None (auto: pallas on TPU, jnp elsewhere), "pallas", "pallas_interpret",
    or "ref".
    """

    @jax.custom_batching.custom_vmap
    def fn(S):
        if force == "pallas":
            return qd_inverse(S, np_, nd)
        if force == "pallas_interpret":
            return qd_inverse(S, np_, nd, interpret=True)
        if force == "ref":
            return qd_inverse_ref(S, np_, nd)
        return _qd_inverse_dispatch(S, np_, nd)

    @fn.def_vmap
    def _rule(axis_size, in_batched, S):
        (s_batched,) = in_batched
        if not s_batched:
            S = jnp.broadcast_to(S[None], (axis_size,) + S.shape)
        m = S.shape[1]
        Sinv, ok = fn(S.reshape((axis_size * m,) + S.shape[2:]))
        return (
            (Sinv.reshape((axis_size, m) + Sinv.shape[1:]), ok.reshape(axis_size, m)),
            (True, True),
        )

    return fn


@functools.partial(jax.jit, static_argnames=("interpret",))
def chol_inverse(A, interpret: bool = False):
    """Batched PD inverse: A (m, n, n) -> (Ainv (m, n, n), ok (m,) bool)."""
    m, n, _ = A.shape
    dtype = A.dtype
    At = jnp.transpose(A, (1, 2, 0))
    At, m_pad = _pad_to_lanes(At, m)
    if m_pad != m:
        lane_is_pad = (jnp.arange(m_pad) >= m)[None, None, :]
        At = jnp.where(lane_is_pad, jnp.eye(n, dtype=dtype)[:, :, None], At)
    grid = (m_pad // LANE,)
    out, ok = pl.pallas_call(
        functools.partial(_chol_inverse_kernel, n=n),
        grid=grid,
        in_specs=[
            pl.BlockSpec((n, n, LANE), lambda i: (0, 0, i), memory_space=pltpu.VMEM)
        ],
        out_specs=[
            pl.BlockSpec((n, n, LANE), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LANE), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, n, m_pad), dtype),
            jax.ShapeDtypeStruct((1, m_pad), dtype),
        ],
        interpret=interpret,
        compiler_params=_COMPILER_PARAMS,
    )(At)
    Ainv = jnp.transpose(out[:, :, :m], (2, 0, 1))
    return Ainv, ok[0, :m] > 0.0
