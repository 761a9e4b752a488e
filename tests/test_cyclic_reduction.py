"""Cyclic-reduction block-tridiagonal solver vs dense reference and vs the
sequential sweep (ops.block_tridiag)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from landing_controller_tpu.ops import qd_block_tridiag_factor, qd_block_tridiag_solve
from landing_controller_tpu.ops.cyclic_reduction import cr_factor, cr_solve


def _random_qd_system(nb=7, np_=6, nd=3, seed=0):
    rng = np.random.default_rng(seed)
    bs = np_ + nd
    A = np.zeros((nb, bs, bs))
    C = rng.normal(size=(nb - 1, bs, bs)) * 0.3
    for k in range(nb):
        M = rng.normal(size=(np_, np_))
        P = M @ M.T + 3.0 * np.eye(np_)
        B = rng.normal(size=(nd, np_))
        D = np.diag(rng.uniform(0.5, 2.0, nd))
        A[k, :np_, :np_] = P
        A[k, np_:, :np_] = B
        A[k, :np_, np_:] = B.T
        A[k, np_:, np_:] = -D
    K = np.zeros((nb * bs, nb * bs))
    for k in range(nb):
        K[k * bs : (k + 1) * bs, k * bs : (k + 1) * bs] = A[k]
    for k in range(nb - 1):
        K[(k + 1) * bs : (k + 2) * bs, k * bs : (k + 1) * bs] = C[k]
        K[k * bs : (k + 1) * bs, (k + 1) * bs : (k + 2) * bs] = C[k].T
    return jnp.asarray(A), jnp.asarray(C), K


@pytest.mark.parametrize("nb", [2, 3, 4, 5, 7, 8, 16, 21, 41])
def test_cr_matches_dense(nb):
    A, C, K = _random_qd_system(nb=nb, seed=nb)
    bs = A.shape[1]
    rng = np.random.default_rng(100 + nb)
    b = rng.normal(size=(nb, bs))
    fac = cr_factor(A, C, 6, 3)
    assert bool(fac.ok)
    x = np.asarray(cr_solve(fac, jnp.asarray(b), 6, 3))
    x_dense = np.linalg.solve(K, b.reshape(-1)).reshape(nb, bs)
    np.testing.assert_allclose(x, x_dense, rtol=1e-8, atol=1e-8)


def test_cr_matches_sweep():
    A, C, _ = _random_qd_system(nb=21, seed=5)
    bs = A.shape[1]
    b = jnp.asarray(np.random.default_rng(6).normal(size=(21, bs)))
    x_cr = cr_solve(cr_factor(A, C, 6, 3), b, 6, 3)
    x_sw = qd_block_tridiag_solve(qd_block_tridiag_factor(A, C, 6, 3), b, 6, 3)
    np.testing.assert_allclose(np.asarray(x_cr), np.asarray(x_sw), rtol=1e-9, atol=1e-9)


def test_cr_inertia_failure_detected():
    A, C, _ = _random_qd_system(seed=2)
    A = A.at[3, 0, 0].set(-50.0)
    fac = cr_factor(A, C, 6, 3)
    assert not bool(fac.ok)


def test_cr_vmapped_and_jitted():
    A, C, K = _random_qd_system(nb=21)
    nb, bs, _ = A.shape
    rng = np.random.default_rng(3)
    b = jnp.asarray(rng.normal(size=(4, nb, bs)))

    @jax.jit
    def run(bb):
        return jax.vmap(lambda r: cr_solve(cr_factor(A, C, 6, 3), r, 6, 3))(bb)

    xs = np.asarray(run(b))
    for i in range(4):
        x_dense = np.linalg.solve(K, np.asarray(b[i]).reshape(-1)).reshape(nb, bs)
        np.testing.assert_allclose(xs[i], x_dense, rtol=1e-7, atol=1e-7)
