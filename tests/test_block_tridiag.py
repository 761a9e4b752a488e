"""Block-tridiagonal quasi-definite solver vs dense reference."""

import jax
import jax.numpy as jnp
import numpy as np

from landing_controller_tpu.ops import qd_block_tridiag_factor, qd_block_tridiag_solve


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
    # dense assembly
    K = np.zeros((nb * bs, nb * bs))
    for k in range(nb):
        K[k * bs : (k + 1) * bs, k * bs : (k + 1) * bs] = A[k]
    for k in range(nb - 1):
        K[(k + 1) * bs : (k + 2) * bs, k * bs : (k + 1) * bs] = C[k]
        K[k * bs : (k + 1) * bs, (k + 1) * bs : (k + 2) * bs] = C[k].T
    return jnp.asarray(A), jnp.asarray(C), K


def test_factor_solve_matches_dense():
    A, C, K = _random_qd_system()
    nb, bs, _ = A.shape
    rng = np.random.default_rng(1)
    b = rng.normal(size=(nb, bs))
    fac = qd_block_tridiag_factor(A, C, 6, 3)
    assert bool(fac.ok)
    x = np.asarray(qd_block_tridiag_solve(fac, jnp.asarray(b), 6, 3))
    x_dense = np.linalg.solve(K, b.reshape(-1)).reshape(nb, bs)
    np.testing.assert_allclose(x, x_dense, rtol=1e-8, atol=1e-8)


def test_inertia_failure_detected():
    """A diagonal block with wrong inertia (indefinite primal part) must
    flip the ok flag instead of returning garbage."""
    A, C, _ = _random_qd_system(seed=2)
    A = A.at[3, 0, 0].set(-50.0)  # break PD-ness of one primal block
    fac = qd_block_tridiag_factor(A, C, 6, 3)
    assert not bool(fac.ok)


def test_vmapped_over_batch():
    A, C, K = _random_qd_system()
    nb, bs, _ = A.shape
    rng = np.random.default_rng(3)
    b = jnp.asarray(rng.normal(size=(4, nb, bs)))
    f = jax.vmap(lambda bb: qd_block_tridiag_solve(qd_block_tridiag_factor(A, C, 6, 3), bb, 6, 3))
    xs = np.asarray(f(b))
    for i in range(4):
        x_dense = np.linalg.solve(K, np.asarray(b[i]).reshape(-1)).reshape(nb, bs)
        np.testing.assert_allclose(xs[i], x_dense, rtol=1e-7, atol=1e-7)
