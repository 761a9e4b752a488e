"""Parity tests for the Pallas lane-batched block kernels and the
inverse-based cyclic-reduction KKT backend (ops.pallas_blocks, ops.cr_inverse).

Run on CPU via interpret mode; the same kernels compile natively on TPU.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from landing_controller_tpu.ops.pallas_blocks import (
    chol_inverse,
    make_qd_inverse,
    qd_inverse,
    qd_inverse_ref,
)
from landing_controller_tpu.ops.cr_inverse import cri_factor, cri_solve
from landing_controller_tpu.ops.block_tridiag import (
    qd_block_tridiag_factor,
    qd_block_tridiag_solve,
)


def _random_qd_blocks(rng, m, np_, nd, dtype=np.float32):
    """Random quasi-definite blocks [[P, B'], [B, -D]], equilibrated-ish."""
    bs = np_ + nd
    P = rng.standard_normal((m, np_, np_))
    P = P @ P.transpose(0, 2, 1) / np_ + np.eye(np_)[None] * 0.5
    D = rng.standard_normal((m, nd, nd))
    D = D @ D.transpose(0, 2, 1) / nd + np.eye(nd)[None] * 0.5
    B = 0.5 * rng.standard_normal((m, nd, np_))
    S = np.zeros((m, bs, bs))
    S[:, :np_, :np_] = P
    S[:, np_:, :np_] = B
    S[:, :np_, np_:] = B.transpose(0, 2, 1)
    S[:, np_:, np_:] = -D
    return jnp.asarray(S.astype(dtype))


def test_qd_inverse_ref_matches_dense_inverse():
    rng = np.random.default_rng(0)
    S = _random_qd_blocks(rng, 5, 7, 4, dtype=np.float64)
    Sinv, ok = qd_inverse_ref(S, 7, 4)
    assert bool(jnp.all(ok))
    np.testing.assert_allclose(
        np.array(Sinv), np.linalg.inv(np.array(S)), rtol=1e-9, atol=1e-9
    )


def test_pallas_qd_inverse_interpret_matches_ref():
    rng = np.random.default_rng(1)
    S = _random_qd_blocks(rng, 9, 12, 8, dtype=np.float32)  # pads to 128 lanes
    Sinv_p, ok_p = qd_inverse(S, 12, 8, interpret=True)
    Sinv_r, ok_r = qd_inverse_ref(S, 12, 8)
    assert bool(jnp.all(ok_p)) and bool(jnp.all(ok_r))
    np.testing.assert_allclose(np.array(Sinv_p), np.array(Sinv_r), rtol=2e-4, atol=2e-4)


def test_pallas_qd_inverse_flags_indefinite_blocks():
    rng = np.random.default_rng(2)
    S = _random_qd_blocks(rng, 4, 6, 3, dtype=np.float32)
    # make block 2's P indefinite
    S = S.at[2, 0, 0].set(-5.0)
    _, ok = qd_inverse(S, 6, 3, interpret=True)
    assert not bool(ok[2])
    assert bool(ok[0]) and bool(ok[1]) and bool(ok[3])


def test_pallas_chol_inverse_interpret():
    rng = np.random.default_rng(3)
    A = rng.standard_normal((6, 10, 10))
    A = (A @ A.transpose(0, 2, 1) / 10 + np.eye(10)[None]).astype(np.float32)
    A = jnp.asarray(A)
    Ainv, ok = chol_inverse(A, interpret=True)
    assert bool(jnp.all(ok))
    np.testing.assert_allclose(np.array(Ainv), np.linalg.inv(np.array(A)), rtol=2e-4, atol=2e-4)


def test_make_qd_inverse_vmap_folds_to_batch():
    rng = np.random.default_rng(4)
    B, m, np_, nd = 3, 4, 5, 3
    S = _random_qd_blocks(rng, B * m, np_, nd, dtype=np.float32).reshape(
        B, m, np_ + nd, np_ + nd
    )
    fn = make_qd_inverse(np_, nd, force="ref")
    out_v, ok_v = jax.vmap(fn)(S)
    out_d, ok_d = fn(S.reshape(B * m, np_ + nd, np_ + nd))
    np.testing.assert_allclose(
        np.array(out_v).reshape(B * m, np_ + nd, np_ + nd), np.array(out_d), rtol=1e-5
    )
    assert bool(jnp.all(ok_v)) == bool(jnp.all(ok_d))


@pytest.mark.parametrize("nb", [1, 2, 5, 21])
def test_cri_solve_matches_scan_backend(nb):
    rng = np.random.default_rng(5)
    np_, nd = 6, 4
    bs = np_ + nd
    A = np.array(_random_qd_blocks(rng, nb, np_, nd, dtype=np.float64))
    # symmetrize + diagonal dominance for a well-posed tridiag system
    C = 0.1 * rng.standard_normal((max(nb - 1, 0), bs, bs))
    b = rng.standard_normal((nb, bs))
    A_j, C_j, b_j = jnp.asarray(A), jnp.asarray(C), jnp.asarray(b)

    fn = make_qd_inverse(np_, nd, force="ref")
    fac = cri_factor(A_j, C_j, fn)
    assert bool(fac.ok)
    x_cri = cri_solve(fac, b_j)

    fac2 = qd_block_tridiag_factor(A_j, C_j, np_, nd)
    x_scan = qd_block_tridiag_solve(fac2, b_j, np_, nd)
    np.testing.assert_allclose(np.array(x_cri), np.array(x_scan), rtol=1e-8, atol=1e-8)

    # and against the dense solve
    K = np.zeros((nb * bs, nb * bs))
    for k in range(nb):
        K[k * bs : (k + 1) * bs, k * bs : (k + 1) * bs] = A[k]
    for k in range(nb - 1):
        K[(k + 1) * bs : (k + 2) * bs, k * bs : (k + 1) * bs] = C[k]
        K[k * bs : (k + 1) * bs, (k + 1) * bs : (k + 2) * bs] = C[k].T
    x_dense = np.linalg.solve(K, b.reshape(-1)).reshape(nb, bs)
    np.testing.assert_allclose(np.array(x_cri), x_dense, rtol=1e-7, atol=1e-7)


def test_cri_backend_one_step_matches_scan_backend():
    """One Newton step of the srbm_lcp solve with kkt_backend='cri_ref'
    matches the scan backend at f64 (both solve the same KKT system; at f32
    the two algorithms round differently on the ill-conditioned KKT, so
    exact parity is a double-precision property)."""
    from landing_controller_tpu.api import LandingSolver
    from landing_controller_tpu.solver import IPConfig

    q0 = jnp.asarray([0.0, 0.0, 0.6, 0.05, 0.3, -0.05], jnp.float64)
    qd0 = jnp.asarray([0.1, -0.2, 0.1, 0.2, -0.1, -2.0], jnp.float64)
    kw = dict(max_iter=1, hessian_mode="hybrid", mu_min=1e-6, tol=1e-4,
              sigma_max=1e8, refine_steps=1, relax_scale=1.0, delta_c=1e-8)
    sol_scan = LandingSolver(
        "srbm_lcp", n_knots=13, dtype=jnp.float64, structured=True,
        config=IPConfig(kkt_backend="scan", **kw),
    ).solve(q0, qd0)
    sol_cri = LandingSolver(
        "srbm_lcp", n_knots=13, dtype=jnp.float64, structured=True,
        config=IPConfig(kkt_backend="cri_ref", **kw),
    ).solve(q0, qd0)
    scale = np.maximum(1.0, np.abs(np.array(sol_scan.z)))
    np.testing.assert_allclose(
        np.array(sol_cri.z) / scale, np.array(sol_scan.z) / scale, rtol=0, atol=1e-10
    )


def test_cri_backend_converges_end_to_end():
    """Full srbm_lcp cold-start solve on the cri backend converges."""
    from landing_controller_tpu.api import LandingSolver
    from landing_controller_tpu.solver import IPConfig

    q0 = jnp.asarray([0.0, 0.0, 0.45, 0.0, 0.0, 0.0], jnp.float32)
    qd0 = jnp.asarray([0.0, 0.0, 0.0, 0.0, 0.0, -0.5], jnp.float32)
    sol = LandingSolver(
        "srbm_lcp", n_knots=13, dtype=jnp.float32, structured=True,
        config=IPConfig(
            max_iter=120, hessian_mode="hybrid", mu_min=1e-5, tol=2e-4,
            sigma_max=1e5, refine_steps=2, relax_scale=1.0, delta_c=1e-6,
            kkt_backend="cri_ref",
        ),
    ).solve(q0, qd0)
    assert bool(sol.converged)
    assert float(sol.constr_viol) <= 1e-3
