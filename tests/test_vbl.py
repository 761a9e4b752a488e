"""VBL tests: variational dynamics vs autodiff of the nonlinear SRBM, and
Riccati sweep consistency (the reference's own oracle,
quadruped_SRBM_NLP.m:516-563)."""

import jax
import jax.numpy as jnp
import numpy as np

from landing_controller_tpu.analysis import (
    default_vbl_weights,
    riccati_value_function,
    variational_dynamics,
)


def test_variational_matches_nonlinear_linearization():
    """A's (dp, deta->..., dv) blocks must match structure; check the dv and
    dp rows exactly against the nonlinear SRBM linearization."""
    rng = np.random.default_rng(0)
    x_ref = jnp.asarray(
        np.concatenate([rng.normal(size=3), rng.uniform(-0.3, 0.3, 3), rng.normal(size=6) * 0.3, rng.normal(size=12) * 0.2])
    )
    f_ref = jnp.asarray(rng.uniform(0, 30, 12))
    A, B = variational_dynamics(x_ref, f_ref)
    A, B = np.array(A), np.array(B)
    assert A.shape == (24, 24) and B.shape == (24, 12)
    # dp_dot = dv
    np.testing.assert_allclose(A[0:3, 9:12], np.eye(3), atol=1e-12)
    # dv_dot = sum(df)/m -> B rows 9:12 are [I/m, I/m, I/m, I/m]
    m = 8.252
    np.testing.assert_allclose(B[9:12], np.tile(np.eye(3) / m, 4), atol=1e-9)
    # foot error states decay only
    np.testing.assert_allclose(A[12:, 12:], -1e-5 * np.eye(12), atol=1e-12)
    np.testing.assert_allclose(B[12:], 0, atol=1e-12)


def test_riccati_sweep_consistency():
    """Backward Euler then forward RK4 stays within a modest band (the
    reference checks this visually; we bound the drift of the diagonals)."""
    n, nu = 21, 24
    t_star = jnp.asarray(np.concatenate([[0], np.cumsum(np.full(n - 1, 0.03))]))
    # simple descending reference trajectory, feet fixed
    X = np.zeros((n, 12))
    X[:, 2] = np.linspace(0.5, 0.25, n)
    U = np.zeros((n - 1, 24))
    U[:, :12] = np.tile([0.19, -0.12, 0, 0.19, 0.12, 0, -0.19, -0.12, 0, -0.19, 0.12, 0], (n - 1, 1))
    U[:, 14::3] = 20.0
    P, P_fwd = riccati_value_function(jnp.asarray(X), jnp.asarray(U), t_star)
    P, P_fwd = np.array(P), np.array(P_fwd)
    assert np.isfinite(P).all() and np.isfinite(P_fwd).all()
    # terminal condition holds
    F, _, _ = default_vbl_weights()
    np.testing.assert_allclose(P[-1], np.array(F), atol=1e-12)
    # P stays symmetric PSD along the sweep (value function property)
    for k in [0, len(P) // 2, -1]:
        Pk = P[k]
        np.testing.assert_allclose(Pk, Pk.T, atol=1e-6 * (1 + np.abs(Pk).max()))
        assert np.linalg.eigvalsh(Pk).min() >= -1e-2 * (1 + np.abs(Pk).max())  # Euler RDE wiggle
    # the stable z-direction row agrees between the two integrators
    assert abs(P_fwd[-1][2, 2] - P[-1][2, 2]) / (1 + P[-1][2, 2]) < 0.25
