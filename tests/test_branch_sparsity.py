"""Branch-induced sparsity factorizations vs dense oracles (SURVEY.md §2.4:
spatial_v2/sparsity/{LTL,LTDL,expandLambda,mpyH}.m)."""

import numpy as np
import jax.numpy as jnp

from landing_controller_tpu.models import get_robot_model
from landing_controller_tpu.dynamics import featherstone
from landing_controller_tpu.ops.branch_sparsity import (
    expand_lambda,
    ltdl,
    ltl,
    mpy_h,
    mpy_l,
    mpy_lt,
    solve_l,
    solve_lt,
    solve_ltl,
)


def _mass_matrix_and_lam():
    model = get_robot_model("mc3D")
    rng = np.random.default_rng(0)
    q = jnp.asarray(
        np.concatenate([[0.0, 0.0, 0.4, 0.05, 0.2, -0.1], rng.uniform(-0.6, 0.6, 12)])
    )
    H, _ = featherstone.mass_matrix(model, q)
    # variable-level parent array for the 18-DoF tree (one DoF per body)
    lam = np.asarray(model.parent, dtype=np.int64)
    return np.asarray(H, np.float64), lam


def test_ltdl_reconstructs_h():
    H, lam = _mass_matrix_and_lam()
    L, d = ltdl(jnp.asarray(H), lam)
    H_rec = np.asarray(L).T @ np.diag(np.asarray(d)) @ np.asarray(L)
    np.testing.assert_allclose(H_rec, H, rtol=1e-9, atol=1e-10)


def test_ltdl_respects_tree_sparsity():
    H, lam = _mass_matrix_and_lam()
    L, _ = ltdl(jnp.asarray(H), lam)
    L = np.asarray(L)
    n = L.shape[0]
    for k in range(n):
        anc = set()
        i = lam[k]
        while i >= 0:
            anc.add(i)
            i = lam[i]
        for j in range(n):
            if j != k and j not in anc:
                assert L[k, j] == 0.0, (k, j)


def test_ltl_and_solve():
    H, lam = _mass_matrix_and_lam()
    L = ltl(jnp.asarray(H), lam)
    np.testing.assert_allclose(np.asarray(L).T @ np.asarray(L), H, rtol=1e-9, atol=1e-10)
    rng = np.random.default_rng(1)
    b = rng.standard_normal(H.shape[0])
    x = solve_ltl(L, lam, jnp.asarray(b))
    np.testing.assert_allclose(np.asarray(x), np.linalg.solve(H, b), rtol=1e-7, atol=1e-9)


def test_triangular_ops():
    H, lam = _mass_matrix_and_lam()
    L = np.asarray(ltl(jnp.asarray(H), lam))
    rng = np.random.default_rng(2)
    x = rng.standard_normal(L.shape[0])
    np.testing.assert_allclose(np.asarray(mpy_l(jnp.asarray(L), lam, jnp.asarray(x))), L @ x, rtol=1e-9)
    np.testing.assert_allclose(np.asarray(mpy_lt(jnp.asarray(L), lam, jnp.asarray(x))), L.T @ x, rtol=1e-9)
    np.testing.assert_allclose(
        np.asarray(solve_l(jnp.asarray(L), lam, jnp.asarray(x))), np.linalg.solve(L, x), rtol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(solve_lt(jnp.asarray(L), lam, jnp.asarray(x))), np.linalg.solve(L.T, x), rtol=1e-7
    )


def test_mpy_h():
    H, lam = _mass_matrix_and_lam()
    L, d = ltdl(jnp.asarray(H), lam)
    rng = np.random.default_rng(3)
    x = rng.standard_normal(H.shape[0])
    np.testing.assert_allclose(np.asarray(mpy_h(L, d, lam, jnp.asarray(x))), H @ x, rtol=1e-8)


def test_expand_lambda():
    # two joints: a 3-DoF root joint and a 2-DoF child (expandLambda.m)
    lam = expand_lambda([-1, 0], [3, 2])
    np.testing.assert_array_equal(lam, [-1, 0, 1, 2, 3])
