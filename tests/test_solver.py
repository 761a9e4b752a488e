"""Interior-point solver tests: toy NLPs, the landing solve, and batching."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from landing_controller_tpu.solver import IPConfig, solve


def _toy():
    cost = lambda z: (z[0] - 2.0) ** 2 + (z[1] - 1.0) ** 2
    eq = lambda z: jnp.array([z[0] + z[1] - 2.0])
    ineq = lambda z: jnp.array([z[0], z[1], 0.1 - z[0] * z[1]])
    return cost, eq, ineq


@pytest.mark.parametrize("mode", ["exact", "gn"])
def test_toy_complementarity(mode):
    """Equality + bilinear complementarity-style inequality (the LCP stress
    shape, SURVEY.md §7.3 hard-part #1)."""
    cost, eq, ineq = _toy()
    res = solve(cost, eq, ineq, jnp.array([0.5, 0.5]), IPConfig(max_iter=80, hessian_mode=mode))
    assert bool(res.converged)
    xs = (2 + np.sqrt(4 - 0.4)) / 2
    np.testing.assert_allclose(np.array(res.z), [xs, 2 - xs], atol=1e-3)


def test_simplex_qp():
    n = 10
    res = solve(
        lambda z: jnp.sum(z * z),
        lambda z: jnp.array([jnp.sum(z) - 1.0]),
        lambda z: z,
        jnp.full(n, 0.3),
        IPConfig(max_iter=60),
    )
    assert bool(res.converged)
    np.testing.assert_allclose(np.array(res.z), np.full(n, 0.1), atol=1e-4)


def test_infeasible_start():
    """Start violating the inequality; solver must recover."""
    cost, eq, ineq = _toy()
    res = solve(cost, eq, ineq, jnp.array([1.5, 0.5]), IPConfig(max_iter=80))
    assert bool(res.converged)


def test_batch_vmap_convergence():
    cost, eq, ineq = _toy()
    f = jax.jit(jax.vmap(lambda z0: solve(cost, eq, ineq, z0, IPConfig(max_iter=80)).converged))
    z0s = jnp.asarray(np.random.default_rng(0).uniform(0.2, 1.4, (8, 2)))
    assert np.array(f(z0s)).all()


def test_warm_start_fewer_iterations():
    cost, eq, ineq = _toy()
    cfg = IPConfig(max_iter=80)
    res = solve(cost, eq, ineq, jnp.array([0.5, 0.5]), cfg)
    cfg_ws = IPConfig(max_iter=80, mu_init=1e-4)
    res2 = solve(cost, eq, ineq, res.z, cfg_ws, lam0=res.lam, y0=res.y, s0=res.s)
    assert bool(res2.converged)
    assert int(res2.iterations) <= int(res.iterations)


@pytest.mark.slow
def test_srbm_lcp_landing_converges():
    """End-to-end config-1 style solve (BASELINE config 1) at f64 on CPU."""
    from landing_controller_tpu.models import get_robot_params
    from landing_controller_tpu.problems import srbm_lcp_problem
    from landing_controller_tpu.solver.scaling import landing_z_scale, scale_problem
    from landing_controller_tpu.warmstart import (
        initial_guess_from_reference,
        srbm_lcp_params,
    )

    params = get_robot_params("mc3D")
    prob = srbm_lcp_problem(params, n_knots=21)
    q0 = jnp.array([0, 0, 0.6, 0, np.pi / 4, -np.pi / 6], dtype=jnp.float64)
    qd0 = jnp.array([0, 4, 5, 1.3, -2, -2.0], dtype=jnp.float64)
    theta = srbm_lcp_params(q0, qd0)
    z0 = initial_guess_from_reference(prob, theta)
    snlp = scale_problem(
        lambda z: prob.cost(z, theta),
        lambda z: prob.eq(z, theta),
        lambda z: prob.ineq(z, theta),
        z0,
        z_scale=landing_z_scale(prob),
    )
    cfg = IPConfig(max_iter=250, hessian_mode="hybrid", relax_scale=1.0)
    res = jax.jit(
        lambda z: solve(
            snlp.cost, snlp.eq, snlp.ineq, z, cfg, relax_mask=prob.relax_mask()
        )
    )(snlp.to_scaled(z0))
    assert bool(res.converged), (float(res.kkt_error), float(res.constr_viol))
    z = snlp.from_scaled(res.z)
    v = prob.unpack(z)
    X, U = np.array(v.X), np.array(v.U)
    # physically meaningful landing: terminal box respected, settles upright
    assert 0.2 <= X[-1, 2] <= 0.5
    assert np.abs(X[-1, 3:5]).max() <= 0.1 + 1e-3
    fz = U[:, 14::3] if False else U[:, [14, 17, 20, 23]]
    assert fz.min() >= -1e-6  # non-negative normal forces
    # late-phase total normal force carries the weight (~mg within 40%)
    mg = 8.252 * 9.81
    late = U[-6:-1, [14, 17, 20, 23]].sum(axis=1)
    assert (np.abs(late - mg) / mg < 0.4).all()
    # LCP: no force while foot off the ground
    cz = U[:, [2, 5, 8, 11]]
    assert (np.array(fz) * np.array(cz) <= 2e-3).all()
