"""Warm-start and replan flows (the RHC primitive, BASELINE config 4)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from landing_controller_tpu.models import get_robot_params
from landing_controller_tpu.problems import srbm_lcp_problem
from landing_controller_tpu.solver import IPConfig, solve
from landing_controller_tpu.solver.scaling import landing_z_scale, scale_problem
from landing_controller_tpu.warmstart import (
    initial_guess_from_reference,
    sample_drop_scenario,
    srbm_lcp_params,
)


@pytest.fixture(scope="module")
def cold_solution():
    params = get_robot_params("mc3D")
    prob = srbm_lcp_problem(params, n_knots=21)
    q0 = jnp.array([0, 0, 0.6, 0, np.pi / 4, -np.pi / 6], dtype=jnp.float32)
    qd0 = jnp.array([0, 4, 5, 1.3, -2, -2.0], dtype=jnp.float32)
    theta = srbm_lcp_params(q0, qd0)
    z0 = initial_guess_from_reference(prob, theta)
    snlp = scale_problem(
        lambda z: prob.cost(z, theta),
        lambda z: prob.eq(z, theta),
        lambda z: prob.ineq(z, theta),
        z0,
        z_scale=landing_z_scale(prob).astype(jnp.float32),
    )
    mask = prob.relax_mask().astype(jnp.float32)
    cfg = IPConfig(
        max_iter=250, hessian_mode="hybrid", mu_min=1e-5, tol=2e-4,
        sigma_max=1e5, refine_steps=2, relax_scale=1.0,
    )
    res = jax.jit(lambda z: solve(snlp.cost, snlp.eq, snlp.ineq, z, cfg, relax_mask=mask))(
        snlp.to_scaled(z0).astype(jnp.float32)
    )
    return prob, snlp, mask, res


@pytest.mark.slow
def test_cold_start_converges(cold_solution):
    _, _, _, res = cold_solution
    assert bool(res.converged)


@pytest.mark.slow
def test_primal_dual_warm_restart_is_immediate(cold_solution):
    """Re-solving at the solution with carried (z, s, lam, y) terminates in
    a couple of iterations without moving (the reference's prevSoln
    save/reload flow, landing_optimization.m:395-403)."""
    prob, snlp, mask, res = cold_solution
    cfg = IPConfig(
        max_iter=50, hessian_mode="hybrid", mu_init=1e-5, mu_min=1e-5,
        tol=2e-4, sigma_max=1e5, refine_steps=2, relax_scale=1.0,
    )
    res2 = jax.jit(
        lambda z, s, lam, y: solve(
            snlp.cost, snlp.eq, snlp.ineq, z, cfg, y0=y, lam0=lam, s0=s, relax_mask=mask
        )
    )(res.z, res.s, res.lam, res.y)
    assert bool(res2.converged)
    assert int(res2.iterations) <= 5
    assert float(jnp.abs(res2.z - res.z).max()) < 1e-3


def test_scenario_sampler_ranges():
    q0, qd0 = sample_drop_scenario(jax.random.PRNGKey(0))
    q0, qd0 = np.array(q0), np.array(qd0)
    assert abs(q0[3]) <= 0.25 and abs(q0[5]) <= 0.25
    assert abs(q0[4]) <= np.pi / 3
    assert q0[2] > 0.35  # hip-clearance rule adds height
    assert -5.0 <= qd0[5] <= -0.5
