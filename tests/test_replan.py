"""Receding-horizon replan driver (BASELINE config 4).

The reference's flow: save (X*, U*, jpos*, lam_g*), perturb/measure a new
state, warm re-solve under real-time caps (landing_optimization.m:395-435,
KNITRO maxit/maxtime_real watchdogs).  Here: full primal-dual carry +
re-anchor + capped-iteration warm solve, all on-device.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from landing_controller_tpu.warmstart import Replanner


@pytest.fixture(scope="module")
def planned():
    rp = Replanner("srbm_lcp", n_knots=21, iter_cap=30, dtype=jnp.float32)
    q0 = jnp.asarray([0.0, 0.0, 0.65, 0.05, 0.3, -0.05], jnp.float32)
    qd0 = jnp.asarray([0.1, -0.2, 0.1, 0.2, -0.1, -2.0], jnp.float32)
    sol = rp.plan(q0, qd0)
    return rp, q0, qd0, sol


@pytest.mark.slow
def test_plan_converges(planned):
    _, _, _, sol = planned
    assert bool(sol.converged)


@pytest.mark.slow
def test_replan_under_perturbation_within_cap(planned):
    """Per-tick perturbation (1 cm height / 0.01 rad attitude / 0.06 rad/s
    rates — the 100 Hz measurement/model-error scale): the warm capped
    re-solve converges well within the iteration cap (measured: 11)."""
    rp, q0, qd0, sol = planned
    st = Replanner.carry(sol)
    dq = 0.2 * jnp.asarray([0.0, 0.0, 0.05, 0.05, -0.05, 0.02], jnp.float32)
    dqd = 0.2 * jnp.asarray([0.3, -0.3, 0.1, 0.05, -0.05, 0.1], jnp.float32)
    sol2 = rp.replan(st, q0 + dq, qd0 + dqd)
    assert bool(sol2.converged), (
        f"replan failed: kkt={float(sol2.kkt_error):.2e} "
        f"viol={float(sol2.constr_viol):.2e}"
    )
    assert int(sol2.iterations) <= 30


@pytest.mark.slow
def test_recovery_after_shove(planned):
    """A shove that moves contact timing (5 cm / 0.05 rad / 0.3 rad/s):
    the tracking replan is allowed to fail; the recovery tier (homotopy
    re-opened) converges within its cap — the two-tier `step` policy."""
    rp, q0, qd0, sol = planned
    st = Replanner.carry(sol)
    dq = jnp.asarray([0.0, 0.0, 0.05, 0.05, -0.05, 0.02], jnp.float32)
    dqd = jnp.asarray([0.3, -0.3, 0.1, 0.05, -0.05, 0.1], jnp.float32)
    sol2, st2 = rp.step(st, q0 + dq, qd0 + dqd)
    assert bool(sol2.converged), (
        f"recovery failed: kkt={float(sol2.kkt_error):.2e} "
        f"viol={float(sol2.constr_viol):.2e}"
    )


@pytest.mark.slow
def test_replan_chain_stays_converged(planned):
    """Three successive replans with fresh perturbations keep converging
    (state carry does not degrade)."""
    rp, q0, qd0, sol = planned
    key = jax.random.PRNGKey(3)
    st = Replanner.carry(sol)
    q, qd = q0, qd0
    for i in range(3):
        key, k1, k2 = jax.random.split(key, 3)
        q = q + 0.02 * jax.random.normal(k1, (6,), jnp.float32)
        qd = qd + 0.1 * jax.random.normal(k2, (6,), jnp.float32)
        sol = rp.replan(st, q, qd)
        assert bool(sol.converged), f"replan {i} failed"
        st = Replanner.carry(sol)
