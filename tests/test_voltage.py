"""Motor-voltage-limit variant (test_finalOptimization_voltageLimits.m:178-187).

The back-EMF voltage rows |i R_m + jvel gr kt 2| <= V_batt bound the motor
terminal voltage using the same model plot_results.m:23-38 plots.  The
reference disabled these rows in production; the variant exists for
capability parity and runs on the dense KKT path (the rows couple adjacent
knots' joint angles).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from landing_controller_tpu.api import LandingSolver

Q0 = jnp.array([0.0, 0.0, 0.55, 0.05, 0.2, -0.02], jnp.float32)
QD0 = jnp.array([0.1, -0.05, 0.0, 0.05, -0.05, -1.0], jnp.float32)


@pytest.mark.slow
def test_voltage_variant_converges_and_bounds_voltage():
    s = LandingSolver("kinodynamic_voltage", dtype=jnp.float32)
    assert not s.structured  # dense-path variant
    sol = s.solve(Q0, QD0)
    assert bool(sol.converged)
    assert float(sol.constr_viol) < 1e-3

    prob, theta = s.problem, s.build_params(Q0, QD0)
    g = np.asarray(prob.ineq(jnp.asarray(sol.z), theta))
    labels = prob.ineq_row_labels()
    assert len(labels) == g.shape[0] == prob.n_ineq
    volt = np.array([gv for gv, lab in zip(g, labels) if ":volt[" in lab])
    n = prob.config.n_knots
    assert volt.size == 24 * (n - 2)
    # every converged voltage row satisfied: |v| <= 24 V
    assert volt.min() > -1e-3


def test_voltage_rows_match_plot_model():
    """The constraint rows and the diagnostic plot voltage model agree."""
    from landing_controller_tpu.problems.landing import kinodynamic_voltage_problem
    from landing_controller_tpu.models import get_robot_params
    from landing_controller_tpu.warmstart.reference import (
        initial_guess_from_reference, kinodynamic_params,
    )

    rp = get_robot_params("mc3D")
    prob = kinodynamic_voltage_problem(rp, n_knots=21)
    theta = kinodynamic_params(Q0.astype(jnp.float64), QD0.astype(jnp.float64))
    z = initial_guess_from_reference(prob, theta)
    g = np.asarray(prob.ineq(z, theta))
    labels = prob.ineq_row_labels()
    volt_rows = np.array([gv for gv, lab in zip(g, labels) if ":volt[" in lab])
    v_batt = rp.battery_v
    # rows are [V - v; v + V]: recover v from the first half of each pair
    v_from_rows = v_batt - volt_rows.reshape(-1, 24)[:, :12]
    # home-pose guess has zero GRFs and constant jpos -> v == 0
    np.testing.assert_allclose(v_from_rows, 0.0, atol=1e-6)
