"""Envelope analytics parity vs the reference's committed sweep data.

`data/pitch_45_vX.mat` holds 13 CCC (N=41) solutions of foot_positions.m's
sweep (pitch 45 deg, v_x in -1.5:0.25:1.5, v_z = -3).  Two layers:

1. analysis parity — our touchdown_analysis on the *stored* solutions
   reproduces the reference's own touchdown indices exactly and yields the
   dot(v_hat, p_hat) heuristic ~1 (feet land along the velocity), matching
   the reference's reported behavior (foot_positions.m:56-75);
2. solve parity — our CCC solver on the same IC lands with touchdown foot
   positions (rel. hip, body frame) within 5 cm of the reference's and
   touchdown knots within 2, i.e. the envelope analytics built on our
   solver agree with the reference's committed data.
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from landing_controller_tpu.analysis.foot_positions import (
    analyze_solution,
    load_reference_sweep,
    touchdown_analysis,
)

SWEEP = "/root/reference/optimizations/landing/data/pitch_45_vX.mat"

needs_ref = pytest.mark.skipif(
    not os.path.exists(SWEEP), reason="reference checkout not available"
)


@needs_ref
def test_touchdown_analysis_matches_reference_indices():
    ref = load_reference_sweep(SWEEP)
    assert len(ref) == 13
    for sol in ref:
        ta = touchdown_analysis(sol["X"], sol["p"], sol["f"])
        np.testing.assert_array_equal(ta.td, sol["td"])
        # feet land roughly along the CoM velocity (the reference's
        # heuristic finding): alignment > 0.9 for every landed leg
        assert np.nanmin(ta.dot_v_p) > 0.8, ta.dot_v_p


@needs_ref
@pytest.mark.slow
def test_ccc_solve_reproduces_reference_touchdown_geometry():
    import jax

    from landing_controller_tpu.api import LandingSolver
    from landing_controller_tpu.solver import IPConfig

    ref = load_reference_sweep(SWEEP)
    s6 = ref[6]  # the v_x = 0 lane
    ta_ref = touchdown_analysis(s6["X"], s6["p"], s6["f"])

    q0 = jnp.asarray(s6["X"][:6, 0], jnp.float64)
    qd0 = jnp.asarray(s6["X"][6:, 0], jnp.float64)
    # f64 at the reference's tol 1e-4: the degenerate-LCP endgame creeps
    # (fraction-to-boundary-limited duals), so the budget is 400 iterations
    # (converges at 337, measured)
    solver = LandingSolver(
        "ccc",
        n_knots=41,  # the envelope problem size (generate_quadruped_SRBM_CCC.m:30)
        dtype=jnp.float64,
        structured=True,
        config=IPConfig(
            max_iter=400, hessian_mode="hybrid", relax_scale=1.0,
            kkt_backend="cri",
        ),
    )
    sol = solver.solve(q0, qd0)
    assert bool(sol.converged), (float(sol.kkt_error), float(sol.constr_viol))

    ta = analyze_solution(sol)
    assert np.abs(ta.td - ta_ref.td).max() <= 2, (ta.td, ta_ref.td)
    dp = np.abs(ta.p_hip - ta_ref.p_hip).max()
    assert dp <= 0.05, f"touchdown foot placement deviates {dp:.3f} m"
