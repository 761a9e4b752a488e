"""Contact-scheduled variant: convergence + structured-vs-dense agreement.

The scheduled NLP (quadruped_SRBM_NLP.m:29-186) pins feet to the ground by
equality while in stance and pinches flight-leg GRFs to a point
(0 <= fz <= cs*f_max with cs=0).  Two things are under test here:

1. the pinched rows are on the mu-proportional relaxation homotopy
   (problems/landing.py relax_mask, scheduled arm) — without it both
   multipliers of a pinched pair blow up (~mu/bound_relax) and the
   complementarity error deadlocks the barrier schedule (observed: kkt
   stuck at ~0.018, never converging);
2. the stage-structured KKT path covers the scheduled equality layout
   (ground-pin + no-slip rows as per-knot multiplier slots,
   solver/structured.py) and matches the dense path.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from landing_controller_tpu.api import LandingSolver

Q0 = jnp.array([0.0, 0.0, 0.26, 0.03, 0.1, -0.02], jnp.float32)
QD0 = jnp.array([0.1, -0.05, 0.0, 0.05, -0.05, -0.8], jnp.float32)


@pytest.mark.slow
def test_scheduled_converges_both_paths():
    sols = {}
    for structured in (False, True):
        s = LandingSolver("contact_scheduled", dtype=jnp.float32, structured=structured)
        sol = s.solve(Q0, QD0)
        assert bool(sol.converged), f"structured={structured} failed to converge"
        assert int(sol.iterations) < 60
        assert float(sol.constr_viol) < 1e-3
        sols[structured] = sol
    # same KKT point from both linear-algebra paths
    np.testing.assert_allclose(
        np.asarray(sols[True].X), np.asarray(sols[False].X), atol=2e-3
    )
    # flight legs (cs=0 at the first knots of the default schedule) carry
    # ~zero force once the homotopy relaxation has vanished
    fz_flight = np.asarray(sols[True].U)[:2, 14::3]
    assert np.abs(fz_flight).max() < 2e-3
