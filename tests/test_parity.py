"""Solver-output parity against the reference's committed solutions.

`main_scripts/prevSoln.mat` is a KNITRO solution of the production
kinodynamic NLP (saved at landing_optimization.m:395).  Three layers of
parity are tested:

1. transcription parity — the golden is feasible in our stacks at float
   precision (tests/test_golden.py, 4.4e-7);
2. dynamics parity on a second, independent solution
   (test_scripts/1.5msDrop30Pitch.mat, a research-variant run:
   test_finalOptimization.m uses uniform dt, a 0.10 m kin box with no
   y-asymmetry rows and 0.8*tau_max — so only its dynamics defects are
   checked against our production transcription);
3. warm re-solve parity — re-solving from the golden primal (the
   reference's own prevSoln reload flow, landing_optimization.m:395-435)
   stays on the optimal manifold.

Why not exact 1e-3 solved-torque parity: the production NLP's optimum is
**degenerate** — the terminal cost is ~0 at the solution (a pure
feasibility manifold; QN has zero weight on x/y/yaw), and in multi-leg
stance the GRF distribution for a given net wrench has a per-knot null
space.  Any independent interior-point method converges to a different
point of that manifold (ours drifts ~1.8 N*m in torque while *improving*
the cost and keeping violations < 1e-5).  The well-posed solved-quantity
parities asserted here are: feasibility, cost, foothold placement (which
IS nearly unique), torque-limit satisfaction, and a bounded torque
deviation.
"""

import dataclasses
import os

import jax.numpy as jnp
import numpy as np
import pytest

REF = "/root/reference/optimizations/landing"
GOLDEN = f"{REF}/main_scripts/prevSoln.mat"
GOLDEN2 = f"{REF}/test_scripts/1.5msDrop30Pitch.mat"

needs_ref = pytest.mark.skipif(
    not os.path.exists(GOLDEN), reason="reference checkout not available"
)


def _load(path):
    import scipy.io as sio

    d = sio.loadmat(path)
    return d["X_star"].T, d["U_star"].T, d["jpos_star"].T  # (21,12),(20,24),(20,12)


@needs_ref
def test_second_golden_dynamics_parity():
    """The research-variant solution satisfies our SRBM dynamics defects
    with its uniform dt grid (validates dynamics + XYZ rotation convention
    on an independent trajectory)."""
    from landing_controller_tpu.models import get_robot_params
    from landing_controller_tpu.problems import kinodynamic_problem
    from landing_controller_tpu.problems.landing import LandingVars
    from landing_controller_tpu.warmstart import kinodynamic_params

    X, U, JP = _load(GOLDEN2)
    prob = kinodynamic_problem(get_robot_params("mc3D"), n_knots=21)
    q0 = jnp.asarray(X[0, :6])
    qd0 = jnp.asarray(X[0, 6:])
    theta = dataclasses.replace(
        kinodynamic_params(q0, qd0),
        c_init=jnp.asarray(U[0, :12]),
        dt=jnp.full(20, 0.6 / 20, jnp.float64),  # test_finalOptimization.m:27-29
    )
    z = prob.pack(LandingVars(X=jnp.asarray(X), jpos=jnp.asarray(JP), U=jnp.asarray(U)))
    E = np.asarray(prob.eq(z, theta))
    # rows: [x0 (12); c0 (12); dynamics defects (12*(N-1))]
    assert np.abs(E).max() < 5e-5, np.abs(E).max()


@needs_ref
@pytest.mark.slow
def test_warm_resolve_stays_on_optimal_manifold():
    """Warm re-solve from the golden primal (f64): feasibility at 1e-5,
    cost no worse than the golden, near-identical footholds, torques within
    limits and within a bounded deviation of the golden's."""
    from landing_controller_tpu.api import LandingSolver
    from landing_controller_tpu.dynamics.legs import leg_torques
    from landing_controller_tpu.models import get_robot_params
    from landing_controller_tpu.problems.landing import LandingVars
    from landing_controller_tpu.solver import IPConfig

    X, U, JP = _load(GOLDEN)
    rp = get_robot_params("mc3D")
    tau_ref = np.stack(
        [
            np.asarray(leg_torques(rp, jnp.asarray(JP[k]), jnp.asarray(X[k, 3:6]), jnp.asarray(U[k, 12:])))
            for k in range(20)
        ]
    )
    solver = LandingSolver(
        "kinodynamic", n_knots=21, dtype=jnp.float64, structured=True,
        theta_overrides={"c_init": U[0, :12]},
        config=IPConfig(
            max_iter=80, hessian_mode="hybrid", mu_init=1e-5, mu_min=1e-6,
            tol=1e-4, refine_steps=1, relax_scale=1.0, delta_c=1e-8,
            kkt_backend="cri_ref",
        ),
    )
    prob = solver.problem
    z0 = prob.pack(LandingVars(X=jnp.asarray(X), jpos=jnp.asarray(JP), U=jnp.asarray(U)))
    q0 = jnp.asarray(X[0, :6])
    qd0 = jnp.asarray(X[0, 6:])
    sol = solver.solve(q0, qd0, z0=z0)

    viol = float(sol.constr_viol)
    assert viol <= 1e-5, f"re-solve infeasible: viol={viol:.2e}"
    golden_cost = float(prob.cost(z0, solver.build_params(q0, qd0)))
    assert float(sol.cost) <= golden_cost + 1e-6, (float(sol.cost), golden_cost)

    dfeet = np.abs(np.asarray(sol.U)[:, :12] - U[:, :12]).max()
    assert dfeet <= 0.02, f"foothold drift {dfeet:.4f} m"

    tau = np.asarray(sol.tau)
    lim = np.tile([18.0, 18.0, 28.0], 4)
    assert (np.abs(tau) <= lim + 1e-6).all(), "torque limits violated"
    dtau = np.abs(tau - tau_ref).max()
    # bounded deviation along the degenerate GRF-distribution manifold
    # (measured ~1.8 N*m; exact 1e-3 parity is ill-posed — see module doc)
    assert dtau <= 5.0, f"torque deviation {dtau:.3f} N*m"
