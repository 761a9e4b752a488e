"""Sliding-contact variant: the kinetic-friction complementarity rows
(main_scripts/landing_optimization_sliding.m:150-165) actually solve and
actually bind.

The scenario is engineered to force slip: a fast tangential drop
(vx = 2 m/s) on low-friction ground (mu = 0.3) — the friction-limited
stopping impulse cannot absorb the tangential momentum, so loaded feet
must skid.  The sliding variant must converge AND its solution must show
feet translating while loaded, with the tangential friction force
saturated against the pyramid limit on the loaded sliding knots and
opposing the slip direction (kinetic friction).

Convergence contract: the sliding complementarity rows are quartic in
(f, dc) and degenerate at the solution; the measured f32 scaled-KKT
floor for this family is ~2-5e-3 (feasibility still polishes to ~1e-6
over a 6-scenario probe grid — round-5 tools history).  The family
therefore runs at tol 5e-3 with the standard 1e-3 feasibility contract,
like the documented eeParam f32 floor (api.EEParamSolver).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from landing_controller_tpu.api import LandingSolver
from landing_controller_tpu.solver import IPConfig

Q0 = jnp.array([0.0, 0.0, 0.55, 0.0, 0.1, 0.0], jnp.float32)
QD0 = jnp.array([0.0, 0.0, 0.0, 2.0, 0.0, -2.2], jnp.float32)
MU = 0.3


@pytest.fixture(scope="module")
def sliding_sol():
    s = LandingSolver(
        "sliding",
        n_knots=15,
        dtype=jnp.float32,
        structured=True,
        guess="ballistic",
        theta_overrides={"mu": np.float32(MU)},
        config=IPConfig(
            max_iter=400,
            hessian_mode="hybrid",
            mu_init=0.3,
            kappa_mu=0.5,
            mu_min=1e-5,
            tol=5e-3,
            sigma_max=1e5,
            refine_steps=1,
            relax_scale=1.0,
            delta_c=1e-6,
            kkt_backend="cri",
            mu_strategy="loqo",
            stall_window=60,
            stall_min_iter=80,
            corrector=1,
        ),
    )
    sol = s.solve(Q0, QD0)
    return s, sol


def test_sliding_converges_feasible(sliding_sol):
    s, sol = sliding_sol
    assert bool(sol.converged), (
        f"sliding solve failed: kkt={float(sol.kkt_error):.2e} "
        f"viol={float(sol.constr_viol):.2e}"
    )
    assert float(sol.constr_viol) < 1e-3
    theta = s.build_params(Q0, QD0)
    E = s.problem.eq(sol.z, theta)
    g = s.problem.ineq(sol.z, theta)
    assert float(jnp.max(jnp.abs(E))) < 1e-3
    assert float(jnp.max(jnp.maximum(-g, 0.0))) < 1e-3


def test_sliding_rows_bind(sliding_sol):
    """Feet slip while loaded, and slipping feet ride the friction limit."""
    _, sol = sliding_sol
    U = np.asarray(sol.U)
    c = U[:, :12].reshape(-1, 4, 3)
    f = U[:, 12:].reshape(-1, 4, 3)
    # well-loaded knots only: the eps=1e-3 relaxation deliberately leaves
    # barely-loaded feet (fz ~ 1 N) slack in the complementarity
    loaded = f[:-1, :, 2] > 5.0
    slip = np.abs(c[1:, :, 0] - c[:-1, :, 0])  # x-translation to knot k+1
    sliding = loaded & (slip > 1e-3)
    assert sliding.any(), "no loaded foot ever slides in the sliding solution"
    # on sliding knots the tangential force must saturate the pyramid
    # limit |f_x| ~= 0.71 mu f_z (the kinetic complementarity allows slip
    # ONLY at saturation — problems/landing.py sliding block)
    lim = 0.71 * MU * f[:-1, :, 2]
    sat_gap = np.abs(np.abs(f[:-1, :, 0]) - lim) / np.maximum(lim, 1e-6)
    assert float(sat_gap[sliding].max()) < 0.05, (
        f"sliding foot not at friction saturation: gap={sat_gap[sliding].max():.3f}"
    )
    # and the friction force must oppose the slip direction
    assert np.all(
        np.sign(f[:-1, :, 0][sliding]) == -np.sign((c[1:, :, 0] - c[:-1, :, 0])[sliding])
    )
