"""Receding-horizon replanning — the 100 Hz warm-restart primitive
(BASELINE config 4).

The reference's replan flow saves (X*, U*, jpos*, lam_g*) and re-solves the
same horizon from a new measured state with warm initialization
(landing_optimization.m:395-435, KNITRO ``strat_warm_start``).  Here the
full primal-dual state (z, s, lam, y) carries between solves on-device:

- the previous solution is **re-anchored**: knot-0 state is replaced by the
  measured state (the equality row pins it anyway; re-anchoring just keeps
  the initial defect small so the warm solve stays in Newton's basin),
- slacks/multipliers are passed through (rescaled to the new solve's row
  scaling by the API), and
- the solve runs under a capped-iteration warm config — the iteration cap is
  the real-time watchdog (the reference's ``maxtime_real``/``maxit``,
  generate_landingCtrller_KNITRO.m:343-344).

The driver is two-tier, the standard MPC disturbance policy:

- **tracking replan** (`replan`): mu restarts near its floor
  (``mu_init=1e-4``) under a tight iteration cap — converges in ~11
  iterations for per-tick perturbations (measurement/model error at
  100 Hz: ~1 cm / 0.1 rad/s), the real-time path;
- **recovery replan** (`recover`): on non-convergence (a shove that moves
  the contact timing, e.g. 5 cm / 0.3 rad/s), the LCP active set shifts
  and the warm barrier state is stale — re-solve with the barrier/MPCC
  homotopy re-opened (``mu_init=1e-2``) under a larger cap.  This is the
  analogue of the reference falling back to its full KNITRO budget
  (maxit 500 / maxtime_real 4 s).

One `replan`/`recover` call is a single jitted program; per-replan latency
on TPU is measured by `analysis/replan_bench.py`.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, NamedTuple

import jax
import jax.numpy as jnp

from ..solver import IPConfig

if TYPE_CHECKING:  # api imports warmstart.reference; break the cycle at runtime
    from ..api import LandingSolution


class ReplanState(NamedTuple):
    """Primal-dual warm-start state carried between replans."""

    z: jnp.ndarray
    s: jnp.ndarray
    lam: jnp.ndarray
    y: jnp.ndarray


def warm_config(iter_cap: int = 30, dtype=jnp.float32, mu_init: float = 1e-4) -> IPConfig:
    """Capped-iteration warm-solve config (the 10 ms-budget analogue of the
    reference's maxit/maxtime_real watchdogs)."""
    f32 = dtype == jnp.float32
    return IPConfig(
        max_iter=iter_cap,
        mu_init=mu_init,
        mu_min=1e-5 if f32 else 1e-6,
        tol=2e-4 if f32 else 1e-4,
        sigma_max=1e5 if f32 else 1e8,
        refine_steps=2 if f32 else 1,
        relax_scale=1.0,
        delta_c=1e-6 if f32 else 1e-8,
        kkt_backend="cri",
        hessian_mode="hybrid",
    )


class Replanner:
    """Receding-horizon replanner over one LandingSolver.

    Usage::

        rp = Replanner("srbm_lcp", iter_cap=30)
        sol = rp.plan(q0, qd0)                 # full solve (cold/offline)
        st = ReplanState(sol.z, sol.s, sol.lam, sol.y)
        sol2 = rp.replan(st, q_meas, qd_meas)  # warm capped re-solve
    """

    def __init__(
        self,
        kind: str = "srbm_lcp",
        n_knots: int = 21,
        iter_cap: int = 30,
        recover_cap: int = 120,
        dtype=jnp.float32,
        robot: str = "mc3D",
        plan_config: IPConfig | None = None,
        **solver_kw,
    ):
        from ..api import LandingSolver

        self.dtype = dtype
        self.solver_warm = LandingSolver(
            kind, n_knots=n_knots, robot=robot, dtype=dtype,
            config=warm_config(iter_cap, dtype), **solver_kw,
        )
        # recovery tier: homotopy re-opened (mu_init=1e-2) so shifted LCP
        # active sets can re-form; larger cap (measured 82-96 iterations for
        # a 2.5-5 cm / 0.15-0.3 rad/s shove)
        self.solver_recover = LandingSolver(
            kind, n_knots=n_knots, robot=robot, dtype=dtype,
            config=warm_config(recover_cap, dtype, mu_init=1e-2), **solver_kw,
        )
        self.solver_plan = LandingSolver(
            kind, n_knots=n_knots, robot=robot, dtype=dtype,
            config=plan_config, **solver_kw,
        )

    def plan(self, q_init, qd_init) -> "LandingSolution":
        """Full-budget solve (the offline plan / first solve)."""
        return self.solver_plan.solve(q_init, qd_init)

    def replan(self, state: ReplanState, q_meas, qd_meas) -> "LandingSolution":
        """One warm, iteration-capped re-solve from a measured state.

        Re-anchors the carried primal to the measured state and passes the
        carried (s, lam, y) through; a single jitted program.
        """
        q_meas = jnp.asarray(q_meas, self.dtype)
        qd_meas = jnp.asarray(qd_meas, self.dtype)
        z0 = state.z.at[0:6].set(q_meas).at[6:12].set(qd_meas)
        return self.solver_warm.solve(
            q_meas, qd_meas, z0=z0, warm=(state.s, state.lam, state.y)
        )

    def recover(self, state: ReplanState, q_meas, qd_meas) -> "LandingSolution":
        """Recovery re-solve after a tracking replan fails to converge.

        Keeps the carried primal as the initial guess but re-opens the
        barrier/MPCC homotopy (stale duals are discarded — after an
        active-set shift they mislead more than they help; probed in round
        2: full-warm vs primal-only are equally stuck at mu_init=1e-4,
        while primal-only at mu_init=1e-2 re-converges)."""
        q_meas = jnp.asarray(q_meas, self.dtype)
        qd_meas = jnp.asarray(qd_meas, self.dtype)
        z0 = state.z.at[0:6].set(q_meas).at[6:12].set(qd_meas)
        return self.solver_recover.solve(q_meas, qd_meas, z0=z0)

    def step(self, state: ReplanState, q_meas, qd_meas):
        """One MPC tick: tracking replan, recovery on non-convergence.

        Returns (solution, new_state).  The convergence read is the one
        host sync per tick (the real-time loop needs the trajectory on the
        host anyway)."""
        sol = self.replan(state, q_meas, qd_meas)
        if not bool(sol.converged):
            sol = self.recover(state, q_meas, qd_meas)
        return sol, self.carry(sol)

    @staticmethod
    def carry(sol: "LandingSolution") -> ReplanState:
        return ReplanState(z=sol.z, s=sol.s, lam=sol.lam, y=sol.y)
