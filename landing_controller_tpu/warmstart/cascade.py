"""Warm-start cascade: SRBM-LCP solve -> IK -> kinodynamic solve.

The reference's production flow (landing_optimization.m:300-322 and the
training-data factory, generate_training_data_automated.m:121-176) solves
the cheap SRBM-LCP problem first (compiled IPOPT artifact), then seeds the
kinodynamic KNITRO solve with its (X, U).  Here both stages are our IP
solver and the whole cascade is one jitted function; joint angles are
seeded by closed-form IK on the stage-1 foot positions (the reference
leaves jpos at its default initial value — IK is strictly better).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..dynamics.legs import inverse_kinematics, inverse_kinematics_newton
from ..problems.landing import LandingVars


def kinodynamic_guess_from_srbm(kino_problem, robot_params, X, U, jpos_clip=None):
    """Build the kinodynamic initial guess from a stage-1 (SRBM) solution.

    X: (N,12), U: (N-1,24).  jpos via closed-form IK (XYZ convention, the
    production FK convention) from the stage-1 foot positions, clipped into
    the joint-limit box.
    """

    def ik_knot(x, u):
        # closed-form IK + fsolve-analogue Newton polish (the reference's
        # numeric fallback, misc/inverse_kinematics.m; falls back to the
        # closed form for out-of-workspace stage-1 feet)
        jp = inverse_kinematics(robot_params, x[:6], u[:12], convention="xyz")
        return inverse_kinematics_newton(
            robot_params, x[:6], u[:12], jp, convention="xyz", iters=3
        )

    jpos = jax.vmap(ik_knot)(X[:-1], U)
    if jpos_clip is not None:
        jpos = jnp.clip(jpos, jpos_clip[0], jpos_clip[1])
    # Re-derive foot positions from the (clipped) joint angles so the guess
    # starts FK-consistent (the +-1 cm fk_band rows are equality-like; a
    # reachability gap there is much harder for the solver to close than the
    # soft contact-height/kin-box rows this may slightly perturb).
    from ..dynamics.legs import foot_positions_world

    def fk_knot(x, jp):
        return foot_positions_world(robot_params, x[:6], jp).reshape(12)

    c_fk = jax.vmap(fk_knot)(X[:-1], jpos)
    U = jnp.concatenate([c_fk, U[:, 12:]], axis=1)
    return kino_problem.pack(LandingVars(X=X, jpos=jpos, U=U))


def make_cascade(srbm_solver, kino_solver, warm_mu_init: float | None = None,
                 seed_mode: str = "x_grf"):
    """Compose two LandingSolvers into one jitted cascade solve.

    Returns ``fn(q_init, qd_init) -> (kino_solution, srbm_solution)``.

    Seed construction (round-5 ablation, tools/cascade_sweep.py, B=128
    over 2 factory batches — the fix for the srbm_ws < cold regression
    that persisted through rounds 2-4):

    - ``seed_mode="x_grf"`` (default): stage 2 takes the stage-1 BASE
      TRAJECTORY and GRF schedule but the ballistic guess's feet and home
      jpos.  Measured 0.680 vs cold 0.648 / full-seed 0.602.  The
      IK-consistent foot/jpos seeding ("full"/"x_feet") actively hurts:
      stage-1 foot placements sit ON the kinematic-box and FK-band
      boundaries, and an interior-point solve started at its constraint
      walls loses more than the warm primal gains (x_feet 0.648, full
      0.602).
    - ``seed_mode="full"``: the previous behavior (X + IK feet/jpos +
      GRFs), kept for comparison studies.

    ``warm_mu_init``: barrier restart for stage 2.  Default None = the
    solver's own cold ``mu_init`` (1e-1).  The round-2 conclusion that a
    REDUCED restart (1e-2) helps was wrong — the same ablation measured
    it as the dominant failure source (full@1e-2 0.219 vs full@1e-1
    0.602; every seed family loses 6-20pp at 1e-2): the seed is
    near-feasible but far from centered, and a small mu leaves no barrier
    room to re-center.  The reference's KNITRO ``strat_warm_start``
    analogue remains available by passing an explicit value.
    """
    kino_theta0 = kino_solver.build_params(
        jnp.zeros(6, srbm_solver.dtype), jnp.zeros(6, srbm_solver.dtype)
    )
    jl = (kino_theta0.jpos_min, kino_theta0.jpos_max)
    # time-grid alignment: the kinodynamic stage runs on the production
    # non-uniform dt schedule while srbm_lcp_params defaults to a uniform
    # grid — seeding knot k of one grid with knot k of the other lands the
    # contact/impulse pattern at the wrong times and DESTROYS the warm
    # start (measured: cascade convergence 0.29 vs 0.72 cold).  Rebuild
    # stage 1 with stage 2's dt (a runtime theta change; the reference's
    # cascade passes one dtVec to both compiled solvers,
    # landing_optimization.m:27-28/305-311).
    import numpy as _np

    n_srbm = srbm_solver.problem.config.n_knots
    n_kino = kino_solver.problem.config.n_knots
    if n_srbm != n_kino:
        raise ValueError(
            f"cascade stages must share n_knots (srbm={n_srbm}, kino={n_kino}); "
            "a dt override across mismatched grids would fail with an opaque "
            "trace-time shape error inside the problem build"
        )
    dt_kino = _np.asarray(kino_theta0.dt)
    srbm_dt = _np.asarray(
        srbm_solver.build_params(
            jnp.zeros(6, srbm_solver.dtype), jnp.zeros(6, srbm_solver.dtype)
        ).dt
    )
    if srbm_dt.shape != dt_kino.shape or not _np.allclose(srbm_dt, dt_kino):
        from ..api import LandingSolver

        srbm_solver = LandingSolver(
            srbm_solver.kind,
            n_knots=srbm_solver.problem.config.n_knots,
            robot=srbm_solver.robot,
            config=srbm_solver.config,
            dtype=srbm_solver.dtype,
            theta_overrides={**srbm_solver.theta_overrides, "dt": dt_kino},
            structured=srbm_solver.structured,
            guess=srbm_solver.guess,
        )
    stage2 = (
        kino_solver if warm_mu_init is None else kino_solver.warm_variant(warm_mu_init)
    )

    def cascade(q_init, qd_init):
        sol1 = srbm_solver._solve_impl(q_init, qd_init)
        if seed_mode == "x_grf":
            from ..warmstart.reference import ballistic_guess

            theta2 = stage2.build_params(q_init, qd_init)
            vb = stage2.problem.unpack(ballistic_guess(stage2.problem, theta2))
            U = jnp.concatenate([vb.U[:, :12], sol1.U[:, 12:]], axis=1)
            z0 = stage2.problem.pack(
                LandingVars(X=sol1.X, jpos=vb.jpos, U=U)
            )
        else:
            z0 = kinodynamic_guess_from_srbm(
                stage2.problem, stage2.robot_params, sol1.X, sol1.U, jl
            )
        sol2 = stage2._solve_impl(q_init, qd_init, z0=z0)
        return sol2, sol1

    return jax.jit(cascade)
