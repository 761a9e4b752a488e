"""High-level solve API — the analogue of the reference's compiled
``landingCtrller_*.casadi`` artifacts (SURVEY.md §2.1 L4).

A :class:`LandingSolver` wraps (problem transcription, scaling, IP solver)
into one jitted, vmappable function of the scenario: the "artifact" is the
XLA executable produced on first call (the reference's gcc-compiled .so
becomes the XLA compile cache — SURVEY.md §7.1).

Example::

    solver = LandingSolver("srbm_lcp")
    sol = solver.solve(q_init, qd_init)          # one scenario
    sols = solver.solve_batch(q_inits, qd_inits) # vmapped scenario batch
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .models import get_robot_params
from .problems.landing import (
    LandingProblem,
    ccc_problem,
    contact_scheduled_problem,
    kinodynamic_problem,
    kinodynamic_voltage_problem,
    sliding_problem,
    srbm_lcp_problem,
)
from .solver import IPConfig, solve
from .solver.scaling import landing_z_scale, scale_problem
from .warmstart.reference import (
    ballistic_guess,
    ccc_params,
    contact_scheduled_params,
    initial_guess_from_reference,
    kinodynamic_params,
    srbm_lcp_params,
)


class LandingSolution(NamedTuple):
    X: jnp.ndarray  # (N, 12) base trajectory
    jpos: jnp.ndarray  # (N-1, 12) joint angles (empty for srbm_lcp)
    U: jnp.ndarray  # (N-1, 24) foot positions + GRFs
    tau: jnp.ndarray  # (N-1, 12) Jacobian-transpose joint torques
    z: jnp.ndarray  # flat solution (reference layout)
    converged: jnp.ndarray
    iterations: jnp.ndarray
    kkt_error: jnp.ndarray
    constr_viol: jnp.ndarray
    cost: jnp.ndarray
    # full warm-start state (unscaled; the reference persists lam_g_star
    # alongside the primals, landing_optimization.m:395): inequality slacks,
    # inequality multipliers, equality multipliers
    s: jnp.ndarray
    lam: jnp.ndarray
    y: jnp.ndarray


_PROBLEMS = {
    "kinodynamic": (kinodynamic_problem, kinodynamic_params),
    "kinodynamic_voltage": (kinodynamic_voltage_problem, kinodynamic_params),
    "srbm_lcp": (srbm_lcp_problem, srbm_lcp_params),
    "ccc": (ccc_problem, ccc_params),
    "contact_scheduled": (contact_scheduled_problem, contact_scheduled_params),
    "sliding": (sliding_problem, srbm_lcp_params),
    # "eeparam" (free contact timing) has a different decision layout
    # (spline coefficients + phase durations, not knot states) and is
    # served by :class:`EEParamSolver` below
}


class LandingSolver:
    """Jit-compiled landing trajectory optimizer for one problem family."""

    def __init__(
        self,
        kind: str = "kinodynamic",
        n_knots: int = 21,
        robot: str = "mc3D",
        config: IPConfig | None = None,
        dtype=jnp.float32,
        theta_overrides: dict | None = None,
        structured: bool = True,
        guess: str = "reference",
        retry_guess: str | None = None,
    ):
        if kind not in _PROBLEMS:
            raise KeyError(f"unknown problem kind '{kind}'; available: {sorted(_PROBLEMS)}")
        # retry_guess: the alternate cold-guess family (or comma/tuple
        # chain of families) the streaming driver's variant flag selects
        # for failed-scenario retries — variant k uses chain[k-1].
        # Default: the "other" classic family (ballistic <-> reference).
        if isinstance(retry_guess, str):
            retry_chain = tuple(retry_guess.split(","))
        else:
            retry_chain = tuple(retry_guess or ())
        for g in (guess,) + retry_chain:
            if g not in ("reference", "ballistic", "nn"):
                raise KeyError(f"unknown guess '{g}' (reference | ballistic | nn)")
        self.kind = kind
        self.robot = robot
        self.guess = guess
        self.retry_guess = retry_chain or None
        self.dtype = dtype
        self.theta_overrides = dict(theta_overrides or {})
        # voltage rows couple adjacent knots' jpos — dense path only
        self.structured = structured and kind != "kinodynamic_voltage"
        self.robot_params = get_robot_params(robot)
        problem_fn, params_fn = _PROBLEMS[kind]
        self.problem: LandingProblem = problem_fn(self.robot_params, n_knots=n_knots)
        self._params_fn = params_fn
        if config is None:
            # f32 defaults trade the last decade of mu for conditioning room;
            # the scheduled variant's redundant equality rows need a larger
            # dual regularization
            config = IPConfig(
                max_iter=250,
                hessian_mode="hybrid",
                mu_min=1e-5 if dtype == jnp.float32 else 1e-6,
                sigma_max=1e5 if dtype == jnp.float32 else 1e8,
                tol=2e-4 if dtype == jnp.float32 else 1e-4,
                relax_scale=1.0,
                # the structured sweep needs the larger dual regularization
                # (+refinement) for f32 stability; scheduled needs it for its
                # redundant equality rows
                delta_c=1e-6 if (self.structured or kind == "contact_scheduled") else 1e-8,
                refine_steps=(
                    3 if (self.structured and dtype == jnp.float32)
                    else (2 if dtype == jnp.float32 else 1)
                ),
            )
        self.config = config
        self._z_scale = landing_z_scale(self.problem)
        self._nn = None
        if guess == "nn" or "nn" in retry_chain:
            # learned warm start as the attempt-1 "cold" guess — the
            # reference's production architecture (nn_warmstart.m:130-218:
            # MLP 9 -> 976 trajectory seed, then solve).  Weights+stats are
            # the committed artifact from tools/train_warmstart.py.
            import os

            from .warmstart.nn import N_KNOTS, load_warmstart

            if n_knots != N_KNOTS:
                raise ValueError(
                    f"nn guess predicts the production N={N_KNOTS} grid, "
                    f"got n_knots={n_knots}"
                )
            path = os.environ.get(
                "LANDING_CTRL_NN",
                os.path.join(os.path.dirname(__file__), "data", "nn_TO_landing.npz"),
            )
            self._nn = load_warmstart(path, dtype=dtype)
        self._solve_one = jax.jit(self._solve_impl)
        self._solve_vmap = jax.jit(jax.vmap(self._solve_impl))

    def _cold_guess(self, prob, theta, variant=None):
        """Cold-start z0: the reference's linspace guess, the
        physics-informed ballistic guess (warmstart/reference.py), or the
        learned NN guess (warmstart/nn.py).  The ballistic guess integrates
        the flight phase instead of decelerating from knot 0, which the
        dynamics cannot do pre-contact.

        ``variant`` (optional traced scalar): 0 selects the configured
        guess, nonzero selects the alternate family — the streaming
        driver's retry-failed-scenarios policy flips it at runtime
        (measured: ~1/3 of ballistic cold-start failures converge from the
        linspace guess), so all families are computed and selected
        branch-free.  ``retry_guess`` overrides the retry chain (e.g.
        ("nn", "reference"): NN rescue first, linspace as the last
        resort)."""

        def _family(name):
            if name == "nn":
                from .warmstart.nn import nn_warmstart_guess

                nn_params, nn_stats = self._nn

                def fn(p, th):
                    return nn_warmstart_guess(
                        nn_params, nn_stats, th.q_init, th.qd_init, p
                    )

                return fn
            if name == "ballistic":
                return ballistic_guess
            return initial_guess_from_reference

        primary = _family(self.guess)
        if variant is None:
            return primary(prob, theta)
        default_alt = {
            "nn": "ballistic", "ballistic": "reference", "reference": "ballistic",
        }[self.guess]
        chain = self.retry_guess or (default_alt,)
        out = primary(prob, theta)
        for i, name in enumerate(chain):
            out = jnp.where(variant == i + 1, _family(name)(prob, theta), out)
        return out

    def build_params(self, q_init, qd_init):
        """Scenario -> runtime parameter pytree (no recompilation)."""
        theta = self._params_fn(
            jnp.asarray(q_init, self.dtype), jnp.asarray(qd_init, self.dtype),
            n_knots=self.problem.config.n_knots, robot=self.robot,
        )
        if self.theta_overrides:
            theta = dataclasses.replace(
                theta,
                **{
                    k: jnp.asarray(v, self.dtype)
                    for k, v in self.theta_overrides.items()
                },
            )
        return theta

    def _solve_impl(self, q_init, qd_init, z0=None, warm=None):
        """One solve.  z0: optional primal warm start (reference layout).
        warm: optional (s, lam, y) in *unscaled* space (e.g. from a previous
        LandingSolution) — the full warm-restart state.  With z0 but no
        duals, the solver's barrier-consistent slack init at g(z0) applies
        (round-2 seeded s = g(z0) exactly, which starts active rows ON the
        barrier wall at mu_init and measurably *hurt* cascade convergence
        — VERDICT r2 weak #4; pair a primal warm start with a reduced
        mu_init via :meth:`warm_variant` instead)."""
        prob = self.problem
        theta = self.build_params(q_init, qd_init)
        if z0 is None:
            z0 = self._cold_guess(prob, theta)
        z0 = z0.astype(self.dtype)
        snlp = scale_problem(
            partial(prob.cost, theta=theta),
            partial(prob.eq, theta=theta),
            partial(prob.ineq, theta=theta),
            z0,
            z_scale=self._z_scale.astype(self.dtype),
        )
        step_fn = None
        if self.structured:
            from .solver.structured import make_structured_newton_step

            step_fn = make_structured_newton_step(prob, theta, self.config, snlp)
        zs0 = snlp.to_scaled(z0)
        s0 = lam0 = y0 = None
        if warm is not None:
            s_u, lam_u, y_u = warm
            s0 = snlp.slacks_to_scaled(s_u.astype(self.dtype))
            s0 = jnp.maximum(s0, 1e-12)
            lam0, y0 = snlp.duals_to_scaled(
                lam_u.astype(self.dtype), y_u.astype(self.dtype)
            )
            lam0 = jnp.maximum(lam0, 1e-10)
        res = solve(
            snlp.cost,
            snlp.eq,
            snlp.ineq,
            zs0,
            self.config,
            s0=s0,
            lam0=lam0,
            y0=y0,
            relax_mask=self.problem.relax_mask().astype(self.dtype),
            newton_step_fn=step_fn,
        )
        z = snlp.from_scaled(res.z)
        v = prob.unpack(z)
        if prob.config.kinodynamic:
            from .dynamics.legs import leg_torques

            tau = jax.vmap(
                lambda jp, x, u: leg_torques(self.robot_params, jp, x[3:6], u[12:])
            )(v.jpos, v.X[:-1], v.U)
        else:
            tau = jnp.zeros((prob.config.n_knots - 1, 12), self.dtype)
        lam_u, y_u = snlp.duals_from_scaled(res.lam, res.y)
        return LandingSolution(
            X=v.X,
            jpos=v.jpos,
            U=v.U,
            tau=tau,
            z=z,
            converged=res.converged,
            iterations=res.iterations,
            kkt_error=res.kkt_error,
            constr_viol=res.constr_viol,
            cost=res.cost,
            s=snlp.slacks_from_scaled(res.s),
            lam=lam_u,
            y=y_u,
        )

    def _segment_impl(self, q_init, qd_init, state, segment_iters: int, variant=None):
        """Run at most `segment_iters` further IP iterations from a carried
        IPState (streaming mode; parallel/stream.py).  `state=None`
        (via segment_iters=0 from `_init_state_impl`) initializes.

        Scaling note: row/variable scales are recomputed from the cold-start
        guess z0(q, qd, variant) — a pure function of the scenario — so
        every segment of one scenario sees the identical scaled problem
        (the retry ``variant`` flag must therefore ride along with the
        lane, parallel/stream.py).
        """
        prob = self.problem
        theta = self.build_params(q_init, qd_init)
        z0 = self._cold_guess(prob, theta, variant).astype(self.dtype)
        snlp = scale_problem(
            partial(prob.cost, theta=theta),
            partial(prob.eq, theta=theta),
            partial(prob.ineq, theta=theta),
            z0,
            z_scale=self._z_scale.astype(self.dtype),
        )
        step_fn = None
        if self.structured:
            from .solver.structured import make_structured_newton_step

            step_fn = make_structured_newton_step(prob, theta, self.config, snlp)
        res, new_state = solve(
            snlp.cost,
            snlp.eq,
            snlp.ineq,
            snlp.to_scaled(z0),
            self.config,
            relax_mask=self.problem.relax_mask().astype(self.dtype),
            newton_step_fn=step_fn,
            state0=state,
            segment_iters=segment_iters,
            return_state=True,
        )
        z = snlp.from_scaled(res.z)
        summary = {
            "z": z,
            "converged": res.converged,
            "done": new_state.done,
            "iterations": res.iterations,
            "kkt_error": res.kkt_error,
            "constr_viol": res.constr_viol,
            "cost": res.cost,
        }
        return summary, new_state

    def init_state(self, q_init, qd_init, variant=None):
        """Fresh IPState for (q, qd) without stepping (streaming mode)."""
        return self._segment_impl(q_init, qd_init, None, 0, variant)[1]

    def warm_variant(self, mu_init: float = 1e-2, **cfg_overrides) -> "LandingSolver":
        """A clone of this solver tuned for primal warm starts.

        A near-feasible z0 (cascade stage-2, NN guess, replan) does not need
        the full cold barrier path: restarting at ``mu_init=1e-1`` walks the
        warm iterate far off the central path before coming back (measured:
        the reference's SRBM-warm cascade *lost* convergence vs cold start
        in round 2).  The reference's KNITRO flow encodes the same idea via
        ``strat_warm_start`` (generate_landingCtrller_KNITRO_warmstart.m).
        """
        cfg = dataclasses.replace(self.config, mu_init=mu_init, **cfg_overrides)
        return LandingSolver(
            self.kind,
            n_knots=self.problem.config.n_knots,
            robot=self.robot,
            config=cfg,
            dtype=self.dtype,
            theta_overrides=self.theta_overrides,
            structured=self.structured,
            guess=self.guess,
            retry_guess=self.retry_guess,
        )

    def solve(self, q_init, qd_init, z0=None, warm=None) -> LandingSolution:
        """Solve one scenario (jit-cached after first call).

        warm: optional (s, lam, y) unscaled warm-restart state, or a previous
        LandingSolution (its state is extracted)."""
        if isinstance(warm, LandingSolution):
            warm = (warm.s, warm.lam, warm.y)
        return self._solve_one(q_init, qd_init, z0, warm)

    def solve_batch(self, q_inits, qd_inits) -> LandingSolution:
        """Solve a batch of scenarios via vmap (leading axis = scenario)."""
        return self._solve_vmap(q_inits, qd_inits)


class EEParamSolution(NamedTuple):
    v: object  # EEParamVars (base polys, durations, force/posn splines)
    z: jnp.ndarray
    converged: jnp.ndarray
    iterations: jnp.ndarray
    kkt_error: jnp.ndarray
    constr_viol: jnp.ndarray
    cost: jnp.ndarray


class EEParamSolver:
    """Jitted solver for the phase-based free-contact-timing NLP
    (problems/eeparam.py; the reference's quadruped_SRBM_eeParam.m:26-409,
    BASELINE config 2).

    The decision vector is spline coefficients + phase durations rather
    than knot states, so this family lives outside ``_PROBLEMS``/
    :class:`LandingSolver` but offers the same ergonomics::

        s = EEParamSolver()                       # f32, dense KKT
        sol = s.solve(s.build_params())           # default drop
        sols = s.solve_batch(thetas)              # vmapped batch (pytree
                                                  # with leading axis)
    """

    def __init__(
        self,
        config=None,
        ip_config: IPConfig | None = None,
        dtype=jnp.float32,
    ):
        from .problems.eeparam import default_eeparam_params, eeparam_problem

        self.problem = eeparam_problem(config)
        self.dtype = dtype
        self._default_params = default_eeparam_params
        if ip_config is None:
            # the spline NLP has no complementarity rows; GN curvature +
            # the dense inertia-corrected KKT path converge it directly
            ip_config = IPConfig(
                max_iter=200,
                hessian_mode="gn",
                relax_scale=0.0,
                delta_c=1e-6,
                mu_min=1e-5 if dtype == jnp.float32 else 1e-6,
                # measured f32 KKT floor for this spline NLP is ~5e-4
                # (feasibility still reaches ~1e-4); f64 honors 1e-4
                tol=2e-4 if dtype == jnp.float32 else 1e-4,
                sigma_max=1e5 if dtype == jnp.float32 else 1e8,
                # 2-candidate inertia ladder: measured identical
                # convergence to the 4-candidate default at -22% batch
                # wall on the TPU drop sweep (tools/eeparam_bench.py,
                # round 5: 4.78 vs 3.71 solves/s)
                ladder_scales=(0.0, 1.0),
                # 7 refinement sweeps, not 3: the *batched* (vmapped) f32
                # KKT path orders its reductions differently from the
                # single-scenario path, and at 3-5 sweeps individual bench
                # lanes plateau at kkt ~3e-3 (the exact lane depends on
                # the initial guess — the round-5 ballistic-informed guess
                # moved the plateau to a different scenario); at 7 both
                # paths polish to ~2e-4 (measured, round-5 battery)
                refine_steps=7 if dtype == jnp.float32 else 1,
            )
        self.config = ip_config
        self._solve_one = jax.jit(self._solve_impl)
        self._solve_vmap = jax.jit(jax.vmap(self._solve_impl))

    def build_params(self, r_init=None, rdot_init=None, theta_init=None, thetadot_init=None):
        """EEParamParams for a drop scenario (defaults: the reference's
        values, quadruped_SRBM_eeParam.m:412-447)."""
        theta = self._default_params(self.dtype)
        over = {
            k: jnp.asarray(v, self.dtype)
            for k, v in {
                "r_init": r_init, "rdot_init": rdot_init,
                "theta_init": theta_init, "thetadot_init": thetadot_init,
            }.items()
            if v is not None
        }
        return dataclasses.replace(theta, **over) if over else theta

    def _solve_impl(self, theta):
        from .solver.scaling import scale_problem

        prob = self.problem
        z0 = prob.initial_guess(theta).astype(self.dtype)
        snlp = scale_problem(
            partial(prob.cost, theta=theta),
            partial(prob.eq, theta=theta),
            partial(prob.ineq, theta=theta),
            z0,
        )
        res = solve(
            snlp.cost,
            snlp.eq,
            snlp.ineq,
            snlp.to_scaled(z0),
            self.config,
            relax_mask=prob.relax_mask().astype(self.dtype),
        )
        z = snlp.from_scaled(res.z)
        return EEParamSolution(
            v=prob.unpack(z),
            z=z,
            converged=res.converged,
            iterations=res.iterations,
            kkt_error=res.kkt_error,
            constr_viol=res.constr_viol,
            cost=res.cost,
        )

    def solve(self, theta) -> EEParamSolution:
        self.problem.check_params(theta)
        return self._solve_one(theta)

    def solve_batch(self, thetas) -> EEParamSolution:
        """Vmapped solve over a batch of EEParamParams (leading axis on
        every leaf); returns per-scenario convergence stats."""
        # same half-static horizon guard as solve(): a batch whose
        # theta.horizon differs from the static config would silently
        # enforce dynamics on the wrong time grid
        import numpy as np

        hs = np.unique(np.asarray(jax.device_get(thetas.horizon)))
        for h in hs:
            self.problem.check_params(
                dataclasses.replace(thetas, horizon=jnp.asarray(h, self.dtype))
            )
        return self._solve_vmap(thetas)
