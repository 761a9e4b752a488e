"""Landing NLP transcriptions: kinodynamic (production) and SRBM-LCP.

Two members of the reference's NLP family are transcribed here as batched
residual stacks:

- **kinodynamic** — the production landing problem
  (main_scripts/landing_optimization.m:39-201): decision vars X (12xN),
  jpos (12x(N-1)), U (24x(N-1)); XYZ rotation convention; velocity-scaled
  asymmetric kinematic box; Jacobian-transpose torque limits; FK-consistency
  band; relaxed LCP + no-slip complementarity (eps = 1e-3).

- **srbm_lcp** — the IPOPT warm-start problem
  (generate_solver/generate_landingCtrller_IPOPT_warmstart.m:41-170): no
  joint variables, legacy ZYX rotation convention, fixed symmetric kin box,
  f_max bound, full state boxes every knot, no-slip eps = 1e-2.

Both share the SRBM Euler dynamics defects (dynamics.srbm.euler_defect) and
terminal quadratic cost.  The flat decision layout matches the reference's
``[X(:); jpos(:); U(:)]`` (column-major = knot-major) so warm starts
round-trip against reference artifacts.

Inequalities are canonical ``g(z) >= 0``; equalities ``E(z) = 0``.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..dynamics import legs
from ..dynamics.rotations import rpy_to_rot_xyz, rpy_to_rot_zyx
from ..dynamics.srbm import srbm_xdot


def _register(cls):
    fields = [f.name for f in dataclasses.fields(cls)]
    jax.tree_util.register_pytree_node(
        cls,
        lambda obj: (tuple(getattr(obj, f) for f in fields), None),
        lambda aux, children: cls(**dict(zip(fields, children))),
    )
    return cls


@_register
@dataclasses.dataclass(frozen=True)
class LandingParams:
    """Runtime problem parameters — one leaf per reference ``opti.parameter``
    (landing_optimization.m:50-83; generate_landingCtrller_IPOPT_warmstart.m:50-76)."""

    x_ref: jnp.ndarray  # (N, 12) state reference
    u_ref: jnp.ndarray  # (N-1, 24) control reference
    dt: jnp.ndarray  # (N-1,)
    q_init: jnp.ndarray  # (6,)
    qd_init: jnp.ndarray  # (6,)
    c_init: jnp.ndarray  # (12,) — used by kinodynamic only
    q_min: jnp.ndarray  # (6,)
    q_max: jnp.ndarray
    qd_min: jnp.ndarray
    qd_max: jnp.ndarray
    q_term_min: jnp.ndarray
    q_term_max: jnp.ndarray
    qd_term_min: jnp.ndarray
    qd_term_max: jnp.ndarray
    qn: jnp.ndarray  # (12,) terminal weight diagonal
    jpos_min: jnp.ndarray  # (12,)
    jpos_max: jnp.ndarray
    kin_box: jnp.ndarray  # (2,) velocity-scaled box widening (x, y)
    mu: jnp.ndarray  # scalar
    l_leg_max: jnp.ndarray  # scalar
    f_max: jnp.ndarray  # scalar (srbm_lcp only)
    mass: jnp.ndarray  # scalar
    ib: jnp.ndarray  # (3,) body inertia diagonal
    ib_inv: jnp.ndarray  # (3,)


@_register
@dataclasses.dataclass(frozen=True)
class LandingVars:
    """Structured decision variables."""

    X: jnp.ndarray  # (N, 12)
    jpos: jnp.ndarray  # (N-1, 12) — zero-size for srbm_lcp
    U: jnp.ndarray  # (N-1, 24)


@dataclasses.dataclass(frozen=True)
class LandingConfig:
    """Static (compile-time) problem configuration."""

    n_knots: int = 21
    kinodynamic: bool = True
    rotation: str = "xyz"  # "xyz" (production) or "zyx" (warm-start NLP)
    lcp_eps: float = 1e-3  # f_z * c_z <= eps  (landing_optimization.m:139)
    noslip_eps: float = 1e-3  # |f_z * dc| <= eps (kino 1e-3; srbm 1e-2)
    friction_pyramid_factor: float = 0.71  # landing_optimization.m:175-178
    # kinematic box (kinodynamic variant, landing_optimization.m:149-163)
    kin_box_x0: float = 0.125
    kin_box_y0: float = 0.10
    kin_box_z_upper: float = -0.075
    kin_box_z_lower: float = -0.4
    kin_box_y_inner: float = 0.05
    # srbm variant fixed box (generate_landingCtrller_IPOPT_warmstart.m:152-159)
    srbm_kin_box_x: float = 0.15
    srbm_kin_box_y: float = 0.15
    srbm_kin_box_z: float = 0.30
    srbm_kin_box_z_offset: float = 0.05
    hip_srbm_location: tuple = ((0.19, -0.1, 0.0), (0.19, 0.1, 0.0), (-0.19, -0.1, 0.0), (-0.19, 0.1, 0.0))
    side_sign: tuple = (-1.0, 1.0, -1.0, 1.0)
    tau_max: tuple = (18.0, 18.0, 28.0)

    @property
    def n_states(self) -> int:
        return 12

    @property
    def n_controls(self) -> int:
        return 24

    @property
    def n_joints(self) -> int:
        return 12 if self.kinodynamic else 0


class LandingProblem:
    """Transcribed landing NLP: cost / eq / ineq over flat z and theta.

    All methods are jit/vmap-safe pure functions of (z, theta); ``config``
    and ``robot_params`` are static.
    """

    def __init__(self, config: LandingConfig, robot_params):
        self.config = config
        self.robot_params = robot_params
        n = config.n_knots
        self.n_vars = 12 * n + config.n_joints * (n - 1) + 24 * (n - 1)
        self.n_eq = (12 if not config.kinodynamic else 24) + 12 * (n - 1)
        self.n_ineq = self._count_ineq()

    # ---------------------------------------------------------------- pack
    def pack(self, v: LandingVars) -> jnp.ndarray:
        """Structured -> flat, reference layout [X(:); jpos(:); U(:)]."""
        parts = [v.X.reshape(-1)]
        if self.config.kinodynamic:
            parts.append(v.jpos.reshape(-1))
        parts.append(v.U.reshape(-1))
        return jnp.concatenate(parts)

    def unpack(self, z: jnp.ndarray) -> LandingVars:
        n = self.config.n_knots
        nj = self.config.n_joints
        nx = 12 * n
        X = z[:nx].reshape(n, 12)
        if nj:
            jpos = z[nx : nx + nj * (n - 1)].reshape(n - 1, nj)
        else:
            jpos = jnp.zeros((n - 1, 0), dtype=z.dtype)
        U = z[nx + nj * (n - 1) :].reshape(n - 1, 24)
        return LandingVars(X=X, jpos=jpos, U=U)

    # ---------------------------------------------------------------- cost
    def cost(self, z: jnp.ndarray, theta: LandingParams) -> jnp.ndarray:
        """Terminal quadratic cost (landing_optimization.m:83-86)."""
        v = self.unpack(z)
        err = v.X[-1] - theta.x_ref[-1]
        return jnp.sum(theta.qn * err * err)

    # ------------------------------------------------------------ equality
    def eq(self, z: jnp.ndarray, theta: LandingParams) -> jnp.ndarray:
        """[x0 - x_init; (c0 - c_init); dynamics defects] = 0."""
        v = self.unpack(z)
        x_init = jnp.concatenate([theta.q_init, theta.qd_init])
        head = [v.X[0] - x_init]
        if self.config.kinodynamic:
            head.append(v.U[0, :12] - theta.c_init)

        def defect(x_k, x_kp1, u_k, dt_k):
            xdot = self._xdot(x_k, u_k, theta)
            return x_kp1 - x_k - xdot * dt_k

        defects = jax.vmap(defect)(v.X[:-1], v.X[1:], v.U, theta.dt)
        return jnp.concatenate(head + [defects.reshape(-1)])

    def _xdot(self, x, u, theta):
        if self.config.rotation == "xyz":
            return srbm_xdot(x, u, theta.mass, theta.ib, theta.ib_inv)
        # legacy ZYX variant (generate_landingCtrller_IPOPT_warmstart.m:116-130)
        return _srbm_xdot_zyx(x, u, theta.mass, theta.ib, theta.ib_inv)

    # ---------------------------------------------------------- inequality
    def _count_ineq(self) -> int:
        c = self.config
        n = c.n_knots
        if c.kinodynamic:
            per_knot = 4 + 4 + 4 + 24 + 8 + 8 + 8 + 4 + 24 + 16 + 1 + 24 + 24
        else:
            per_knot = 4 + 4 + 4 + 4 + 24 + 8 + 8 + 8 + 4 + 16 + 24
        return per_knot * (n - 1) + 24

    def relax_mask(self) -> jnp.ndarray:
        """Mask of degenerate complementarity rows (LCP + no-slip) for the
        solver's mu-proportional relaxation homotopy (see solver.ip.solve)."""
        import numpy as np

        c = self.config
        n = c.n_knots
        if c.kinodynamic:
            sizes = [4, 4, 4, 12, 12, 24, 4, 24, 16, 1, 24, 24]
            marked = {2, 3, 4}  # lcp, ns_hi, ns_lo
        else:
            sizes = [4, 4, 4, 4, 12, 12, 24, 4, 16, 24]
            marked = {3, 4, 5}  # lcp, ns_hi, ns_lo
        row = np.concatenate(
            [np.full(sz, 1.0 if i in marked else 0.0) for i, sz in enumerate(sizes)]
        )
        per_knot = np.tile(row, n - 1)
        return jnp.asarray(np.concatenate([per_knot, np.zeros(24)]))

    def ineq(self, z: jnp.ndarray, theta: LandingParams) -> jnp.ndarray:
        v = self.unpack(z)
        n = self.config.n_knots
        # no-slip is inactive at the last interior knot (k+1<N check,
        # landing_optimization.m:140); mask keeps shapes static.
        ns_mask = jnp.arange(n - 1) < (n - 2)
        ns_mask = ns_mask.astype(z.dtype)
        c_next = jnp.concatenate([v.U[1:, :12], v.U[-1:, :12]])  # last row unused

        if self.config.kinodynamic:
            knot_fn = partial(self._knot_ineq_kino, theta=theta)
            rows = jax.vmap(knot_fn)(v.X[:-1], v.U, v.jpos, c_next, ns_mask)
        else:
            knot_fn = partial(self._knot_ineq_srbm, theta=theta)
            rows = jax.vmap(knot_fn)(v.X[:-1], v.U, c_next, ns_mask)
        term = self._terminal_ineq(v.X[-1], theta)
        return jnp.concatenate([rows.reshape(-1), term])

    def _terminal_ineq(self, x_n, theta):
        """Terminal state box (landing_optimization.m:94-97)."""
        q, qd = x_n[:6], x_n[6:]
        return jnp.concatenate(
            [
                q - theta.q_term_min,
                theta.q_term_max - q,
                qd - theta.qd_term_min,
                theta.qd_term_max - qd,
            ]
        )

    # --- shared pieces -----------------------------------------------------
    def _contact_core(self, x_k, u_k, c_next, ns_mask, theta, noslip_eps):
        """fz>=0, cz>=0, LCP, masked no-slip — shared by both variants."""
        c = u_k[:12].reshape(4, 3)
        f = u_k[12:].reshape(4, 3)
        fz = f[:, 2]
        cz = c[:, 2]
        lcp = self.config.lcp_eps - fz * cz
        dc = (c_next.reshape(4, 3) - c) * fz[:, None]
        ns_hi = ns_mask * (noslip_eps - dc) + (1.0 - ns_mask)
        ns_lo = ns_mask * (dc + noslip_eps) + (1.0 - ns_mask)
        return fz, cz, lcp, ns_hi.reshape(-1), ns_lo.reshape(-1)

    def _friction(self, u_k, theta):
        """Pyramid |fx|,|fy| <= 0.71 mu fz (landing_optimization.m:175-178)."""
        f = u_k[12:].reshape(4, 3)
        lim = self.config.friction_pyramid_factor * theta.mu * f[:, 2]
        return jnp.concatenate(
            [lim - f[:, 0], f[:, 0] + lim, lim - f[:, 1], f[:, 1] + lim]
        )

    def _p_rel(self, x_k, u_k, R_b2w):
        """Foot positions relative to SRBM hips, world frame, (4,3)."""
        hips = jnp.asarray(self.config.hip_srbm_location, dtype=x_k.dtype)
        r_hip = x_k[:3] + hips @ R_b2w.T
        return u_k[:12].reshape(4, 3) - r_hip

    # --- kinodynamic knot --------------------------------------------------
    def _knot_ineq_kino(self, x_k, u_k, jpos_k, c_next, ns_mask, theta):
        cfg = self.config
        rpy = x_k[3:6]
        R_b2w = rpy_to_rot_xyz(rpy)
        fz, cz, lcp, ns_hi, ns_lo = self._contact_core(
            x_k, u_k, c_next, ns_mask, theta, cfg.noslip_eps
        )
        p_rel = self._p_rel(x_k, u_k, R_b2w)

        # velocity-scaled kinematic box (landing_optimization.m:149-163)
        kbx = cfg.kin_box_x0 + theta.kin_box[0]
        kby = cfg.kin_box_y0 + theta.kin_box[1]
        side = jnp.asarray(cfg.side_sign, dtype=x_k.dtype)
        y_upper = jnp.where(side < 0, cfg.kin_box_y_inner, kby)
        y_lower = jnp.where(side < 0, -kby, -cfg.kin_box_y_inner)
        box = jnp.concatenate(
            [
                kbx - p_rel[:, 0],
                p_rel[:, 0] + kbx,
                y_upper - p_rel[:, 1],
                p_rel[:, 1] - y_lower,
                cfg.kin_box_z_upper - p_rel[:, 2],
                p_rel[:, 2] - cfg.kin_box_z_lower,
            ]
        )
        leg_len = theta.l_leg_max**2 - jnp.sum(p_rel * p_rel, axis=1)

        # torque limits tau = J' (-R_w2b f) (landing_optimization.m:167-171)
        tau = legs.leg_torques(self.robot_params, jpos_k, rpy, u_k[12:])
        tau_max = jnp.tile(jnp.asarray(cfg.tau_max, dtype=x_k.dtype), 4)
        torque = jnp.concatenate([tau_max - tau, tau + tau_max])

        fric = self._friction(u_k, theta)
        z_bound = (x_k[2] - theta.q_min[2])[None]

        # FK consistency band (landing_optimization.m:184-187)
        feet = legs.foot_positions_world(self.robot_params, x_k[:6], jpos_k).reshape(-1)
        fk_err = u_k[:12] - feet
        fk_band = jnp.concatenate([0.01 - fk_err, fk_err + 0.01])
        jl = jnp.concatenate([jpos_k - theta.jpos_min, theta.jpos_max - jpos_k])

        return jnp.concatenate(
            [fz, cz, lcp, ns_hi, ns_lo, box, leg_len, torque, fric, z_bound, fk_band, jl]
        )

    # --- srbm knot ---------------------------------------------------------
    def _knot_ineq_srbm(self, x_k, u_k, c_next, ns_mask, theta):
        cfg = self.config
        rpy = x_k[3:6]
        R_b2w = rpy_to_rot_zyx(rpy)
        fz, cz, lcp, ns_hi, ns_lo = self._contact_core(
            x_k, u_k, c_next, ns_mask, theta, cfg.noslip_eps
        )
        fmax_rows = theta.f_max - fz
        p_rel = self._p_rel(x_k, u_k, R_b2w)
        box = jnp.concatenate(
            [
                cfg.srbm_kin_box_x - p_rel[:, 0],
                p_rel[:, 0] + cfg.srbm_kin_box_x,
                cfg.srbm_kin_box_y - p_rel[:, 1],
                p_rel[:, 1] + cfg.srbm_kin_box_y,
                -(p_rel[:, 2] + cfg.srbm_kin_box_z_offset),
                (p_rel[:, 2] + cfg.srbm_kin_box_z_offset) + cfg.srbm_kin_box_z,
            ]
        )
        leg_len = theta.l_leg_max**2 - jnp.sum(p_rel * p_rel, axis=1)
        fric = self._friction(u_k, theta)
        q, qd = x_k[:6], x_k[6:]
        state_box = jnp.concatenate(
            [q - theta.q_min, theta.q_max - q, qd - theta.qd_min, theta.qd_max - qd]
        )
        return jnp.concatenate(
            [fz, fmax_rows, cz, lcp, ns_hi, ns_lo, box, leg_len, fric, state_box]
        )


def _srbm_xdot_zyx(x, u, mass, ib_diag, ib_inv_diag):
    """SRBM derivative with the legacy ZYX rotation convention
    (generate_landingCtrller_IPOPT_warmstart.m:114-130)."""
    r, rpy, omega, v = x[0:3], x[3:6], x[6:9], x[9:12]
    c = u[:12].reshape(4, 3)
    f = u[12:].reshape(4, 3)
    R_b2w = rpy_to_rot_zyx(rpy)
    g = jnp.asarray([0.0, 0.0, -9.81], dtype=x.dtype)
    v_dot = jnp.sum(f, axis=0) / mass + g
    tau_world = jnp.sum(jnp.cross(c - r, f), axis=0)
    omega_dot = ib_inv_diag * (R_b2w.T @ tau_world - jnp.cross(omega, ib_diag * omega))
    from ..dynamics.rotations import binv

    rpy_dot = binv(rpy) @ (R_b2w @ omega)
    return jnp.concatenate([v, rpy_dot, omega_dot, v_dot])


def kinodynamic_problem(robot_params, n_knots: int = 21) -> LandingProblem:
    """The production kinodynamic landing NLP (landing_optimization.m)."""
    cfg = LandingConfig(n_knots=n_knots, kinodynamic=True, rotation="xyz", noslip_eps=1e-3)
    return LandingProblem(cfg, robot_params)


def srbm_lcp_problem(robot_params, n_knots: int = 21) -> LandingProblem:
    """The SRBM-LCP warm-start NLP (generate_landingCtrller_IPOPT_warmstart.m)."""
    cfg = LandingConfig(n_knots=n_knots, kinodynamic=False, rotation="zyx", noslip_eps=1e-2)
    return LandingProblem(cfg, robot_params)
