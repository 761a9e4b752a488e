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
    # running-cost weights (contact-scheduled / CCC variants,
    # quadruped_SRBM_NLP.m:82-91); None for terminal-cost-only problems
    qx: jnp.ndarray | None = None  # (12,)
    qc: jnp.ndarray | None = None  # (3,)
    qf: jnp.ndarray | None = None  # (3,)
    cs: jnp.ndarray | None = None  # (N-1, 4) contact schedule parameter


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
    # variant switches
    sliding: bool = False  # kinetic-friction sliding complementarity
    contact_scheduled: bool = False  # cs parameter, equality contacts
    running_cost: bool = False  # QX/Qc/Qf running terms
    terminal_box: bool = True  # terminal state box rows
    init_foot_eq: bool = False  # c_0 == c_init equality
    lcp_rows: bool = True  # complementarity rows (off for scheduled)
    voltage_limit: bool = False  # motor back-EMF voltage rows (kinodynamic
    # only; test_finalOptimization_voltageLimits.m:178-187 — the reference
    # later disabled these in production, landing_optimization.m:191-200)
    # cost p_hip nominal offsets (quadruped_SRBM_NLP.m:78-80)
    p_hip_cost: tuple = (
        (0.19, -0.1, -0.2), (0.19, 0.1, -0.2), (-0.19, -0.1, -0.2), (-0.19, 0.1, -0.2)
    )

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
        head = 12 + (12 if (config.kinodynamic or config.init_foot_eq) else 0)
        contact_eq = (4 + 12) * (n - 1) if config.contact_scheduled else 0
        self.n_eq = head + 12 * (n - 1) + contact_eq
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
        """Terminal quadratic cost (landing_optimization.m:83-86), plus the
        running QX/Qc/Qf terms for the scheduled/CCC variants
        (quadruped_SRBM_NLP.m:82-91)."""
        v = self.unpack(z)
        err = v.X[-1] - theta.x_ref[-1]
        total = jnp.sum(theta.qn * err * err)
        if self.config.running_cost:
            p_hip = jnp.asarray(self.config.p_hip_cost, dtype=z.dtype).reshape(12)

            def stage(x, u, x_ref, u_ref, dt_k):
                x_err = x - x_ref
                pf_err = jnp.tile(x[0:3], 4) + p_hip - u[:12]
                f_err = u[12:] - u_ref[12:]
                return (
                    jnp.sum(theta.qx * x_err * x_err)
                    + jnp.sum(jnp.tile(theta.qc, 4) * pf_err * pf_err)
                    + jnp.sum(jnp.tile(theta.qf, 4) * f_err * f_err)
                ) * dt_k

            total = total + jnp.sum(
                jax.vmap(stage)(v.X[:-1], v.U, theta.x_ref[:-1], theta.u_ref, theta.dt)
            )
        return total

    # ------------------------------------------------------------ equality
    def eq(self, z: jnp.ndarray, theta: LandingParams) -> jnp.ndarray:
        """[x0 - x_init; (c0 - c_init); dynamics defects; (scheduled
        contact equalities)] = 0."""
        cfg = self.config
        v = self.unpack(z)
        n = cfg.n_knots
        x_init = jnp.concatenate([theta.q_init, theta.qd_init])
        head = [v.X[0] - x_init]
        if cfg.kinodynamic or cfg.init_foot_eq:
            head.append(v.U[0, :12] - theta.c_init)

        def defect(x_k, x_kp1, u_k, dt_k):
            xdot = self._xdot(x_k, u_k, theta)
            return x_kp1 - x_k - xdot * dt_k

        defects = jax.vmap(defect)(v.X[:-1], v.X[1:], v.U, theta.dt)
        parts = head + [defects.reshape(-1)]
        if cfg.contact_scheduled:
            # cs_leg * c_z = 0 (foot pinned to ground while in contact) and
            # cs_leg * (c_{k+1} - c_k) = 0 (no slip), quadruped_SRBM_NLP.m:158-163.
            # The z no-slip row is linearly dependent on consecutive ground
            # rows whenever both knots are in stance, which makes Je heavily
            # rank-deficient (the reference leaves this to IPOPT's inertia
            # machinery); we keep the z row only across liftoff transitions
            # (cs_k=1, cs_{k+1}=0), which is the only case it adds information.
            cz = v.U[:, 2:12:3]  # (N-1, 4)
            ground = (theta.cs * cz).reshape(-1)
            c_next = jnp.concatenate([v.U[1:, :12], v.U[-1:, :12]])
            cs_next = jnp.concatenate([theta.cs[1:], theta.cs[-1:]])
            ns_mask = (jnp.arange(n - 1) < (n - 2)).astype(z.dtype)[:, None]
            dc = (c_next - v.U[:, :12]).reshape(n - 1, 4, 3)
            weights = jnp.stack(
                [theta.cs, theta.cs, theta.cs * (1.0 - cs_next)], axis=-1
            ) * ns_mask[..., None]
            noslip = (weights * dc).reshape(-1)
            parts += [ground, noslip]
        return jnp.concatenate(parts)

    def _xdot(self, x, u, theta):
        if self.config.rotation == "xyz":
            return srbm_xdot(x, u, theta.mass, theta.ib, theta.ib_inv)
        # legacy ZYX variant (generate_landingCtrller_IPOPT_warmstart.m:116-130)
        return _srbm_xdot_zyx(x, u, theta.mass, theta.ib, theta.ib_inv)

    # ---------------------------------------------------------- inequality
    def _count_ineq(self) -> int:
        c = self.config
        n = c.n_knots
        if c.contact_scheduled:
            per_knot = 4 + 4 + 24 + 4 + 16 + 24
        elif c.sliding:
            per_knot = 4 + 4 + 4 + 4 + 24 + 24 + 4 + 16 + 24
        elif c.kinodynamic:
            per_knot = 4 + 4 + 4 + 24 + 8 + 8 + 8 + 4 + 24 + 16 + 1 + 24 + 24
        else:
            per_knot = 4 + 4 + 4 + 4 + 24 + 8 + 8 + 8 + 4 + 16 + 24
        n_volt = 24 * (n - 2) if c.voltage_limit else 0
        return per_knot * (n - 1) + (24 if c.terminal_box else 0) + n_volt

    def ineq_row_labels(self):
        """Human-readable label per inequality row (diagnostics)."""
        c = self.config
        n = c.n_knots
        if c.contact_scheduled:
            groups = [("fz", 4), ("fz_sched", 4), ("kinbox", 24), ("leglen", 4),
                      ("fric", 16), ("statebox", 24)]
        elif c.kinodynamic:
            groups = [("fz", 4), ("cz", 4), ("lcp", 4), ("ns_hi", 12), ("ns_lo", 12),
                      ("kinbox", 24), ("leglen", 4), ("torque", 24), ("fric", 16),
                      ("z_bound", 1), ("fk_band", 24), ("jlim", 24)]
        elif c.sliding:
            groups = [("fz", 4), ("fmax", 4), ("cz", 4), ("lcp", 4), ("slide", 24),
                      ("kinbox", 24), ("leglen", 4), ("fric", 16), ("statebox", 24)]
        else:
            groups = [("fz", 4), ("fmax", 4), ("cz", 4), ("lcp", 4), ("ns_hi", 12),
                      ("ns_lo", 12), ("kinbox", 24), ("leglen", 4), ("fric", 16),
                      ("statebox", 24)]
        labels = []
        for k in range(n - 1):
            for name, sz in groups:
                labels += [f"k{k}:{name}[{i}]" for i in range(sz)]
        if c.terminal_box:
            labels += [f"terminal[{i}]" for i in range(24)]
        if c.voltage_limit:
            for k in range(1, n - 1):
                labels += [f"k{k}:volt[{i}]" for i in range(24)]
        return labels

    def relax_mask(self) -> jnp.ndarray:
        """Mask of degenerate complementarity rows (LCP + no-slip) for the
        solver's mu-proportional relaxation homotopy (see solver.ip.solve)."""
        import numpy as np

        c = self.config
        n = c.n_knots
        if c.contact_scheduled:
            sizes = [4, 4, 24, 4, 16, 24]
            # flight legs pinch 0 <= fz <= cs*f_max to a point; without a
            # mu-proportional interior both multipliers blow up (~mu/br) and
            # the complementarity error deadlocks the barrier schedule
            marked = {0, 1}  # fz, fz_sched
        elif c.kinodynamic:
            sizes = [4, 4, 4, 12, 12, 24, 4, 24, 16, 1, 24, 24]
            marked = {2, 3, 4, 10}  # lcp, ns_hi, ns_lo, fk_band
        elif c.sliding:
            sizes = [4, 4, 4, 4, 24, 24, 4, 16, 24]
            marked = {3, 4}  # lcp, sliding rows (residual + dissipativity)
        else:
            sizes = [4, 4, 4, 4, 12, 12, 24, 4, 16, 24]
            marked = {3, 4, 5}  # lcp, ns_hi, ns_lo
        row = np.concatenate(
            [np.full(sz, 1.0 if i in marked else 0.0) for i, sz in enumerate(sizes)]
        )
        per_knot = np.tile(row, n - 1)
        tail = np.zeros(24) if c.terminal_box else np.zeros(0)
        volt = np.zeros(24 * (n - 2)) if c.voltage_limit else np.zeros(0)
        return jnp.asarray(np.concatenate([per_knot, tail, volt]))

    def ineq(self, z: jnp.ndarray, theta: LandingParams) -> jnp.ndarray:
        v = self.unpack(z)
        n = self.config.n_knots
        # no-slip is inactive at the last interior knot (k+1<N check,
        # landing_optimization.m:140); mask keeps shapes static.
        ns_mask = jnp.arange(n - 1) < (n - 2)
        ns_mask = ns_mask.astype(z.dtype)
        c_next = jnp.concatenate([v.U[1:, :12], v.U[-1:, :12]])  # last row unused

        if self.config.contact_scheduled:
            knot_fn = partial(self._knot_ineq_scheduled, theta=theta)
            rows = jax.vmap(knot_fn)(v.X[:-1], v.U, theta.cs)
        elif self.config.kinodynamic:
            knot_fn = partial(self._knot_ineq_kino, theta=theta)
            rows = jax.vmap(knot_fn)(v.X[:-1], v.U, v.jpos, c_next, ns_mask)
        else:
            knot_fn = lambda x, u, cn, m, dt: self._knot_ineq_srbm(x, u, cn, m, theta, dt)
            rows = jax.vmap(knot_fn)(v.X[:-1], v.U, c_next, ns_mask, theta.dt)
        parts = [rows.reshape(-1)]
        if self.config.terminal_box:
            parts.append(self._terminal_ineq(v.X[-1], theta))
        if self.config.voltage_limit:
            parts.append(self._voltage_rows(v, theta))
        return jnp.concatenate(parts) if len(parts) > 1 else parts[0]

    def _voltage_rows(self, v, theta):
        """Motor terminal-voltage limit rows |i R_m + back-EMF| <= V_batt
        (test_finalOptimization_voltageLimits.m:178-187; back-EMF model as
        plot_results.m:23-38).  One row pair per joint per knot k=1..N-2,
        with joint velocity from the backward difference (jpos_k -
        jpos_{k-1}) / dt(1) — the reference divides by the FIRST dt, not
        dt_k; replicated for parity."""
        rp = self.robot_params
        dtype = v.X.dtype
        gr = jnp.tile(
            jnp.asarray(
                [rp.abad_gear_ratio, rp.hip_gear_ratio, rp.knee_gear_ratio], dtype
            ),
            4,
        )
        kt = jnp.asarray(rp.motor_kt, dtype)
        rm = jnp.asarray(rp.motor_r, dtype)
        v_batt = jnp.asarray(rp.battery_v, dtype)

        def pair(x_k, jp_k, jp_prev, f_k):
            tau = legs.leg_torques(rp, jp_k, x_k[3:6], f_k)
            current = (tau / gr) / (1.5 * kt)
            jvel = (jp_k - jp_prev) / theta.dt[0]
            volt = current * rm + jvel * gr * kt * 2.0
            return jnp.concatenate([v_batt - volt, volt + v_batt])

        rows = jax.vmap(pair)(
            v.X[1:-1], v.jpos[1:], v.jpos[:-1], v.U[1:, 12:]
        )
        return rows.reshape(-1)

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

    # --- contact-scheduled knot (quadruped_SRBM_NLP.m:120-186) -------------
    def _knot_ineq_scheduled(self, x_k, u_k, cs_k, theta):
        cfg = self.config
        rpy = x_k[3:6]
        R_b2w = rpy_to_rot_zyx(rpy)
        f = u_k[12:].reshape(4, 3)
        fz = f[:, 2]
        fz_sched = cs_k * theta.f_max - fz  # flight legs carry no force
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
        return jnp.concatenate([fz, fz_sched, box, leg_len, fric, state_box])

    # --- srbm knot ---------------------------------------------------------
    def _knot_ineq_srbm(self, x_k, u_k, c_next, ns_mask, theta, dt_k=None):
        cfg = self.config
        rpy = x_k[3:6]
        R_b2w = rpy_to_rot_zyx(rpy)
        fz, cz, lcp, ns_hi, ns_lo = self._contact_core(
            x_k, u_k, c_next, ns_mask, theta, cfg.noslip_eps
        )
        if cfg.sliding:
            # Kinetic-friction sliding complementarity
            # (main_scripts/landing_optimization_sliding.m:150-165).  The
            # reference's research-file rows are not usable as written: its
            # x-row pair  fz*dc*(fx - lim) <= 1e-3 / fz*dc*(fx + lim) >=
            # -1e-3  is DIRECTIONAL (forbids -x slip entirely, allows +x
            # slip anywhere inside the cone), and its y rows have flipped
            # senses that force nonzero slip at every knot (a slip — the
            # same file keeps earlier attempts commented out at :157-160).
            # We transcribe the physics that block intends, symmetric per
            # axis:
            #   (a) slip _|_ cone residual:
            #       fz/f_max * dc_t * (lim^2 - f_t^2)/f_max in [-eps, eps]
            #       — a loaded foot may slip only when |f_t| saturates the
            #       pyramid limit (lim = 0.71 mu fz), and a strictly-inside
            #       force pins the foot (the no-slip LCP limit);
            #   (b) dissipativity: fz/f_max * dc_t * f_t/f_max <= eps —
            #       kinetic friction opposes the slip direction.
            # The fz factor keeps unloaded (swing) feet free, as in the
            # reference; the 1/f_max^2 normalization keeps the quartic
            # row's magnitude O(1) for the row-scaling pass
            # (solver/scaling.py) so eps retains the reference's 1e-3
            # contract.  Both groups ride the mu-proportional relaxation
            # homotopy (relax_mask marks them).
            c = u_k[:12].reshape(4, 3)
            f = u_k[12:].reshape(4, 3)
            dc = (c_next.reshape(4, 3) - c) / dt_k
            lim = cfg.friction_pyramid_factor * theta.mu * f[:, 2]
            eps = cfg.noslip_eps
            w = f[:, 2] / (theta.f_max * theta.f_max)
            rows = []
            for ax in (0, 1):
                resid = w * dc[:, ax] * (lim * lim - f[:, ax] * f[:, ax])
                rows.append(ns_mask * (eps - resid) + (1.0 - ns_mask))
                rows.append(ns_mask * (resid + eps) + (1.0 - ns_mask))
                dissip = w * dc[:, ax] * f[:, ax]
                rows.append(ns_mask * (eps - dissip) + (1.0 - ns_mask))
            slide = jnp.concatenate(rows)
            ns_hi, ns_lo = slide, jnp.zeros((0,), x_k.dtype)
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


def kinodynamic_voltage_problem(robot_params, n_knots: int = 21) -> LandingProblem:
    """Kinodynamic NLP + motor back-EMF voltage limit rows
    (test_finalOptimization_voltageLimits.m:178-187).  The reference
    disabled these rows in its production driver
    (landing_optimization.m:191-200 commented out); the variant is kept for
    capability parity.  Voltage rows couple adjacent knots' joint angles,
    so this variant runs on the dense KKT path."""
    base = kinodynamic_problem(robot_params, n_knots=n_knots)
    import dataclasses

    return LandingProblem(
        dataclasses.replace(base.config, voltage_limit=True), robot_params
    )


def srbm_lcp_problem(robot_params, n_knots: int = 21) -> LandingProblem:
    """The SRBM-LCP warm-start NLP (generate_landingCtrller_IPOPT_warmstart.m)."""
    cfg = LandingConfig(n_knots=n_knots, kinodynamic=False, rotation="zyx", noslip_eps=1e-2)
    return LandingProblem(cfg, robot_params)


def sliding_problem(robot_params, n_knots: int = 18) -> LandingProblem:
    """Sliding-contact landing NLP, N=18, T=0.6
    (main_scripts/landing_optimization_sliding.m:29-32,150-165): srbm_lcp
    family with kinetic-friction sliding complementarity on the tangential
    foot velocity instead of no-slip."""
    cfg = LandingConfig(
        n_knots=n_knots, kinodynamic=False, rotation="zyx", noslip_eps=1e-3,
        sliding=True,
    )
    return LandingProblem(cfg, robot_params)


def ccc_problem(robot_params, n_knots: int = 41) -> LandingProblem:
    """Contact-implicit CCC envelope NLP, N=41, T=0.6
    (generate_solver/generate_quadruped_SRBM_CCC.m:28-186): srbm_lcp family
    with the tighter 0.05/0.05/0.27 kinematic box and a running GRF cost."""
    cfg = LandingConfig(
        n_knots=n_knots,
        kinodynamic=False,
        rotation="zyx",
        noslip_eps=1e-2,
        srbm_kin_box_x=0.05,
        srbm_kin_box_y=0.05,
        srbm_kin_box_z=0.27,
        running_cost=True,
    )
    return LandingProblem(cfg, robot_params)


def contact_scheduled_problem(robot_params, n_knots: int = 16) -> LandingProblem:
    """Contact-scheduled NLP, N=16, T=0.5 (quadruped_SRBM_NLP.m:29-186):
    contact schedule cs as a parameter, equality ground/no-slip contacts,
    running + terminal cost, no terminal box."""
    cfg = LandingConfig(
        n_knots=n_knots,
        kinodynamic=False,
        rotation="zyx",
        contact_scheduled=True,
        running_cost=True,
        terminal_box=False,
        lcp_rows=False,
        srbm_kin_box_x=0.05,
        srbm_kin_box_y=0.05,
        srbm_kin_box_z=0.27,
    )
    return LandingProblem(cfg, robot_params)
