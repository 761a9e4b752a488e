"""Phase-based end-effector-parametrized landing NLP (free contact timing).

TPU-native rebuild of the reference's TOWR-style formulation
(end_effector_parametrization/quadruped_SRBM_eeParam.m:26-409 +
utilities_eeParam/*.m):

- base motion: N_base fixed-duration (0.2 s) segments of 5th-order
  polynomials for position and Euler angles (power basis, highest
  coefficient first — MATLAB `polyval` convention);
- per-leg force and foot-position cubic Hermite splines laid out by a
  static contact sequence (default [flight, stance] per leg,
  quadruped_SRBM_eeParam.m:40-44) with 3 force splines per stance phase and
  2 position splines per swing phase;
- **phase durations are decision variables** (sum == T per leg) — contact
  timing is optimized;
- SRBM dynamics enforced at fixed collocation times, with world-frame
  angular velocity/acceleration from Euler rates via BmatF / BmatF_dot
  (Winkler RAL-18 Appendix B; quadruped_SRBM_eeParam.m:371-372) and the
  legacy ZYX rotation convention.

XLA reformulation of the reference's `casadi low()` spline lookup
(SURVEY.md §7.3 hard-part #6): spline start times are smooth functions of
the duration variables, so at each fixed collocation time we evaluate every
spline of a leg and select branch-free with interval-membership masks —
identical semantics to `low()` (piecewise-constant index, index sensitivity
ignored), with static shapes.

Faithfulness notes: two apparent slips in the reference are normalized
here and cited: (a) the base angular-velocity continuity row compares a
linear-velocity end value against an angular-velocity start value
(quadruped_SRBM_eeParam.m:264 uses coef_lin where coef_ang is intended) —
we implement the intended angular-velocity continuity; (b) the friction
pyramid lower bound omits mu (":194-195") — we use the symmetric
0.71*mu*fz bound as everywhere else in the reference.

Flight force splines and the stance foot-position structure
([x 0 x 0], z = 0) are encoded as equality pins over a uniform coefficient
layout (the reference instead omits those variables), which keeps the
decision vector a fixed-shape array.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..dynamics.rotations import bmat_f, bmat_f_dot, rpy_to_rot_zyx
from ..models import srbm_constants


@dataclasses.dataclass(frozen=True)
class EEParamConfig:
    horizon: float = 0.8  # T_val (quadruped_SRBM_eeParam.m:28)
    dt_dyn: float = 0.1  # collocation spacing (:27)
    dt_base: float = 0.2  # base segment duration (:31)
    order_base: int = 5  # base polynomial order (:34)
    n_force_stance: int = 3  # force splines per stance phase (:50)
    n_posn_swing: int = 2  # posn splines per swing phase (:51)
    # default landing sequence: every leg starts in flight, lands once (:40-44)
    # -> per-leg phases [flight, stance]
    n_phases: int = 2
    min_phase: float = 0.01  # (:205)
    kin_box: tuple = (0.05, 0.05, 0.30)
    kin_box_z_offset: float = 0.05
    hip_srbm_location: tuple = (
        (0.19, -0.1, 0.0), (0.19, 0.1, 0.0), (-0.19, -0.1, 0.0), (-0.19, 0.1, 0.0)
    )
    reg: float = 1e-8  # tiny coefficient regularization (pure-feasibility NLP)

    @property
    def n_base(self) -> int:
        return int(round(self.horizon / self.dt_base))

    @property
    def n_colloc(self) -> int:
        return int(round(self.horizon / self.dt_dyn)) + 2  # N_timesteps+1 (:326)

    @property
    def n_force_splines(self) -> int:
        return 1 + self.n_force_stance  # flight (pinned 0) + stance splines

    @property
    def n_posn_splines(self) -> int:
        return self.n_posn_swing + 1  # swing splines + stance spline


def _register(cls):
    fields = [f.name for f in dataclasses.fields(cls)]
    jax.tree_util.register_pytree_node(
        cls,
        lambda obj: (tuple(getattr(obj, f) for f in fields), None),
        lambda aux, ch: cls(**dict(zip(fields, ch))),
    )
    return cls


@_register
@dataclasses.dataclass(frozen=True)
class EEParamParams:
    r_init: jnp.ndarray  # (3,)
    rdot_init: jnp.ndarray
    theta_init: jnp.ndarray
    thetadot_init: jnp.ndarray
    r_des: jnp.ndarray
    theta_des: jnp.ndarray
    horizon: jnp.ndarray  # scalar T
    mu: jnp.ndarray
    l_leg_max: jnp.ndarray
    f_max: jnp.ndarray
    mass: jnp.ndarray
    ib: jnp.ndarray  # (3,)
    ib_inv: jnp.ndarray


class EEParamVars(NamedTuple):
    base_lin: jnp.ndarray  # (n_base, 3, 6) power coefs, highest first
    base_ang: jnp.ndarray  # (n_base, 3, 6)
    durations: jnp.ndarray  # (4, n_phases)
    force: jnp.ndarray  # (4, n_force_splines, 3, 4) Hermite [x0 x0d x1 x1d]
    posn: jnp.ndarray  # (4, n_posn_splines, 3, 4)


def default_eeparam_params(dtype=jnp.float32) -> EEParamParams:
    """Reference parameter values (quadruped_SRBM_eeParam.m:412-447)."""
    mass, ib, ib_inv = srbm_constants("mc3D")
    f = lambda v: jnp.asarray(v, dtype)
    return EEParamParams(
        r_init=f([0, 0, 0.5]),
        rdot_init=f([0, 0, -1.0]),
        theta_init=f([0, 0, 0]),
        thetadot_init=f([0, 0, 0]),
        r_des=f([0, 0, 0.3]),
        theta_des=f([0, 0, 0]),
        horizon=f(0.8),
        mu=f(1.0),
        l_leg_max=f(0.35),
        f_max=f(250.0),
        mass=f(mass),
        ib=f(ib),
        ib_inv=f(ib_inv),
    )


def _polyval(coefs, t):
    """MATLAB polyval: coefs highest-order first; scalar t."""
    out = jnp.zeros_like(coefs[..., 0])
    for i in range(coefs.shape[-1]):
        out = out * t + coefs[..., i]
    return out


def _deriv(coefs):
    """Derivative coefficients (getDerivCoef.m)."""
    order = coefs.shape[-1] - 1
    mult = jnp.arange(order, 0, -1, dtype=coefs.dtype)
    return coefs[..., :-1] * mult


def _hermite_to_power(h, duration):
    """Hermite [x0, x0d, x1, x1d] -> power [a3 a2 a1 a0]
    (convertHermiteCoef.m:19-23)."""
    x0, x0d, x1, x1d = h[..., 0], h[..., 1], h[..., 2], h[..., 3]
    a0 = x0
    a1 = x0d
    a2 = -(duration**-2) * (3 * (x0 - x1) + duration * (2 * x0d + x1d))
    a3 = (duration**-3) * (2 * (x0 - x1) + duration * (x0d + x1d))
    return jnp.stack([a3, a2, a1, a0], axis=-1)


def _hermite_to_power_tau(h, duration):
    """Hermite -> power coefficients over NORMALIZED time tau = t/d in
    [0, 1]: p(tau) == polyval(_hermite_to_power(h, d), tau*d) exactly, but
    every coefficient is O(1) instead of O(d**-3) — the f32-safe form (the
    raw power basis loses the spline values to cancellation at d ~ 0.1)."""
    x0, x0d, x1, x1d = h[..., 0], h[..., 1], h[..., 2], h[..., 3]
    a0 = x0
    a1 = duration * x0d
    a2 = -(3 * (x0 - x1) + duration * (2 * x0d + x1d))
    a3 = 2 * (x0 - x1) + duration * (x0d + x1d)
    return jnp.stack([a3, a2, a1, a0], axis=-1)


class EEParamProblem:
    """Phase-based landing NLP as (cost, eq, ineq) over a flat z."""

    def __init__(self, config: EEParamConfig = EEParamConfig()):
        self.config = config
        c = config
        self._shapes = {
            "base_lin": (c.n_base, 3, c.order_base + 1),
            "base_ang": (c.n_base, 3, c.order_base + 1),
            "durations": (4, c.n_phases),
            "force": (4, c.n_force_splines, 3, 4),
            "posn": (4, c.n_posn_splines, 3, 4),
        }
        self.n_vars = int(sum(np.prod(s) for s in self._shapes.values()))

    # ------------------------------------------------------------- packing
    def pack(self, v: EEParamVars) -> jnp.ndarray:
        return jnp.concatenate([getattr(v, k).reshape(-1) for k in self._shapes])

    def unpack(self, z: jnp.ndarray) -> EEParamVars:
        out, off = {}, 0
        for k, s in self._shapes.items():
            n = int(np.prod(s))
            out[k] = z[off : off + n].reshape(s)
            off += n
        return EEParamVars(**out)

    def initial_guess(self, theta: EEParamParams) -> jnp.ndarray:
        """Ballistic-informed initial guess (round 5).

        The original guess encoded a constant-position base per segment
        (linear z interp in the a0 slots only) with 50/50 phase
        durations — dynamically impossible during the flight phase, the
        same failure mode the srbm family's linspace guess had (its
        ballistic replacement measured +38% converged/s there).  Here
        the base z polynomials carry the exact ballistic arc until the
        predicted touchdown, then hold the target height, and the phase
        durations start at the predicted flight time instead of T/2.
        Everything is branch-free in theta (vmappable)."""
        c = self.config
        dtype = theta.r_init.dtype
        g = jnp.asarray(9.81, dtype)
        z0, vz0 = theta.r_init[2], theta.rdot_init[2]
        # touchdown: z0 + vz t - g t^2/2 == r_des_z  (clamped into (0, T))
        disc = jnp.maximum(vz0 * vz0 + 2.0 * g * (z0 - theta.r_des[2]), 0.0)
        t_td = jnp.clip((vz0 + jnp.sqrt(disc)) / g, 0.05, theta.horizon - 0.05)

        base_lin = jnp.zeros((c.n_base, 3, 6), dtype)
        db = jnp.asarray(c.dt_base, dtype)
        t_seg = jnp.arange(c.n_base, dtype=dtype) * db  # segment start times
        # ballistic z in physical segment-local time tau:
        #   z(t_seg + tau) = z(t_seg) + (vz0 - g t_seg) tau - g/2 tau^2
        z_at = z0 + vz0 * t_seg - 0.5 * g * t_seg * t_seg
        vz_at = vz0 - g * t_seg
        in_flight = t_seg < t_td  # segment starts airborne
        a0 = jnp.where(in_flight, z_at, theta.r_des[2])
        a1 = jnp.where(in_flight, vz_at, 0.0)
        a2 = jnp.where(in_flight, -0.5 * g, 0.0)
        base_lin = base_lin.at[:, 2, 5].set(a0)
        base_lin = base_lin.at[:, 2, 4].set(a1)
        base_lin = base_lin.at[:, 2, 3].set(a2)
        # xy: constant at the initial position with the initial velocity
        # decaying over the horizon
        for ax in (0, 1):
            base_lin = base_lin.at[:, ax, 5].set(theta.r_init[ax])
        base_ang = jnp.zeros((c.n_base, 3, 6), dtype)
        base_ang = base_ang.at[:, :, 5].set(theta.theta_init[None, :])
        # phase durations: [flight ~ t_td, stance = T - t_td] per leg
        durations = jnp.stack(
            [jnp.full(4, t_td, dtype), jnp.full(4, theta.horizon - t_td, dtype)],
            axis=1,
        )
        force = jnp.zeros((4, c.n_force_splines, 3, 4), dtype)
        # stance force guess: support weight
        fz = theta.mass * 9.81 / 4.0
        force = force.at[:, 1:, 2, 0].set(fz).at[:, 1:, 2, 2].set(fz)
        posn = jnp.zeros((4, c.n_posn_splines, 3, 4), dtype)
        hips = jnp.asarray(c.hip_srbm_location, dtype)
        for ax in (0, 1):
            posn = posn.at[:, :, ax, 0].set(hips[:, ax][:, None])
            posn = posn.at[:, :, ax, 2].set(hips[:, ax][:, None])
        return self.pack(
            EEParamVars(base_lin=base_lin, base_ang=base_ang, durations=durations,
                        force=force, posn=posn)
        )

    # ------------------------------------------------- spline bookkeeping
    def _spline_durations(self, durations_leg):
        """Per-leg spline durations for force and posn spline chains.

        sequence = [flight, stance]: force chain = [d0, d1/3, d1/3, d1/3];
        posn chain = [d0/2, d0/2, d1] (quadruped_SRBM_eeParam.m:85-104).
        """
        c = self.config
        d0, d1 = durations_leg[0], durations_leg[1]
        fdur = jnp.concatenate(
            [d0[None], jnp.full((c.n_force_stance,), 1.0, d0.dtype) * d1 / c.n_force_stance]
        )
        pdur = jnp.concatenate(
            [jnp.full((c.n_posn_swing,), 1.0, d0.dtype) * d0 / c.n_posn_swing, d1[None]]
        )
        return fdur, pdur

    def _eval_chain(self, coefs, chain_durs, t):
        """Branch-free spline-chain evaluation at global time t.

        coefs: (n_splines, 3, 4) Hermite; chain_durs: (n_splines,).  The
        start times are cumsum(durations) — smooth in z; index selection by
        interval masks (the `low()` equivalent).
        """
        starts = jnp.concatenate([jnp.zeros(1, chain_durs.dtype), jnp.cumsum(chain_durs)])
        n = coefs.shape[0]
        vals = []
        for i in range(n):
            # normalized local time: f32-safe (see _hermite_to_power_tau)
            tl = (t - starts[i]) / jnp.maximum(chain_durs[i], 1e-4)
            p = _hermite_to_power_tau(coefs[i], chain_durs[i])  # (3,4)
            vals.append(_polyval(p, tl))
        vals = jnp.stack(vals)  # (n, 3)
        # membership mask; last interval catches t == T (<= upper bound)
        lo = starts[:-1]
        hi = starts[1:]
        in_i = (t >= lo) & (t < hi)
        in_i = in_i.at[-1].set(t >= lo[-1])
        w = in_i.astype(coefs.dtype)
        w = w / jnp.maximum(jnp.sum(w), 1.0)
        return jnp.einsum("i,ij->j", w, vals)

    def _base_at(self, v: EEParamVars, t):
        """Base position/orientation and derivatives at global time t.

        The 0.2 s base grid is fixed, so the segment index is static.
        """
        c = self.config
        idx = min(int(t / c.dt_base), c.n_base - 1)
        tau = t - idx * c.dt_base
        lin = v.base_lin[idx]
        ang = v.base_ang[idx]
        return self._base_eval(lin, ang, tau)

    def _base_at_t(self, v: EEParamVars, t):
        """Traced-time variant: segment by clipped floor-divide (fixed grid)."""
        c = self.config
        idx = jnp.clip((t / c.dt_base).astype(jnp.int32), 0, c.n_base - 1)
        tau = t - idx.astype(t.dtype) * c.dt_base
        lin = v.base_lin[idx]
        ang = v.base_ang[idx]
        return self._base_eval(lin, ang, tau)

    def _base_eval(self, lin, ang, tau):
        """Coefficients live over PHYSICAL local segment time
        tau = t - idx*dt_base in [0, dt_base] (the reference's basis,
        quadruped_SRBM_eeParam.m:61-70), so _polyval/_deriv give physical
        values/derivatives directly — no chain-rule factors anywhere in the
        initial/continuity/dynamics rows.  (The per-leg Hermite splines DO
        use a normalized basis — _hermite_to_power_tau — because their
        durations are decision variables; the base grid is fixed, and at
        dt_base=0.2 the physical power basis stays well-conditioned in f32.)
        """
        r = _polyval(lin, tau)
        rd = _polyval(_deriv(lin), tau)
        rdd = _polyval(_deriv(_deriv(lin)), tau)
        th = _polyval(ang, tau)
        thd = _polyval(_deriv(ang), tau)
        thdd = _polyval(_deriv(_deriv(ang)), tau)
        return r, rd, rdd, th, thd, thdd

    # ------------------------------------------------------------ residuals
    def check_params(self, theta: EEParamParams) -> None:
        """Guard the half-static horizon: the *static* config horizon fixes
        the base-poly grid and collocation times (dt_base/dt_dyn multiples,
        :356/:408) while the *runtime* theta.horizon drives the
        duration-sum equality (:314).  If they disagree, dynamics would be
        silently enforced on the wrong time grid — refuse instead.  Call
        this host-side before jitting a solve with a custom theta."""
        t = float(jax.device_get(theta.horizon))
        if abs(t - self.config.horizon) > 1e-6:
            raise ValueError(
                f"theta.horizon={t} != static config.horizon="
                f"{self.config.horizon}; rebuild the problem with "
                f"EEParamConfig(horizon={t}) instead of overriding theta"
            )

    def cost(self, z, theta: EEParamParams):
        return self.config.reg * jnp.sum(z * z)

    def eq(self, z, theta: EEParamParams):
        c = self.config
        v = self.unpack(z)
        rows = []

        # structure pins: flight force spline == 0 (spline 0 of each leg)
        rows.append(v.force[:, 0].reshape(-1))
        # stance posn spline (last): [x 0 x 0] in x,y; z all zero
        stance = v.posn[:, -1]  # (4,3,4)
        rows.append(stance[:, :2, 1].reshape(-1))  # x0d = 0
        rows.append(stance[:, :2, 3].reshape(-1))  # x1d = 0
        rows.append((stance[:, :2, 2] - stance[:, :2, 0]).reshape(-1))  # x1 == x0
        rows.append(stance[:, 2].reshape(-1))  # z == 0

        # phase durations sum to T per leg (:204)
        rows.append(jnp.sum(v.durations, axis=1) - theta.horizon)

        # initial state (:231-238): the constant/linear slots of segment 0
        # ARE the physical value/derivatives (physical-time basis)
        db = c.dt_base
        lin0, ang0 = v.base_lin[0], v.base_ang[0]
        rows.append(lin0[:, 5] - theta.r_init)
        rows.append(_deriv(lin0)[:, 4] - theta.rdot_init)
        rows.append(ang0[:, 5] - theta.theta_init)
        rows.append(_deriv(ang0)[:, 4] - theta.thetadot_init)
        rows.append(
            _deriv(_deriv(lin0))[:, 3]
            - jnp.asarray([0, 0, -9.81], z.dtype)
        )  # initial accel = gravity (:238)

        # terminal (:241-253): z position, orientation, zero linear
        # velocity — evaluated at local time dt_base (the segment end)
        linN, angN = v.base_lin[-1], v.base_ang[-1]
        rows.append((_polyval(linN, db)[2] - theta.r_des[2])[None])
        rows.append(_polyval(angN, db) - theta.theta_des)
        rows.append(_polyval(_deriv(linN), db))

        # base continuity (:257-283): pos/ang/vel/angvel/acc/angacc —
        # segment i's polynomials at local time dt_base against segment
        # i+1's value/derivative slots at local time 0
        for i in range(c.n_base - 1):
            a, b = v.base_lin[i], v.base_lin[i + 1]
            aa, bb = v.base_ang[i], v.base_ang[i + 1]
            rows.append(_polyval(a, db) - b[:, 5])
            rows.append(_polyval(aa, db) - bb[:, 5])
            rows.append(_polyval(_deriv(a), db) - _deriv(b)[:, 4])
            # intended angular-velocity continuity (the reference file
            # compares coef_lin against coef_ang here, :264 — a slip)
            rows.append(_polyval(_deriv(aa), db) - _deriv(bb)[:, 4])
            rows.append(_polyval(_deriv(_deriv(a)), db) - _deriv(_deriv(b))[:, 3])
            rows.append(_polyval(_deriv(_deriv(aa)), db) - _deriv(_deriv(bb))[:, 3])

        # Hermite chain continuity (:287-305): value and derivative
        for arr in (v.force, v.posn):
            prev = arr[:, :-1]
            nxt = arr[:, 1:]
            rows.append((prev[..., 2] - nxt[..., 0]).reshape(-1))
            rows.append((prev[..., 3] - nxt[..., 1]).reshape(-1))

        # dynamics at collocation times (:326-409), vmapped over the grid
        ts = jnp.minimum(
            jnp.arange(c.n_colloc, dtype=z.dtype) * c.dt_dyn, c.horizon
        )

        def dyn_rows(t):
            r, rd, rdd, th, thd, thdd = self._base_at_t(v, t)
            omega = bmat_f(th) @ thd
            omega_dot = bmat_f_dot(th, thd) @ thd + bmat_f(th) @ thdd
            R_w2b = rpy_to_rot_zyx(th).T
            fk = jnp.stack([
                self._eval_chain(v.force[leg], self._spline_durations(v.durations[leg])[0], t)
                for leg in range(4)
            ])
            pk = jnp.stack([
                self._eval_chain(v.posn[leg], self._spline_durations(v.durations[leg])[1], t)
                for leg in range(4)
            ])
            rddot = jnp.sum(fk, axis=0) / theta.mass + jnp.asarray([0, 0, -9.81], z.dtype)
            tau_w = jnp.sum(jax.vmap(jnp.cross)(pk - r, fk), axis=0)
            om_b = R_w2b @ omega
            omdot = theta.ib_inv * (R_w2b @ tau_w - jnp.cross(om_b, theta.ib * om_b))
            return jnp.concatenate([rdd - rddot, R_w2b @ omega_dot - omdot])

        rows.append(jax.vmap(dyn_rows)(ts).reshape(-1))
        return jnp.concatenate(rows)

    def ineq(self, z, theta: EEParamParams):
        c = self.config
        v = self.unpack(z)
        rows = []
        # stance force spline endpoint bounds + friction at nodes (:188-196)
        st = v.force[:, 1:]  # (4, n_stance, 3, 4)
        fz0 = st[..., 2, 0]
        fz1 = st[..., 2, 2]
        fx0 = st[..., 0, 0]
        fy0 = st[..., 1, 0]
        lim = 0.71 * theta.mu * fz0
        rows += [
            fz0.reshape(-1),
            fz1.reshape(-1),
            (theta.f_max - fz1).reshape(-1),
            (lim - fx0).reshape(-1),
            (fx0 + lim).reshape(-1),
            (lim - fy0).reshape(-1),
            (fy0 + lim).reshape(-1),
        ]
        # phase duration bounds (:205)
        rows.append((v.durations - c.min_phase).reshape(-1))
        rows.append((theta.horizon - v.durations).reshape(-1))
        # kinematic boxes at collocation times (:390-404), vmapped
        hips = jnp.asarray(c.hip_srbm_location, z.dtype)
        kx, ky, kz = c.kin_box
        ts = jnp.minimum(
            jnp.arange(c.n_colloc, dtype=z.dtype) * c.dt_dyn, c.horizon
        )

        def box_rows(t):
            r, _, _, th, _, _ = self._base_at_t(v, t)
            R_b2w = rpy_to_rot_zyx(th)
            out = []
            for leg in range(4):
                pdur = self._spline_durations(v.durations[leg])[1]
                p = self._eval_chain(v.posn[leg], pdur, t)
                p_rel = p - (r + R_b2w @ hips[leg])
                zoff = p_rel[2] + c.kin_box_z_offset
                out.append(
                    jnp.stack(
                        [
                            kx - p_rel[0], p_rel[0] + kx,
                            ky - p_rel[1], p_rel[1] + ky,
                            -zoff, zoff + kz,
                            theta.l_leg_max**2 - p_rel @ p_rel,
                        ]
                    )
                )
            return jnp.concatenate(out)

        rows.append(jax.vmap(box_rows)(ts).reshape(-1))
        return jnp.concatenate(rows)

    def relax_mask(self):
        g = self.ineq(
            jnp.zeros(self.n_vars) + 0.1, default_eeparam_params(jnp.float32)
        )
        return jnp.zeros(g.shape[0])


def eeparam_problem(config: EEParamConfig | None = None) -> EEParamProblem:
    return EEParamProblem(config or EEParamConfig())
