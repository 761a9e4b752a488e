"""Variational (error-state) dynamics and Riccati value function.

TPU-native re-derivation of the reference's VBL pipeline
(srbm-utilities/generateVariationalDynamics.m:1-62,
generateRiccatiIntegrator.m:1-63, driver quadruped_SRBM_NLP.m:428-566):

- 24-state error dynamics (delta_p, delta_eta, delta_omega, delta_v,
  delta_pf) of the SRBM linearized about a reference (x_ref, f_ref).  Where
  the reference builds symbolic Jacobians with CasADi SX, we write the
  continuous error-state derivative directly in jnp and get A, B via
  `jax.jacfwd` — same math, autodiff instead of symbolic diff.
- Continuous-time Riccati differential equation
  Pdot = A'P + PA - P B R^-1 B' P + Q integrated backward (Euler, matching
  the reference's RDE_step which keeps only the k1 term,
  generateRiccatiIntegrator.m:55) and forward (RK4) along an optimized
  trajectory via `lax.scan` — the sequential sweep the reference does in a
  MATLAB loop.

The backward sweep is the structural ancestor of the Riccati-style KKT
factorization used by the structured solver path (SURVEY.md §5).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..dynamics.rotations import rpy_to_rot_zyx, skew
from ..models import srbm_constants

NUM_STATES = 24
NUM_CONTROL = 12


def error_state_xdot(delta_x, delta_f, x_ref, f_ref, mass, ib, ib_inv):
    """Continuous error-state derivative (generateVariationalDynamics.m:31-52).

    delta_x (24,): [dp(3), deta(3), domega(3), dv(3), dpf(12)];
    delta_f (12,); x_ref (24,): [p, rpy, omega, v, pf(12)];
    f_ref (12,).  ib: (3,3) body inertia (full matrix), ib_inv its inverse.
    Note the reference uses the legacy ZYX rotation here
    (generateVariationalDynamics.m:33).
    """
    p, rpy, omega = x_ref[0:3], x_ref[3:6], x_ref[6:9]
    pf = x_ref[12:24].reshape(4, 3)
    f = f_ref.reshape(4, 3)
    dp, deta, domega, dv = (
        delta_x[0:3],
        delta_x[3:6],
        delta_x[6:9],
        delta_x[9:12],
    )
    dpf = delta_x[12:24].reshape(4, 3)
    df = delta_f.reshape(4, 3)

    R = rpy_to_rot_zyx(rpy)  # body-to-world (rpyToRotMat(rpy)' in MATLAB)
    Rt = R.T

    dp_dot = dv
    deta_dot = -skew(omega) @ deta + domega

    # t1: orientation sensitivity of the body-frame contact torque
    tau_body = jnp.sum(jax.vmap(lambda pfi, fi: Rt @ jnp.cross(pfi - p, fi))(pf, f), axis=0)
    t1 = skew(tau_body) @ deta
    # t2: foot-position, CoM-position and force sensitivities (world frame)
    t2a = -jnp.sum(jax.vmap(lambda fi, dpfi: jnp.cross(fi, dpfi))(f, dpf), axis=0)
    t2b = jnp.cross(jnp.sum(f, axis=0), dp)
    t2c = jnp.sum(jax.vmap(lambda pfi, dfi: jnp.cross(pfi - p, dfi))(pf, df), axis=0)
    # t3: gyroscopic terms
    t3 = skew(ib @ omega) @ domega - skew(omega) @ (ib @ domega)
    domega_dot = ib_inv @ (t1 + Rt @ (t2a + t2b + t2c) + t3)

    dv_dot = jnp.sum(df, axis=0) / mass
    # small stabilizing decay on the foot-position error states
    dpf_dot = -1e-5 * dpf

    return jnp.concatenate([dp_dot, deta_dot, domega_dot, dv_dot, dpf_dot.reshape(-1)])


def variational_dynamics(x_ref, f_ref, robot: str = "mc3D"):
    """(A, B) linearized error dynamics at (x_ref, f_ref).

    A = d(delta_xdot)/d(delta_x) (24x24), B = d/d(delta_f) (24x12) — the
    jnp/autodiff equivalent of the CasADi `Avbl`/`Bvbl` functions.
    """
    mass, ib_diag, _ = srbm_constants(robot)
    # the reference uses the FULL 3x3 composite inertia here
    from ..models import get_robot_model
    from ..models.model import composite_inertia_np

    model = get_robot_model(robot)
    ic = composite_inertia_np(model, model.q_home)
    ib = jnp.asarray(ic[:3, :3], x_ref.dtype)
    ib_inv = jnp.asarray(np.linalg.inv(ic[:3, :3]), x_ref.dtype)

    A = jax.jacfwd(
        lambda dx: error_state_xdot(dx, jnp.zeros(12, x_ref.dtype), x_ref, f_ref, mass, ib, ib_inv)
    )(jnp.zeros(NUM_STATES, x_ref.dtype))
    B = jax.jacfwd(
        lambda df: error_state_xdot(jnp.zeros(NUM_STATES, x_ref.dtype), df, x_ref, f_ref, mass, ib, ib_inv)
    )(jnp.zeros(NUM_CONTROL, x_ref.dtype))
    return A, B


def _pdot(P, A, B, Q, R_inv):
    return A.T @ P + P @ A - P @ B @ (R_inv @ (B.T @ P)) + Q


def riccati_step_backward(P, x_ref, f_ref, Q, R, dt, robot: str = "mc3D"):
    """One backward Euler RDE step (the reference's RDE_step keeps only k1,
    generateRiccatiIntegrator.m:50-55): P_{k-1} = P_k + dt * Pdot(P_k)."""
    A, B = variational_dynamics(x_ref, f_ref, robot)
    R_inv = jnp.linalg.inv(R)
    return P + dt * _pdot(P, A, B, Q, R_inv)


def riccati_step_forward(P, x_ref, f_ref, Q, R, dt, robot: str = "mc3D"):
    """One forward RK4 RDE step (generateRiccatiIntegrator.m:58-63)."""
    A, B = variational_dynamics(x_ref, f_ref, robot)
    R_inv = jnp.linalg.inv(R)
    f = lambda P_: -_pdot(P_, A, B, Q, R_inv)
    k1 = f(P)
    k2 = f(P + dt / 2 * k1)
    k3 = f(P + dt / 2 * k2)
    k4 = f(P + dt * k3)
    return P + dt * (k1 + 2 * k2 + 2 * k3 + k4) / 6


def default_vbl_weights(dtype=jnp.float64):
    """The reference's F, Q, R weight matrices (quadruped_SRBM_NLP.m:439-487)."""
    F = np.zeros((NUM_STATES, NUM_STATES))
    np.fill_diagonal(F[:12, :12], [1, 1, 1, 5, 5, 5, 4, 4, 4, 3, 3, 3])
    Q = np.zeros((NUM_STATES, NUM_STATES))
    np.fill_diagonal(Q[:12, :12], [0.25, 0.25, 0.25, 1, 1, 1, 0.5, 0.5, 0.5, 1, 1, 1])
    R = np.diag(np.full(NUM_CONTROL, 90.0))
    return jnp.asarray(F, dtype), jnp.asarray(Q, dtype), jnp.asarray(R, dtype)


def riccati_value_function(
    X_star,
    U_star,
    t_star,
    F=None,
    Q=None,
    R=None,
    dt_riccati: float = 0.022,
    horizon: float | None = None,
    robot: str = "mc3D",
):
    """Time-varying value function P(t) along an optimized trajectory.

    Backward sweep of the RDE from terminal weight F, sampling the
    trajectory by linear interpolation exactly as the reference driver
    (quadruped_SRBM_NLP.m:495-513), as one `lax.scan`.  Returns
    (P (N_riccati, 24, 24), P_fwd consistency sweep).
    """
    dtype = X_star.dtype
    if F is None:
        F_, Q_, R_ = default_vbl_weights(dtype)
    else:
        F_, Q_, R_ = F, Q, R
    T = float(t_star[-1]) if horizon is None else horizon
    n_ric = int(round(T / dt_riccati)) + 1

    def sample(t):
        # piecewise-linear interp of [X(1:12); pf] on the knot grid; ZOH force
        xk = jnp.stack(
            [jnp.interp(t, t_star, X_star[:, i]) for i in range(12)]
            + [jnp.interp(t, t_star[:-1], U_star[:, i]) for i in range(12)]
        )
        k = jnp.clip(jnp.searchsorted(t_star, t) - 1, 0, U_star.shape[0] - 1)
        return xk, U_star[k, 12:24]

    ts = jnp.arange(n_ric, dtype=dtype) * dt_riccati

    def bwd(P, t):
        x_ref, f_ref = sample(t)
        P_new = riccati_step_backward(P, x_ref, f_ref, Q_, R_, dt_riccati, robot)
        return P_new, P_new

    _, Ps = jax.lax.scan(bwd, F_, ts[1:][::-1])
    P_traj = jnp.concatenate([Ps[::-1], F_[None]], axis=0)

    def fwd(P, t):
        x_ref, f_ref = sample(t)
        P_new = riccati_step_forward(P, x_ref, f_ref, Q_, R_, dt_riccati, robot)
        return P_new, P_new

    _, Ps_f = jax.lax.scan(fwd, P_traj[0], ts[:-1])
    P_fwd = jnp.concatenate([P_traj[:1], Ps_f], axis=0)
    return P_traj, P_fwd
