"""Single-rigid-body-model (SRBM) dynamics for quadruped landing.

State x (12): [r(3) world position, rpy(3), omega(3) BODY frame,
v(3) WORLD frame] — exactly the reference's state layout
(quadruped_SRBM_NLP.m:38-41, SURVEY.md Appendix B).

Controls u (24): [c(12) world-frame foot positions, f(12) world-frame GRFs].

Continuous dynamics (landing_optimization.m:116-128):
    v_dot     = (1/m) * sum_i f_i + g
    omega_dot = Ib^{-1} ( R_w2b * sum_i (c_i - r) x f_i  -  omega x Ib omega )
    r_dot     = v
    rpy_dot   = Binv(rpy) @ (R_b2w @ omega)

Integration is forward Euler with per-knot dt, as defect constraints
(landing_optimization.m:125-128).
"""

from __future__ import annotations

import jax.numpy as jnp

from .rotations import binv, rpy_to_rot_xyz

GRAVITY = (0.0, 0.0, -9.81)


def split_state(x):
    """x (12,) -> (r, rpy, omega_body, v_world)."""
    return x[0:3], x[3:6], x[6:9], x[9:12]


def split_control(u):
    """u (24,) -> (c (4,3) world foot positions, f (4,3) world GRFs)."""
    return u[:12].reshape(4, 3), u[12:].reshape(4, 3)


def srbm_xdot(x, u, mass, ib_diag, ib_inv_diag):
    """Continuous-time SRBM state derivative (12,).

    mass: scalar; ib_diag / ib_inv_diag: (3,) diagonal body inertia and its
    inverse — the reference passes both separately as NLP parameters
    (landing_optimization.m:77-78) and we keep that contract.
    """
    r, rpy, omega, v = split_state(x)
    c, f = split_control(u)
    R_b2w = rpy_to_rot_xyz(rpy)
    R_w2b = R_b2w.T

    g = jnp.asarray(GRAVITY, dtype=x.dtype)
    v_dot = jnp.sum(f, axis=0) / mass + g

    # world-frame contact torque about the CoM
    tau_world = jnp.sum(jnp.cross(c - r, f), axis=0)
    omega_dot = ib_inv_diag * (R_w2b @ tau_world - jnp.cross(omega, ib_diag * omega))

    r_dot = v
    rpy_dot = binv(rpy) @ (R_b2w @ omega)
    return jnp.concatenate([r_dot, rpy_dot, omega_dot, v_dot])


def euler_defect(x_k, x_kp1, u_k, dt_k, mass, ib_diag, ib_inv_diag):
    """Forward-Euler dynamics defect (12,): x_{k+1} - x_k - xdot(x_k,u_k)*dt.

    Zero at a dynamically-consistent trajectory; the exact discretization of
    landing_optimization.m:125-128 (all four blocks are explicit Euler in the
    knot-k derivative).
    """
    return x_kp1 - x_k - srbm_xdot(x_k, u_k, mass, ib_diag, ib_inv_diag) * dt_k


def rollout(x0, U, dts, mass, ib_diag, ib_inv_diag):
    """Open-loop forward-Euler rollout: x0 (12,), U (N-1,24), dts (N-1,).

    Returns X (N,12).  Used for ballistic reference generation and tests.
    """
    import jax

    def step(x, inp):
        u, dt = inp
        x_next = x + srbm_xdot(x, u, mass, ib_diag, ib_inv_diag) * dt
        return x_next, x_next

    _, xs = jax.lax.scan(step, x0, (U, dts))
    return jnp.concatenate([x0[None], xs], axis=0)
