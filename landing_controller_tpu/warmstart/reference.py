"""Reference trajectories, default parameters, and scenario sampling.

Ports the parameter/reference construction of the two landing NLPs:

- kinodynamic production values: landing_optimization.m:203-297
- SRBM-LCP warm-start values: generate_landingCtrller_IPOPT_warmstart.m:168-225

plus the random drop-condition sampler and initial-height rule of the
training-data factory (generate_training_data_automated.m:36-60).

Everything returns jnp arrays inside a LandingParams pytree so a single
jitted solve serves any scenario (parameterize-don't-recompile).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..dynamics.rotations import rpy_to_rot_xyz
from ..models import srbm_constants
from ..problems.landing import LandingParams

# per-leg xyz sign convention for nominal foot offsets
# (landing_optimization.m:205: sideSign = [1 -1 1, 1 1 1, -1 -1 1, -1 1 1])
FOOT_SIGN = np.array(
    [[1, -1, 1], [1, 1, 1], [-1, -1, 1], [-1, 1, 1]], dtype=np.float64
)

# production dt schedule (landing_optimization.m:28)
DT_PRODUCTION = np.array([0.05] + [0.02] * 15 + [0.05, 0.05, 0.1, 0.2])

HIP_SRBM = np.array(
    [[0.19, -0.1, 0.0], [0.19, 0.1, 0.0], [-0.19, -0.1, 0.0], [-0.19, 0.1, 0.0]]
)


def kin_box_limits(v, direction: str):
    """Velocity-scaled kinematic-box widening (kin_box_limits.m:1-21)."""
    v_max = 2.0
    box_max = 0.15 if direction == "x" else 0.25
    return jnp.minimum(jnp.abs(v) * (box_max / v_max), box_max)


def _linspace_refs(q_init, qd_init, q_term_ref, qd_term_ref, n):
    """State reference: per-dim linspace from init to terminal ref
    (landing_optimization.m:263-266)."""
    w = jnp.linspace(0.0, 1.0, n, dtype=q_init.dtype)[:, None]
    q_ref = q_init[None, :] * (1 - w) + q_term_ref[None, :] * w
    qd_ref = qd_init[None, :] * (1 - w) + qd_term_ref[None, :] * w
    return jnp.concatenate([q_ref, qd_ref], axis=1)  # (n, 12)


def kinodynamic_params(q_init, qd_init, n_knots: int = 21, robot: str = "mc3D"):
    """Production kinodynamic parameter set (landing_optimization.m:203-297).

    q_init: (6,) initial pose (z is overwritten by the hip-clearance rule
    only in `sample_drop_scenario` — here it is taken as given);
    qd_init: (6,) [omega_body(3), v_world(3)].
    """
    dtype = q_init.dtype
    n = n_knots
    mass, ib, ib_inv = srbm_constants(robot)
    dt = jnp.asarray(DT_PRODUCTION, dtype) if n == 21 else jnp.full(n - 1, 0.6 / (n - 1), dtype)

    q_term_ref = jnp.asarray([0, 0, 0.25, 0, 0, 0], dtype)
    qd_term_ref = jnp.zeros(6, dtype)
    x_ref = _linspace_refs(q_init, qd_init, q_term_ref, qd_term_ref, n)

    # nominal foot offsets rotated by the reference orientation at each knot
    # (landing_optimization.m:272-277)
    c_ref = jnp.asarray(FOOT_SIGN * np.array([0.2, 0.2, -0.3]), dtype)  # (4,3)
    R_ref = rpy_to_rot_xyz(x_ref[:-1, 3:6])  # (n-1,3,3)
    c_knots = x_ref[:-1, None, 0:3] + jnp.einsum("kij,lj->kli", R_ref, c_ref)
    u_ref = jnp.concatenate(
        [c_knots.reshape(n - 1, 12), jnp.zeros((n - 1, 12), dtype)], axis=1
    )

    # initial foot positions (landing_optimization.m:233-238)
    p_rel0 = jnp.asarray(FOOT_SIGN * np.array([0.2, 0.15, -0.3]), dtype)
    R0 = rpy_to_rot_xyz(q_init[3:6])
    c_init = (q_init[0:3] + p_rel0 @ R0.T).reshape(12)

    # velocity-scaled kin box from the body-frame linear velocity
    # (landing_optimization.m:249-251)
    v_body = R0.T @ qd_init[3:6]
    kin_box = jnp.stack([kin_box_limits(v_body[0], "x"), kin_box_limits(v_body[1], "y")])

    return LandingParams(
        x_ref=x_ref,
        u_ref=u_ref,
        dt=dt,
        q_init=q_init,
        qd_init=qd_init,
        c_init=c_init,
        q_min=jnp.asarray([-10, -10, 0.075, -10, -10, -10], dtype),
        q_max=jnp.asarray([10, 10, 1.0, 10, 10, 10], dtype),
        qd_min=jnp.asarray([-10, -10, -10, -40, -40, -40], dtype),
        qd_max=jnp.asarray([10, 10, 10, 40, 40, 40], dtype),
        q_term_min=jnp.asarray([-10, -10, 0.15, -0.1, -0.1, -10], dtype),
        q_term_max=jnp.asarray([10, 10, 5, 0.1, 0.1, 10], dtype),
        qd_term_min=jnp.asarray([-10, -10, -10, -0.5, -0.5, -0.5], dtype),
        qd_term_max=jnp.asarray([10, 10, 10, 0.5, 0.5, 0.5], dtype),
        qn=jnp.asarray([0, 0, 100, 10, 10, 0, 10, 10, 10, 10, 10, 10], dtype),
        jpos_min=jnp.asarray(np.tile([-np.pi / 3, -np.pi / 2, 0.0], 4), dtype),
        jpos_max=jnp.asarray(np.tile([np.pi / 3, np.pi / 2, 3 * np.pi / 4], 4), dtype),
        kin_box=kin_box,
        mu=jnp.asarray(0.75, dtype),
        l_leg_max=jnp.asarray(0.4, dtype),
        f_max=jnp.asarray(300.0, dtype),
        mass=jnp.asarray(mass, dtype),
        ib=jnp.asarray(ib, dtype),
        ib_inv=jnp.asarray(ib_inv, dtype),
    )


def srbm_lcp_params(q_init, qd_init, n_knots: int = 21, horizon: float = 0.6, robot: str = "mc3D"):
    """SRBM-LCP warm-start NLP parameter set
    (generate_landingCtrller_IPOPT_warmstart.m:168-225)."""
    dtype = q_init.dtype
    n = n_knots
    mass, ib, ib_inv = srbm_constants(robot)
    dt = jnp.full(n - 1, horizon / (n - 1), dtype)

    q_term_ref = jnp.asarray([0, 0, 0.275, 0, 0, 0], dtype)
    qd_term_ref = jnp.zeros(6, dtype)
    x_ref = _linspace_refs(q_init, qd_init, q_term_ref, qd_term_ref, n)

    # foot reference: CoM reference + fixed offset, unrotated
    # (generate_landingCtrller_IPOPT_warmstart.m:205-206)
    c_ref = jnp.asarray((FOOT_SIGN * np.array([0.2, 0.1, -0.2])).reshape(12), dtype)
    c_knots = jnp.tile(x_ref[:-1, 0:3], (1, 4)) + c_ref[None, :]
    u_ref = jnp.concatenate([c_knots, jnp.zeros((n - 1, 12), dtype)], axis=1)

    return LandingParams(
        x_ref=x_ref,
        u_ref=u_ref,
        dt=dt,
        q_init=q_init,
        qd_init=qd_init,
        c_init=c_knots[0],  # unused by the srbm problem (no c_init equality)
        q_min=jnp.asarray([-10, -10, 0.1, -10, -10, -10], dtype),
        q_max=jnp.asarray([10, 10, 1.0, 10, 10, 10], dtype),
        qd_min=jnp.asarray([-10, -10, -10, -40, -40, -40], dtype),
        qd_max=jnp.asarray([10, 10, 10, 40, 40, 40], dtype),
        q_term_min=jnp.asarray([-10, -10, 0.2, -0.1, -0.1, -10], dtype),
        q_term_max=jnp.asarray([10, 10, 5, 0.1, 0.1, 10], dtype),
        qd_term_min=jnp.asarray([-10, -10, -10, -40, -40, -40], dtype),
        qd_term_max=jnp.asarray([10, 10, 10, 40, 40, 40], dtype),
        qn=jnp.asarray([0, 0, 100, 100, 100, 0, 10, 10, 10, 10, 10, 10], dtype),
        jpos_min=jnp.asarray(np.tile([-np.pi / 3, -np.pi / 2, 0.0], 4), dtype),
        jpos_max=jnp.asarray(np.tile([np.pi / 3, np.pi / 2, 3 * np.pi / 4], 4), dtype),
        kin_box=jnp.zeros(2, dtype),
        mu=jnp.asarray(1.0, dtype),
        l_leg_max=jnp.asarray(0.35, dtype),
        f_max=jnp.asarray(200.0, dtype),
        mass=jnp.asarray(mass, dtype),
        ib=jnp.asarray(ib, dtype),
        ib_inv=jnp.asarray(ib_inv, dtype),
    )


def ccc_params(q_init, qd_init, n_knots: int = 41, horizon: float = 0.6, robot: str = "mc3D"):
    """Contact-implicit CCC envelope NLP parameters
    (generate_solver/generate_quadruped_SRBM_CCC.m:192-223)."""
    import dataclasses

    dtype = q_init.dtype
    base = srbm_lcp_params(q_init, qd_init, n_knots=n_knots, horizon=horizon, robot=robot)
    n = n_knots
    q_term_ref = jnp.asarray([0, 0, 0.2, 0, 0, 0], dtype)
    x_ref = _linspace_refs(q_init, qd_init, q_term_ref, jnp.zeros(6, dtype), n)
    c_ref = jnp.asarray((FOOT_SIGN * np.array([0.2, 0.1, -0.2])).reshape(12), dtype)
    c_knots = jnp.tile(x_ref[:-1, 0:3], (1, 4)) + c_ref[None, :]
    u_ref = jnp.concatenate([c_knots, jnp.zeros((n - 1, 12), dtype)], axis=1)
    # feet start on the ground: offset [0.2, 0.1, -z0] from the CoM per leg
    # (generate_quadruped_SRBM_CCC.m:209-210) puts c_init_z at exactly 0
    xy = jnp.tile(q_init[0:3], 4) + jnp.asarray(
        (FOOT_SIGN * np.array([0.2, 0.1, 0.0])).reshape(12), dtype
    )
    c_init = xy.at[2::3].set(0.0)
    return dataclasses.replace(
        base,
        x_ref=x_ref,
        u_ref=u_ref,
        c_init=c_init,
        q_min=jnp.asarray([-10, -10, 0.15, -10, -10, -10], dtype),
        qn=jnp.asarray([0, 0, 100, 100, 100, 0, 10, 10, 10, 10, 10, 10], dtype),
        mu=jnp.asarray(1.0, dtype),
        l_leg_max=jnp.asarray(0.35, dtype),
        f_max=jnp.asarray(250.0, dtype),
        qx=jnp.zeros(12, dtype),
        qc=jnp.zeros(3, dtype),
        qf=jnp.asarray([1e-4, 1e-4, 1e-3], dtype),
    )


def default_contact_schedule(n_knots: int = 16, dtype=jnp.float32):
    """The reference's default landing schedule: 2 flight knots then full
    stance (quadruped_SRBM_NLP.m:33)."""
    cs = np.ones((n_knots - 1, 4))
    cs[:2] = 0.0
    return jnp.asarray(cs, dtype)


def contact_scheduled_params(q_init, qd_init, n_knots: int = 16, horizon: float = 0.5, robot: str = "mc3D"):
    """Contact-scheduled NLP parameters (quadruped_SRBM_NLP.m:186-247)."""
    import dataclasses

    dtype = q_init.dtype
    mass, ib, ib_inv = srbm_constants(robot)
    n = n_knots
    dt = jnp.full(n - 1, horizon / (n - 1), dtype)
    q_term_ref = jnp.asarray([0, 0, 0.2, 0, 0, 0], dtype)
    x_ref = _linspace_refs(q_init, qd_init, q_term_ref, jnp.zeros(6, dtype), n)
    c_ref = jnp.asarray((FOOT_SIGN * np.array([0.2, 0.1, -0.2])).reshape(12), dtype)
    c_knots = jnp.tile(x_ref[:-1, 0:3], (1, 4)) + c_ref[None, :]
    u_ref = jnp.concatenate([c_knots, jnp.zeros((n - 1, 12), dtype)], axis=1)
    c_init = jnp.tile(q_init[0:3], 4) + jnp.asarray(
        (FOOT_SIGN * np.array([0.2, 0.1, 0.0])).reshape(12), dtype
    )
    return LandingParams(
        x_ref=x_ref,
        u_ref=u_ref,
        dt=dt,
        q_init=q_init,
        qd_init=qd_init,
        c_init=c_init,
        q_min=jnp.asarray([-10, -10, 0.0, -10, -10, -10], dtype),
        q_max=jnp.asarray([10, 10, 0.4, 10, 10, 10], dtype),
        qd_min=jnp.asarray([-10, -10, -10, -40, -40, -40], dtype),
        qd_max=jnp.asarray([10, 10, 10, 40, 40, 40], dtype),
        q_term_min=jnp.asarray([-10, -10, 0.15, -0.1, -0.1, -10], dtype),
        q_term_max=jnp.asarray([10, 10, 5, 0.1, 0.1, 10], dtype),
        qd_term_min=jnp.asarray([-10, -10, -10, -40, -40, -40], dtype),
        qd_term_max=jnp.asarray([10, 10, 10, 40, 40, 40], dtype),
        qn=jnp.asarray([0, 0, 100, 10, 10, 100, 10, 10, 10, 10, 10, 10], dtype),
        jpos_min=jnp.asarray(np.tile([-np.pi / 3, -np.pi / 2, 0.0], 4), dtype),
        jpos_max=jnp.asarray(np.tile([np.pi / 3, np.pi / 2, 3 * np.pi / 4], 4), dtype),
        kin_box=jnp.zeros(2, dtype),
        mu=jnp.asarray(1.0, dtype),
        l_leg_max=jnp.asarray(0.3, dtype),
        f_max=jnp.asarray(200.0, dtype),
        mass=jnp.asarray(mass, dtype),
        ib=jnp.asarray(ib, dtype),
        ib_inv=jnp.asarray(ib_inv, dtype),
        qx=jnp.full(12, 10.0, dtype),
        qc=jnp.zeros(3, dtype),
        qf=jnp.asarray([1e-4, 1e-4, 1e-3], dtype),
        cs=default_contact_schedule(n_knots, dtype),
    )


def sample_drop_scenario(key, dtype=jnp.float32):
    """Random drop condition + hip-clearance initial height.

    Sampling ranges from the production driver (landing_optimization.m:207-218):
    roll,yaw ~ U(+-0.25), pitch ~ U(+-pi/3), omega ~ U(+-0.5),
    v_xy ~ U(+-1), v_z ~ -U(0.5, 5); then
    z0 = 0.35 + |min_leg hip_world_z| + |dt_0 * v_z|.
    Returns (q_init (6,), qd_init (6,)).
    """
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    roll = jax.random.uniform(k1, (), dtype, -0.25, 0.25)
    pitch = jax.random.uniform(k2, (), dtype, -jnp.pi / 3, jnp.pi / 3)
    yaw = jax.random.uniform(k3, (), dtype, -0.25, 0.25)
    omega = jax.random.uniform(k4, (3,), dtype, -0.5, 0.5)
    v = jax.random.uniform(k5, (3,), dtype, -1.0, 1.0)
    vz = -4.5 * jax.random.uniform(jax.random.fold_in(k5, 1), (), dtype) - 0.5
    v = v.at[2].set(vz)

    rpy = jnp.stack([roll, pitch, yaw])
    R = rpy_to_rot_xyz(rpy)
    hips_w = jnp.asarray(HIP_SRBM, dtype) @ R.T
    td_hip_z = jnp.abs(jnp.min(hips_w[:, 2]))
    z0 = 0.35 + td_hip_z + jnp.abs(DT_PRODUCTION[0] * vz)

    q_init = jnp.concatenate([jnp.stack([0.0, 0.0, z0]).astype(dtype), rpy])
    qd_init = jnp.concatenate([omega, v])
    return q_init, qd_init


def ballistic_guess(problem, theta: LandingParams):
    """Physics-informed cold-start guess.

    The reference's linspace guess (landing_optimization.m:263-266)
    decelerates from knot 0 — dynamically impossible pre-contact, and the
    dominant cold-start failure source for fast/steep drops.  This guess
    instead integrates the actual flight phase and schedules contact:

    - base position/velocity follow the ballistic arc r(t) = r0 + v0 t +
      g t^2 / 2 until the CoM reaches stance height, then blend linearly to
      the terminal reference with velocity decaying to zero;
    - Euler angles integrate the initial rates during flight and decay to
      level after touchdown;
    - feet track under the hips (rotated by attitude, clamped to the
      ground) during flight and freeze at their touchdown placement;
    - GRFs are zero in flight; in stance each leg carries the weight plus
      the impulse needed to stop v_z over the remaining stance time.

    Everything is branch-free (masks over knots), so it jits and vmaps.
    """
    from ..problems.landing import LandingVars

    n = problem.config.n_knots
    dtype = theta.x_ref.dtype
    g = jnp.asarray(-9.81, dtype)
    dt = theta.dt
    t_knot = jnp.concatenate([jnp.zeros(1, dtype), jnp.cumsum(dt)])  # (n,)

    q0, qd0 = theta.q_init, theta.qd_init
    z_stand = jnp.asarray(0.275, dtype)

    # ballistic CoM: z(t) = z0 + vz t + g t^2/2; touchdown when z hits stance
    z_b = q0[2] + qd0[5] * t_knot + 0.5 * g * t_knot**2
    vz_b = qd0[5] + g * t_knot
    in_flight = z_b > z_stand  # (n,) mask
    # touchdown time: first knot out of flight (>= 1 by construction of ICs)
    t_td = jnp.max(jnp.where(in_flight, t_knot, 0.0))
    t_end = t_knot[-1]
    # stance blend factor: 0 at touchdown -> 1 at horizon end
    wb = jnp.clip((t_knot - t_td) / jnp.maximum(t_end - t_td, 1e-3), 0.0, 1.0)

    # position: ballistic xy throughout flight, frozen after touchdown;
    # z ballistic in flight, blending to stand height in stance
    xy_b = q0[None, 0:2] + qd0[None, 3:5] * jnp.minimum(t_knot, t_td)[:, None]
    z_traj = jnp.where(in_flight, z_b, z_stand + (z_b * 0.0))
    # attitude: integrate omega (approx: rates = omega) in flight, decay after
    rpy_b = q0[None, 3:6] + qd0[None, 0:3] * jnp.minimum(t_knot, t_td)[:, None]
    rpy_traj = rpy_b * (1.0 - wb[:, None])
    # velocities: ballistic then decay to zero
    v_xy = jnp.where(in_flight[:, None], qd0[None, 3:5], qd0[None, 3:5] * (1 - wb[:, None]))
    v_z = jnp.where(in_flight, vz_b, vz_b * 0.0 + jnp.minimum(vz_b, 0.0) * (1 - wb))
    omega = jnp.where(in_flight[:, None], qd0[None, 0:3], qd0[None, 0:3] * (1 - wb[:, None]))

    X = jnp.concatenate(
        [xy_b, z_traj[:, None], rpy_traj, omega, v_xy, v_z[:, None]], axis=1
    )

    # feet: under the rotated hips, z clamped to ground; freeze after t_td
    R = rpy_to_rot_xyz(rpy_traj[:-1])  # (n-1, 3, 3)
    hips = jnp.asarray(HIP_SRBM, dtype)  # (4, 3)
    feet = X[:-1, None, 0:3] + jnp.einsum("kij,lj->kli", R, hips)  # (n-1,4,3)
    feet = feet.at[:, :, 2].set(0.0)
    # freeze foot xy at touchdown placement (index of last flight knot)
    stance_k = jnp.sum(in_flight[:-1].astype(jnp.int32))  # first stance knot
    k_idx = jnp.arange(n - 1)
    td_feet = feet[jnp.minimum(stance_k, n - 2)]
    feet = jnp.where((k_idx >= stance_k)[:, None, None], td_feet[None], feet)

    # GRFs: zero in flight; in stance, weight + stopping impulse per leg
    t_stop = jnp.maximum(t_end - t_td, 0.1)
    vz_td = qd0[5] + g * t_td
    fz_stance = theta.mass * (9.81 - vz_td / t_stop) / 4.0
    fz = jnp.where(in_flight[:-1], 0.0, jnp.clip(fz_stance, 1.0, theta.f_max))
    grf = jnp.zeros((n - 1, 4, 3), dtype).at[:, :, 2].set(fz[:, None])

    U = jnp.concatenate([feet.reshape(n - 1, 12), grf.reshape(n - 1, 12)], axis=1)

    if problem.config.kinodynamic:
        q_leg_home = jnp.asarray(np.tile([0.0, -0.8, 1.6], 4), dtype)
        jpos = jnp.tile(q_leg_home, (n - 1, 1))
    else:
        jpos = jnp.zeros((n - 1, 0), dtype)
    return problem.pack(LandingVars(X=X, jpos=jpos, U=U))


def initial_guess_from_reference(problem, theta: LandingParams):
    """Cold-start initial guess z0 = [Xref(:); (IK jpos); Uref(:)].

    The reference cold start packs [Xref(:); Uref(:)]
    (landing_optimization.m:309); for the kinodynamic problem we add the
    home-pose joint angles as the jpos guess.
    """
    from ..problems.landing import LandingVars

    n = problem.config.n_knots
    dtype = theta.x_ref.dtype
    if problem.config.kinodynamic:
        q_leg_home = jnp.asarray(np.tile([0.0, -0.8, 1.6], 4), dtype)
        jpos = jnp.tile(q_leg_home, (n - 1, 1))
    else:
        jpos = jnp.zeros((n - 1, 0), dtype)
    return problem.pack(LandingVars(X=theta.x_ref, jpos=jpos, U=theta.u_ref))
