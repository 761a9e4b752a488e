"""Closed-form Mini-Cheetah leg kinematics: FK, analytic Jacobian, IK.

These are the hot-path kernels used inside the NLP transcription — all
vectorized over the 4 legs and free of control flow, so they vmap/jit onto
the VPU cleanly.

- :func:`foot_positions_world` is the closed form of the reference's
  Featherstone FK propagation (get_forward_kin_foot.m:1-26), derived for the
  fixed quad3D topology (incl. the hip's 180-degree yaw flip,
  get_robot_model.m:211) and verified against the chain to machine precision
  (tests/test_kinematics.py).
- :func:`leg_jacobians` is the analytic 3x3 Jacobian with the 0.004 m knee
  y-offset, exactly as get_foot_jacobians_mc.m:1-27 (note: the reference's
  FK chain does NOT include that offset; we reproduce both behaviors
  faithfully since the NLP uses both with a +-1 cm consistency band).
- :func:`inverse_kinematics` is the closed-form atan2 IK
  (quadInverseKinematics.m:1-44, legacy ZYX base rotation), with an XYZ
  variant for the production convention.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .rotations import rpy_to_rot_xyz, rpy_to_rot_zyx

# Per-leg ab/ad y sign [FR, FL, HR, HL] (get_foot_jacobians_mc.m:3).
SIDE_SIGN = np.array([-1.0, 1.0, -1.0, 1.0])

# Per-leg xyz sign pattern for link offsets (get_robot_model.m:192).
SIDE_SIGN_XYZ = np.array(
    [[1.0, -1.0, 1.0], [1.0, 1.0, 1.0], [-1.0, -1.0, 1.0], [-1.0, 1.0, 1.0]]
)


def _link_lengths(params):
    l1 = params.l1
    l2 = params.l2
    l3 = params.l3
    l4 = params.knee_link_y_offset
    return l1, l2, l3, l4


def foot_positions_hip(params, jpos):
    """Foot position of each leg relative to its ab/ad pivot, body frame.

    jpos: (12,) joint angles [abad, hip, knee] x 4 legs -> (4, 3).

    Closed form of the quad3D chain (abad Rx -> rz(pi) hip Ry -> knee Ry):
        px = l3*s23 + l2*s2
        py = side*l1*c1 + s1*(l2*c2 + l3*c23)
        pz = side*l1*s1 - c1*(l2*c2 + l3*c23)
    (No l4 knee y-offset — matching get_forward_kin_foot.m exactly.)
    """
    l1, l2, l3, _ = _link_lengths(params)
    q = jpos.reshape(4, 3)
    side = jnp.asarray(SIDE_SIGN, dtype=jpos.dtype)
    s1, s2, s3 = jnp.sin(q[:, 0]), jnp.sin(q[:, 1]), jnp.sin(q[:, 2])
    c1, c2, c3 = jnp.cos(q[:, 0]), jnp.cos(q[:, 1]), jnp.cos(q[:, 2])
    c23 = c2 * c3 - s2 * s3
    s23 = s2 * c3 + c2 * s3
    leg_len = l2 * c2 + l3 * c23  # projected upper+lower link length
    px = l3 * s23 + l2 * s2
    py = side * l1 * c1 + s1 * leg_len
    pz = side * l1 * s1 - c1 * leg_len
    return jnp.stack([px, py, pz], axis=-1)


def foot_positions_world(params, q_base, jpos):
    """World-frame foot positions, XYZ production convention.

    q_base: (6,) [xyz, rpy]; jpos: (12,) -> (4, 3).  Equals the reference's
    ``get_forward_kin_foot(model, [q; jpos])`` (landing_optimization.m:184).
    """
    R = rpy_to_rot_xyz(q_base[3:6])
    abad = jnp.asarray(SIDE_SIGN_XYZ, dtype=jpos.dtype) * jnp.asarray(
        params.abad_location, dtype=jpos.dtype
    )
    p_hip = foot_positions_hip(params, jpos)
    # full-precision apply: TPU default f32 matmul is bf16 (~2e-3 abs
    # error on ~0.3 m positions) — too coarse for the +-1 cm FK band
    return q_base[:3] + jnp.einsum(
        "lj,ij->li", abad + p_hip, R, precision=jax.lax.Precision.HIGHEST
    )


def leg_jacobians(params, jpos):
    """Analytic 3x3 foot Jacobians, (4, 3, 3) (get_foot_jacobians_mc.m:1-27).

    Includes the l4 = 0.004 m knee y-offset exactly as the reference does.
    d(foot pos in body frame)/d(leg joints); used for the torque map
    tau = J' @ (-R_w2b @ f) (landing_optimization.m:167).
    """
    l1, l2, l3, l4 = _link_lengths(params)
    l14 = l1 + l4
    q = jpos.reshape(4, 3)
    side = jnp.asarray(SIDE_SIGN, dtype=jpos.dtype)
    s1, s2, s3 = jnp.sin(q[:, 0]), jnp.sin(q[:, 1]), jnp.sin(q[:, 2])
    c1, c2, c3 = jnp.cos(q[:, 0]), jnp.cos(q[:, 1]), jnp.cos(q[:, 2])
    c23 = c2 * c3 - s2 * s3
    s23 = s2 * c3 + c2 * s3
    z = jnp.zeros_like(s1)
    row0 = jnp.stack([z, l3 * c23 + l2 * c2, l3 * c23], -1)
    row1 = jnp.stack(
        [
            l3 * c1 * c23 + l2 * c1 * c2 - l14 * s1 * side,
            -l3 * s1 * s23 - l2 * s1 * s2,
            -l3 * s1 * s23,
        ],
        -1,
    )
    row2 = jnp.stack(
        [
            l3 * s1 * c23 + l2 * c2 * s1 + l14 * side * c1,
            l3 * c1 * s23 + l2 * c1 * s2,
            l3 * c1 * s23,
        ],
        -1,
    )
    return jnp.stack([row0, row1, row2], axis=-2)


def leg_torques(params, jpos, rpy, f_grf):
    """Jacobian-transpose joint torques for all legs.

    tau_leg = J(jpos)' @ (-R_w2b @ f_world) per leg
    (landing_optimization.m:134,167).  jpos: (12,), rpy: (3,),
    f_grf: (12,) world GRFs -> (12,) torques.
    """
    J = leg_jacobians(params, jpos)  # (4,3,3)
    R_w2b = jnp.swapaxes(rpy_to_rot_xyz(rpy), -1, -2)
    f = f_grf.reshape(4, 3)
    f_body = -jnp.einsum(
        "lj,ij->li", f, R_w2b, precision=jax.lax.Precision.HIGHEST
    )  # (-R_w2b @ f_leg) for each leg
    tau = jnp.einsum("lij,li->lj", J, f_body)  # J' @ f_body
    return tau.reshape(12)


def inverse_kinematics(params, fb_state, p_feet, convention: str = "zyx"):
    """Closed-form IK: world foot positions -> 12 joint angles.

    Port of quadInverseKinematics.m:1-44.  ``fb_state``: (6,) base pose,
    ``p_feet``: (12,) world foot positions.  The reference uses the legacy
    ZYX base rotation (rpyToRotMat); pass ``convention="xyz"`` for the
    production XYZ convention (consistent with :func:`foot_positions_world`).
    """
    l1, l2, l3, _ = _link_lengths(params)
    dtype = p_feet.dtype
    if convention == "zyx":
        R_b2w = rpy_to_rot_zyx(fb_state[3:6])
    elif convention == "xyz":
        R_b2w = rpy_to_rot_xyz(fb_state[3:6])
    else:
        raise ValueError(convention)
    hip_rel = jnp.asarray(SIDE_SIGN_XYZ, dtype=dtype) * jnp.asarray(
        params.abad_location, dtype=dtype
    )
    p = p_feet.reshape(4, 3)
    p_rel = jnp.einsum(
        "lj,ji->li", p - fb_state[:3], R_b2w,
        precision=jax.lax.Precision.HIGHEST,
    ) - hip_rel  # R_w2b @ (p - base) per leg
    side = jnp.asarray(SIDE_SIGN_XYZ[:, 1], dtype=dtype)  # [-1,1,-1,1]
    l1s = side * l1

    px, py, pz = p_rel[:, 0], p_rel[:, 1], p_rel[:, 2]
    th1 = jnp.arctan2(pz, py) + jnp.arctan2(
        jnp.sqrt(jnp.maximum(py**2 + pz**2 - l1s**2, 0.0)), l1s
    )
    tmp = py * jnp.sin(th1) - pz * jnp.cos(th1)
    A = -2.0 * tmp * l2
    B = -2.0 * px * l2
    C = l3**2 - tmp**2 - px**2 - l2**2
    disc = jnp.maximum(A**2 + B**2 - C**2, 0.0)
    th2 = jnp.arctan2(B, A) + jnp.arctan2(jnp.sqrt(disc), C)
    th3 = jnp.arctan2(px - l2 * jnp.sin(th2), tmp - l2 * jnp.cos(th2)) - th2
    return jnp.stack([th1, th2, th3], axis=-1).reshape(12)


def inverse_kinematics_newton(
    params,
    fb_state,
    p_feet,
    jpos_guess,
    convention: str = "xyz",
    iters: int = 8,
    tol: float = 1e-6,
):
    """Numeric IK refinement — the ``fsolve``-on-FK-residual fallback
    (misc/inverse_kinematics.m:1-19, used at quadruped_SRBM_NLP.m:315-326).

    Runs a fixed-iteration damped Newton on the per-leg body-frame FK
    residual from ``jpos_guess`` (typically the closed-form
    :func:`inverse_kinematics` answer, or a nominal stance).  Like the
    reference's ``exitflag<=0`` fallback, if the refined answer does not
    beat the guess's residual (out-of-workspace target), the guess is
    returned unchanged — branch-free, jit/vmap-safe.
    """
    dtype = p_feet.dtype
    if convention == "zyx":
        R_b2w = rpy_to_rot_zyx(fb_state[3:6])
    elif convention == "xyz":
        R_b2w = rpy_to_rot_xyz(fb_state[3:6])
    else:
        raise ValueError(convention)
    hip_rel = jnp.asarray(SIDE_SIGN_XYZ, dtype=dtype) * jnp.asarray(
        params.abad_location, dtype=dtype
    )
    # TPU: default f32 matmul precision is bf16 — fatal for a 3x3 Newton
    # solve aiming at ~1e-6 residuals (incl. the world->hip target rotation);
    # pin full precision around the whole refinement
    with jax.default_matmul_precision("highest"):
        # per-leg target in the hip frame: R_w2b (p - base) - hip
        target = jnp.einsum(
            "lj,ji->li", p_feet.reshape(4, 3) - fb_state[:3], R_b2w,
            precision=jax.lax.Precision.HIGHEST,
        ) - hip_rel

        def residual(jp):
            return foot_positions_hip(params, jp) - target  # (4, 3)

        def step(jp, _):
            r = residual(jp)
            J = leg_jacobians(params, jp)  # (4,3,3) = d p_hip/d jpos per leg
            # damped per-leg 3x3 solve (Levenberg): J'J + eps I guards the
            # knee-singular configurations the reference's fsolve also hits
            JtJ = jnp.einsum("lki,lkj->lij", J, J) + 1e-9 * jnp.eye(3, dtype=dtype)
            rhs = jnp.einsum("lki,lk->li", J, r)
            djp = jnp.linalg.solve(JtJ, rhs[..., None])[..., 0]
            return jp - djp.reshape(12), None

        jp0 = jpos_guess.reshape(12).astype(dtype)
        jp_ref, _ = jax.lax.scan(step, jp0, None, length=iters)
        # fallback to the guess when refinement failed to improve
        # (reference: fall back on exitflag<=0)
        err_ref = jnp.max(jnp.abs(residual(jp_ref)))
        err_0 = jnp.max(jnp.abs(residual(jp0)))
    better = jnp.isfinite(err_ref) & (err_ref <= jnp.maximum(err_0, tol))
    return jnp.where(better, jp_ref, jp0)
