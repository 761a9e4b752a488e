"""Unit-quaternion / rotation-vector kit — the spatial_v2 3D utilities the
landing stack itself never calls but the library surface provides
(spatial_v2/3D/rq.m, rqd.m, rv.m; SURVEY.md §2.4 "3D utils").

Conventions match Featherstone's spatial_v2 exactly:

- quaternions are scalar-first columns ``q = [q0, q1, q2, q3]`` describing
  the orientation of frame B relative to frame A;
- ``quat_to_rot(q)`` returns the 3x3 COORDINATE rotation matrix E that
  transforms A coordinates to B coordinates — for
  ``q = [cos(h/2), sin(h/2), 0, 0]`` it equals ``rotations.rx(h)``
  (rq.m:1-17);
- ``rot_to_quat(E)`` resolves the q/-q ambiguity the same way rq.m does:
  q0 > 0, ties broken by the largest-magnitude element (rq.m:14-16);
- ``quat_derivative*`` carry rqd.m's magnitude-stabilization term
  (Kstab = 0.1), so |q| converges to 1 under numerical integration
  (rqd.m:10-14).

Everything is branch-free jnp (Shepperd's four-candidate extraction is a
static select, not control flow), so it jits, vmaps and differentiates.
"""

from __future__ import annotations

import jax.numpy as jnp

KSTAB = 0.1  # rqd.m magnitude-stabilization constant


def quat_normalize(q):
    return q / jnp.linalg.norm(q)


def quat_to_rot(q):
    """Unit quaternion -> 3x3 coordinate rotation matrix (rq.m qtoE).

    Accepts any nonzero quaternion; normalizes before use."""
    q = quat_normalize(q)
    q0, q1, q2, q3 = q[0], q[1], q[2], q[3]
    return 2.0 * jnp.stack(
        [
            jnp.stack([q0 * q0 + q1 * q1 - 0.5, q1 * q2 + q0 * q3, q3 * q1 - q0 * q2]),
            jnp.stack([q1 * q2 - q0 * q3, q0 * q0 + q2 * q2 - 0.5, q2 * q3 + q0 * q1]),
            jnp.stack([q3 * q1 + q0 * q2, q2 * q3 - q0 * q1, q0 * q0 + q3 * q3 - 0.5]),
        ]
    )


def rot_to_quat(E):
    """3x3 coordinate rotation matrix -> unit quaternion (rq.m Etoq).

    Branch-free Shepperd extraction: all four candidate formulations are
    computed and the best-conditioned one (largest pivot among
    {1+tr, 1+2*E[i,i]-tr}) selected, matching rq.m's numerics; the sign
    convention is q0 > 0 (largest-magnitude element positive when q0=0).
    """
    tr = jnp.trace(E)
    # candidate pivots: 4*q0^2 = 1+tr, 4*qi^2 = 1 + 2*E[i,i] - tr
    p0 = 1.0 + tr
    p1 = 1.0 + 2.0 * E[0, 0] - tr
    p2 = 1.0 + 2.0 * E[1, 1] - tr
    p3 = 1.0 + 2.0 * E[2, 2] - tr
    # E transforms A->B, so the skew part of E is -2*q0*skew(qv)
    v1 = E[1, 2] - E[2, 1]
    v2 = E[2, 0] - E[0, 2]
    v3 = E[0, 1] - E[1, 0]
    s01 = E[0, 1] + E[1, 0]
    s02 = E[0, 2] + E[2, 0]
    s12 = E[1, 2] + E[2, 1]
    safe = lambda p: jnp.sqrt(jnp.maximum(p, 1e-30))
    cand = jnp.stack(
        [
            jnp.stack([p0, v1, v2, v3]) / safe(p0),
            jnp.stack([v1, p1, s01, s02]) / safe(p1),
            jnp.stack([v2, s01, p2, s12]) / safe(p2),
            jnp.stack([v3, s02, s12, p3]) / safe(p3),
        ]
    )
    idx = jnp.argmax(jnp.stack([p0, p1, p2, p3]))
    q = cand[idx]
    # sign: q0 > 0; at q0 == 0 make the largest-magnitude element positive
    pivot = jnp.where(
        jnp.abs(q[0]) > 1e-12, q[0], q[jnp.argmax(jnp.abs(q))]
    )
    q = q * jnp.sign(jnp.where(pivot == 0.0, 1.0, pivot))
    return quat_normalize(q)


def _q_matrix_body(q):
    q0, q1, q2, q3 = q[0], q[1], q[2], q[3]
    return jnp.stack(
        [
            jnp.stack([q0, -q1, -q2, -q3]),
            jnp.stack([q1, q0, -q3, q2]),
            jnp.stack([q2, q3, q0, -q1]),
            jnp.stack([q3, -q2, q1, q0]),
        ]
    )


def _q_matrix_world(q):
    q0, q1, q2, q3 = q[0], q[1], q[2], q[3]
    return jnp.stack(
        [
            jnp.stack([q0, -q1, -q2, -q3]),
            jnp.stack([q1, q0, q3, -q2]),
            jnp.stack([q2, -q3, q0, q1]),
            jnp.stack([q3, q2, -q1, q0]),
        ]
    )


def _qd(Q, q, w):
    wnorm = jnp.linalg.norm(w)
    stab = KSTAB * wnorm * (1.0 - jnp.linalg.norm(q))
    return 0.5 * Q @ jnp.concatenate([stab[None], w])


def quat_derivative(q, w_body):
    """q̇ from angular velocity of B expressed in B coordinates
    (rqd.m ``rqd(q, wB)`` argument order), with magnitude stabilization."""
    return _qd(_q_matrix_body(q), q, w_body)


def quat_derivative_world(w_world, q):
    """q̇ from angular velocity of B expressed in A coordinates
    (rqd.m ``rqd(wA, q)``)."""
    return _qd(_q_matrix_world(q), q, w_world)


def rotvec_to_rot(v):
    """Rotation vector -> 3x3 coordinate rotation matrix (rv.m vtoE):
    E = c*I - s*skew(u) + (1-c)*u*u'.  Branch-free at theta -> 0 via the
    normalized-sinc formulation."""
    theta = jnp.linalg.norm(v)
    # u = v/theta with a safe limit: the s*skew(u) and (1-c)*uu' terms both
    # vanish like theta, so scale by sinc-style factors of v directly
    th = jnp.maximum(theta, 1e-30)
    s_over = jnp.where(theta > 1e-8, jnp.sin(th) / th, 1.0 - theta * theta / 6.0)
    c1_over2 = jnp.where(
        theta > 1e-8, 2.0 * jnp.sin(th / 2.0) ** 2 / (th * th), 0.5 - theta * theta / 24.0
    )
    vx = jnp.array(
        [[0.0, -v[2], v[1]], [v[2], 0.0, -v[0]], [-v[1], v[0], 0.0]], v.dtype
    )
    c = jnp.cos(theta)
    return (
        c * jnp.eye(3, dtype=v.dtype)
        - s_over * vx
        + c1_over2 * jnp.outer(v, v)
    )


def rot_to_rotvec(E):
    """3x3 coordinate rotation matrix -> rotation vector with magnitude in
    [0, pi] (rv.m Etov).  Routed through the quaternion extraction, which
    stays well-conditioned near theta = pi where the direct skew
    extraction degenerates (rv.m:38-49)."""
    q = rot_to_quat(E)
    qv = q[1:]
    n = jnp.linalg.norm(qv)
    theta = 2.0 * jnp.arctan2(n, q[0])
    scale = jnp.where(n > 1e-12, theta / jnp.maximum(n, 1e-30), 2.0)
    return scale * qv
