"""Rotation and Euler-rate kinematics kit.

Conventions follow the reference exactly (see SURVEY.md Appendix B):

- ``rx/ry/rz`` are 3x3 *coordinate transform* matrices (frame A -> frame B
  where B is rotated by theta about the common axis), i.e. the transpose of
  the usual active rotation matrices.  Reference: spatial_v2/3D/rx.m,ry.m,rz.m.
- ``rpy_to_rot_xyz(rpy) = rx(r)' @ ry(p)' @ rz(y)'`` is the production
  body-to-world rotation (dynamics-utilities/rpyToRotMat_xyz.m:1-2).
- ``rpy_to_rot_zyx(rpy) = rz(y)' @ ry(p)' @ rx(r)'`` is the legacy ZYX
  convention (dynamics-utilities/rpyToRotMat.m:1-2) used by the CRBA mass
  matrix and the closed-form IK.
- ``binv`` maps world-frame angular velocity to Euler rates; singular at
  pitch = +-pi/2 (dynamics-utilities/Binv.m:1-16).
- ``bmat_f`` / ``bmat_f_dot`` map Euler rates to world angular velocity and
  its derivative (dynamics-utilities/BmatF.m, BmatF_dot.m; Winkler RAL18
  Appendix B).

All functions are pure jnp, shape-polymorphic over leading batch dims only
via vmap (inputs are unbatched 1-D/2-D arrays).
"""

from __future__ import annotations

import jax.numpy as jnp


def rx(theta):
    """3x3 coordinate rotation about X (spatial_v2/3D/rx.m)."""
    c, s = jnp.cos(theta), jnp.sin(theta)
    o, z = jnp.ones_like(theta), jnp.zeros_like(theta)
    return jnp.stack(
        [
            jnp.stack([o, z, z], -1),
            jnp.stack([z, c, s], -1),
            jnp.stack([z, -s, c], -1),
        ],
        -2,
    )


def ry(theta):
    """3x3 coordinate rotation about Y (spatial_v2/3D/ry.m)."""
    c, s = jnp.cos(theta), jnp.sin(theta)
    o, z = jnp.ones_like(theta), jnp.zeros_like(theta)
    return jnp.stack(
        [
            jnp.stack([c, z, -s], -1),
            jnp.stack([z, o, z], -1),
            jnp.stack([s, z, c], -1),
        ],
        -2,
    )


def rz(theta):
    """3x3 coordinate rotation about Z (spatial_v2/3D/rz.m)."""
    c, s = jnp.cos(theta), jnp.sin(theta)
    o, z = jnp.ones_like(theta), jnp.zeros_like(theta)
    return jnp.stack(
        [
            jnp.stack([c, s, z], -1),
            jnp.stack([-s, c, z], -1),
            jnp.stack([z, z, o], -1),
        ],
        -2,
    )


def skew(v):
    """3-vector -> 3x3 skew-symmetric matrix (spatial_v2/3D/skew.m)."""
    z = jnp.zeros_like(v[..., 0])
    return jnp.stack(
        [
            jnp.stack([z, -v[..., 2], v[..., 1]], -1),
            jnp.stack([v[..., 2], z, -v[..., 0]], -1),
            jnp.stack([-v[..., 1], v[..., 0], z], -1),
        ],
        -2,
    )


def unskew(A):
    """Skew-symmetric component of a 3x3 matrix as a vector (skew_2.m)."""
    return 0.5 * jnp.stack(
        [
            A[..., 2, 1] - A[..., 1, 2],
            A[..., 0, 2] - A[..., 2, 0],
            A[..., 1, 0] - A[..., 0, 1],
        ],
        -1,
    )


def rpy_to_rot_xyz(rpy):
    """Body-to-world rotation, XYZ convention (rpyToRotMat_xyz.m:1-2).

    ``R_b2w = rx(r)' @ ry(p)' @ rz(y)'`` — this is the production convention
    used by the kinodynamic landing NLP (landing_optimization.m:112-113).
    Composed elementwise (no matmuls): identical algebra, but immune to the
    TPU's default bf16 f32-matmul precision (a 3x3 @ 3x3 at bf16 puts ~1e-3
    error into every downstream kinematic quantity).
    """
    r, p, y = rpy[..., 0], rpy[..., 1], rpy[..., 2]
    cr, sr = jnp.cos(r), jnp.sin(r)
    cp, sp = jnp.cos(p), jnp.sin(p)
    cy, sy = jnp.cos(y), jnp.sin(y)
    return jnp.stack(
        [
            jnp.stack([cp * cy, -cp * sy, sp], -1),
            jnp.stack([cr * sy + sr * sp * cy, cr * cy - sr * sp * sy, -sr * cp], -1),
            jnp.stack([sr * sy - cr * sp * cy, sr * cy + cr * sp * sy, cr * cp], -1),
        ],
        -2,
    )


def rpy_to_rot_zyx(rpy):
    """Body-to-world rotation, legacy ZYX convention (rpyToRotMat.m:1-2).

    Elementwise composition of ``rz(y)' @ ry(p)' @ rx(r)'`` (see
    :func:`rpy_to_rot_xyz` for why no matmuls)."""
    r, p, y = rpy[..., 0], rpy[..., 1], rpy[..., 2]
    cr, sr = jnp.cos(r), jnp.sin(r)
    cp, sp = jnp.cos(p), jnp.sin(p)
    cy, sy = jnp.cos(y), jnp.sin(y)
    return jnp.stack(
        [
            jnp.stack([cy * cp, cy * sp * sr - sy * cr, cy * sp * cr + sy * sr], -1),
            jnp.stack([sy * cp, sy * sp * sr + cy * cr, sy * sp * cr - cy * sr], -1),
            jnp.stack([-sp, cp * sr, cp * cr], -1),
        ],
        -2,
    )


def binv(rpy):
    """Euler-rate matrix: world angular velocity -> Euler rates (Binv.m:1-16).

    ``rpy_dot = binv(rpy) @ omega_world``.  Singular at pitch = +-pi/2.
    """
    theta, psi = rpy[..., 1], rpy[..., 2]
    cp, sp = jnp.cos(psi), jnp.sin(psi)
    ct, tt = jnp.cos(theta), jnp.tan(theta)
    z = jnp.zeros_like(psi)
    o = jnp.ones_like(psi)
    return jnp.stack(
        [
            jnp.stack([cp / ct, sp / ct, z], -1),
            jnp.stack([-sp, cp, z], -1),
            jnp.stack([cp * tt, sp * tt, o], -1),
        ],
        -2,
    )


def bmat_f(rpy):
    """Euler rates -> world angular velocity (BmatF.m:1-12).

    ``omega_world = bmat_f(rpy) @ rpy_dot``.
    """
    theta, psi = rpy[..., 1], rpy[..., 2]
    cp, sp = jnp.cos(psi), jnp.sin(psi)
    ct, st = jnp.cos(theta), jnp.sin(theta)
    z = jnp.zeros_like(psi)
    o = jnp.ones_like(psi)
    return jnp.stack(
        [
            jnp.stack([cp * ct, -sp, z], -1),
            jnp.stack([ct * sp, cp, z], -1),
            jnp.stack([-st, z, o], -1),
        ],
        -2,
    )


def bmat_f_dot(rpy, rpy_dot):
    """Time derivative of ``bmat_f`` (BmatF_dot.m:1-16).

    ``omega_dot = bmat_f_dot(rpy, rpy_dot) @ rpy_dot + bmat_f(rpy) @ rpy_ddot``.
    """
    theta, psi = rpy[..., 1], rpy[..., 2]
    theta_d, psi_d = rpy_dot[..., 1], rpy_dot[..., 2]
    cp, sp = jnp.cos(psi), jnp.sin(psi)
    ct, st = jnp.cos(theta), jnp.sin(theta)
    z = jnp.zeros_like(psi)
    return jnp.stack(
        [
            jnp.stack([-ct * sp * psi_d - st * theta_d * cp, -cp * psi_d, z], -1),
            jnp.stack([ct * cp * psi_d - st * theta_d * sp, -sp * psi_d, z], -1),
            jnp.stack([-ct * theta_d, z, z], -1),
        ],
        -2,
    )
