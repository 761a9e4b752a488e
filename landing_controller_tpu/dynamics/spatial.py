"""Spatial (6-D) rigid-body algebra — Featherstone kernel, pure jnp.

TPU-native re-derivation of the parts of ``spatial_v2`` that the landing
stack uses (spatial_v2/spatial/*.m, dynamics/jcalc.m): Plucker transforms,
spatial cross products, spatial inertias, and joint calculus.  Everything is
expressed as dense 6x6/3x3 ops so it vmaps and jits cleanly; joint types are
static integer codes so the model topology stays compile-time constant.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .rotations import rx, ry, rz, skew, unskew

# Static joint-type codes (jcalc.m joint codes, reference spatial_v2/dynamics/jcalc.m:19-40)
JT_RX, JT_RY, JT_RZ, JT_PX, JT_PY, JT_PZ = 0, 1, 2, 3, 4, 5

# Motion subspaces S for each joint code, stacked (6 codes x 6).
_S_TABLE = np.zeros((6, 6))
_S_TABLE[JT_RX, 0] = 1.0
_S_TABLE[JT_RY, 1] = 1.0
_S_TABLE[JT_RZ, 2] = 1.0
_S_TABLE[JT_PX, 3] = 1.0
_S_TABLE[JT_PY, 4] = 1.0
_S_TABLE[JT_PZ, 5] = 1.0


def plux(E, r):
    """Compose a Plucker transform from rotation E and translation r.

    ``X = [E 0; -E*skew(r) E]`` (spatial_v2/spatial/plux.m:14-16): shift of
    origin by r followed by rotation E.
    """
    Z = jnp.zeros_like(E)
    top = jnp.concatenate([E, Z], axis=-1)
    bot = jnp.concatenate([-E @ skew(r), E], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def plux_inv(X):
    """Decompose a Plucker transform into (E, r) (plux.m:18-21, plux_2.m).

    Returns E = world->frame rotation and r = frame origin in parent coords.
    """
    E = X[..., :3, :3]
    A = jnp.swapaxes(E, -1, -2) @ X[..., 3:, :3]
    r = -unskew(A)
    return E, r


def rot_spatial(E):
    """Pure-rotation spatial transform [E 0; 0 E]."""
    Z = jnp.zeros_like(E)
    return jnp.concatenate(
        [jnp.concatenate([E, Z], -1), jnp.concatenate([Z, E], -1)], -2
    )


def xlt(r):
    """Pure-translation spatial transform (spatial_v2/spatial/xlt.m)."""
    E = jnp.broadcast_to(jnp.eye(3, dtype=r.dtype), r.shape[:-1] + (3, 3))
    return plux(E, r)


def rotx(theta):
    """Spatial X-axis rotation (spatial_v2/spatial/rotx.m)."""
    return rot_spatial(rx(theta))


def roty(theta):
    return rot_spatial(ry(theta))


def rotz(theta):
    return rot_spatial(rz(theta))


def crm(v):
    """Spatial cross-product operator (motion), crm.m: crm(v)*m = v x m."""
    w, vo = v[..., :3], v[..., 3:]
    Sw, Sv = skew(w), skew(vo)
    Z = jnp.zeros_like(Sw)
    return jnp.concatenate(
        [jnp.concatenate([Sw, Z], -1), jnp.concatenate([Sv, Sw], -1)], -2
    )


def crf(v):
    """Spatial cross-product operator (force), crf.m: crf(v) = -crm(v)'."""
    return -jnp.swapaxes(crm(v), -1, -2)


def spatial_inertia(mass, com, I3):
    """6x6 spatial inertia from mass, CoM, 3x3 rotational inertia.

    ``I = [I3 + m*C*C', m*C; m*C', m*eye(3)]`` with ``C = skew(com)``
    (dynamics-utilities/spatialInertia.m:21-25; equals spatial_v2 mcI.m).
    """
    C = skew(com)
    Ct = jnp.swapaxes(C, -1, -2)
    eye3 = jnp.eye(3, dtype=C.dtype)
    top = jnp.concatenate([I3 + mass * (C @ Ct), mass * C], -1)
    bot = jnp.concatenate([mass * Ct, mass * eye3], -1)
    return jnp.concatenate([top, bot], -2)


def spatial_inertia_decompose(I6):
    """Inverse of :func:`spatial_inertia`: 6x6 -> (mass, com, I3)."""
    mass = I6[..., 5, 5]
    mC = I6[..., :3, 3:]
    com = unskew(mC / mass[..., None, None] * 2.0) / 1.0  # unskew averages; mC is exact skew
    com = jnp.stack([mC[..., 2, 1], mC[..., 0, 2], mC[..., 1, 0]], -1) / mass[..., None]
    C = skew(com)
    I3 = I6[..., :3, :3] - mass[..., None, None] * (C @ jnp.swapaxes(C, -1, -2))
    return mass, com, I3


def flip_spatial_inertia_y(I6):
    """Reflect a spatial inertia across the XZ plane (left/right leg mirror).

    Equivalent of the reference's ``flipAlongAxis(I, 'Y')`` used when building
    the mirrored legs (get_robot_model.m:202-226): mass unchanged, CoM y
    negated, inertia conjugated by diag(1,-1,1).
    """
    mass, com, I3 = spatial_inertia_decompose(I6)
    R = jnp.diag(jnp.array([1.0, -1.0, 1.0], dtype=I6.dtype))
    return spatial_inertia(mass, R @ com, R @ I3 @ R)


def jcalc(jtype_code: int, q):
    """Joint spatial transform Xj and motion subspace S for one joint.

    Static (compile-time) joint code; traced joint angle.  Reference:
    spatial_v2/dynamics/jcalc.m:19-40.
    """
    z = jnp.zeros_like(q)
    if jtype_code == JT_RX:
        Xj = rotx(q)
    elif jtype_code == JT_RY:
        Xj = roty(q)
    elif jtype_code == JT_RZ:
        Xj = rotz(q)
    elif jtype_code == JT_PX:
        Xj = xlt(jnp.stack([q, z, z], -1))
    elif jtype_code == JT_PY:
        Xj = xlt(jnp.stack([z, q, z], -1))
    elif jtype_code == JT_PZ:
        Xj = xlt(jnp.stack([z, z, q], -1))
    else:
        raise ValueError(f"unknown joint code {jtype_code}")
    S = jnp.asarray(_S_TABLE[jtype_code], dtype=q.dtype)
    return Xj, S
