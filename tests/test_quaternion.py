"""Quaternion / rotation-vector kit vs the rotation-matrix oracles
(spatial_v2/3D/rq.m, rqd.m, rv.m semantics)."""

import jax
import jax.numpy as jnp
import numpy as np

from landing_controller_tpu.dynamics import rotations
from landing_controller_tpu.dynamics.quaternion import (
    quat_derivative,
    quat_derivative_world,
    quat_normalize,
    quat_to_rot,
    rot_to_quat,
    rot_to_rotvec,
    rotvec_to_rot,
)


def _random_rot(key):
    # random unit quaternion -> rotation (uniform over SO(3))
    q = jax.random.normal(key, (4,), jnp.float64)
    return quat_to_rot(q / jnp.linalg.norm(q))


def test_axis_quaternion_matches_rx():
    """q = [cos(h/2), sin(h/2), 0, 0] must reproduce rx(h) (rq.m:7-9)."""
    for h in (0.3, -1.2, 2.9):
        q = jnp.asarray([np.cos(h / 2), np.sin(h / 2), 0.0, 0.0], jnp.float64)
        np.testing.assert_allclose(
            np.asarray(quat_to_rot(q)), np.asarray(rotations.rx(jnp.float64(h))),
            atol=1e-14,
        )


def test_quat_rot_round_trip():
    keys = jax.random.split(jax.random.PRNGKey(0), 50)
    for k in keys:
        E = _random_rot(k)
        q = rot_to_quat(E)
        assert float(q[0]) >= -1e-12  # rq.m sign convention
        np.testing.assert_allclose(
            np.asarray(quat_to_rot(q)), np.asarray(E), atol=1e-12
        )
        np.testing.assert_allclose(float(jnp.linalg.norm(q)), 1.0, atol=1e-12)


def test_rot_to_quat_near_pi():
    """The large-angle branch (rq.m Etoq tr<=0 cases) round-trips."""
    for axis in (np.array([1.0, 0, 0]), np.array([0, 1.0, 0]),
                 np.array([0.6, -0.64, 0.48])):
        v = jnp.asarray(axis / np.linalg.norm(axis) * (np.pi - 1e-6))
        E = rotvec_to_rot(v)
        q = rot_to_quat(E)
        np.testing.assert_allclose(
            np.asarray(quat_to_rot(q)), np.asarray(E), atol=1e-9
        )


def test_rotvec_matches_rx_and_round_trips():
    v = jnp.asarray([0.7, 0.0, 0.0], jnp.float64)
    np.testing.assert_allclose(
        np.asarray(rotvec_to_rot(v)), np.asarray(rotations.rx(jnp.float64(0.7))),
        atol=1e-14,
    )
    keys = jax.random.split(jax.random.PRNGKey(1), 25)
    for k in keys:
        E = _random_rot(k)
        v = rot_to_rotvec(E)
        assert float(jnp.linalg.norm(v)) <= np.pi + 1e-9  # rv.m magnitude range
        np.testing.assert_allclose(
            np.asarray(rotvec_to_rot(v)), np.asarray(E), atol=1e-11
        )
    # identity edge
    np.testing.assert_allclose(
        np.asarray(rotvec_to_rot(jnp.zeros(3, jnp.float64))), np.eye(3), atol=1e-15
    )


def test_quat_derivative_body_vs_world():
    """Body- and world-frame rates describe the same Ė: wA = E' wB
    (rqd.m's two calling conventions)."""
    key = jax.random.PRNGKey(2)
    q = quat_normalize(jax.random.normal(key, (4,), jnp.float64))
    wB = jnp.asarray([0.3, -0.5, 0.2], jnp.float64)
    E = quat_to_rot(q)
    wA = E.T @ wB
    np.testing.assert_allclose(
        np.asarray(quat_derivative(q, wB)),
        np.asarray(quat_derivative_world(wA, q)),
        atol=1e-12,
    )


def test_quat_derivative_consistent_with_rotation_rate():
    """d/dt quat_to_rot(q(t)) == -skew(wB) @ E for body-frame w (coordinate
    -transform convention: Ė = -wB x E)."""
    key = jax.random.PRNGKey(3)
    q = quat_normalize(jax.random.normal(key, (4,), jnp.float64))
    wB = jnp.asarray([0.4, 0.1, -0.3], jnp.float64)
    qd = quat_derivative(q, wB)
    dE = jax.jvp(quat_to_rot, (q,), (qd,))[1]
    E = quat_to_rot(q)
    wx = jnp.array(
        [[0, -wB[2], wB[1]], [wB[2], 0, -wB[0]], [-wB[1], wB[0], 0]], jnp.float64
    )
    np.testing.assert_allclose(np.asarray(dE), np.asarray(-wx @ E), atol=1e-12)


def test_quat_derivative_magnitude_stabilization():
    """Integrating q̇ from a NON-unit start converges |q| -> 1
    (rqd.m:10-14 Kstab term)."""
    q0 = jnp.asarray([1.2, 0.1, -0.3, 0.2], jnp.float64)  # |q| != 1
    w = jnp.asarray([1.0, 0.5, -0.7], jnp.float64)
    n0 = float(jnp.linalg.norm(q0))

    def step(q, _):
        return q + 0.005 * quat_derivative(q, w), None

    q1, _ = jax.lax.scan(step, q0, None, length=8000)
    n1 = float(jnp.linalg.norm(q1))
    # explicit-Euler drift inflates |q| by ~|qd*dt|^2/2 per step, so the
    # Kstab pull settles at a small equilibrium offset, not exactly 1
    assert abs(n1 - 1.0) < abs(n0 - 1.0) * 0.2
    assert abs(n1 - 1.0) < 0.03
