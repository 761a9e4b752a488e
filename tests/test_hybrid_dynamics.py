"""Hybrid dynamics / floating-base ID / fbkin vs the existing oracles
(spatial_v2/dynamics/HD.m, IDfb.m, fbkin.m analogues)."""

import jax.numpy as jnp
import numpy as np

from landing_controller_tpu.dynamics.featherstone import (
    fbkin_fwd,
    fbkin_inv,
    fd_ab,
    hybrid_dynamics,
    id_floating_base,
    rnea,
)
from landing_controller_tpu.dynamics import rotations
from landing_controller_tpu.models import get_robot_model

MODEL = get_robot_model("mc3D")


def _state(seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.uniform(-0.4, 0.4, MODEL.nb), jnp.float64)
    qd = jnp.asarray(rng.uniform(-1.0, 1.0, MODEL.nb), jnp.float64)
    return q, qd


def test_hd_all_forward_equals_fd_ab():
    q, qd = _state()
    tau = jnp.asarray(np.random.default_rng(1).uniform(-5, 5, MODEL.nb), jnp.float64)
    qdd_ab = fd_ab(MODEL, q, qd, tau)
    qdd_hd, tau_out = hybrid_dynamics(
        MODEL, (True,) * MODEL.nb, q, qd, jnp.zeros(MODEL.nb, jnp.float64), tau
    )
    np.testing.assert_allclose(np.asarray(qdd_hd), np.asarray(qdd_ab), atol=1e-10)
    np.testing.assert_allclose(np.asarray(tau_out), np.asarray(tau), atol=1e-14)


def test_hd_all_prescribed_equals_rnea():
    q, qd = _state(2)
    qdd = jnp.asarray(np.random.default_rng(3).uniform(-3, 3, MODEL.nb), jnp.float64)
    tau_id = rnea(MODEL, q, qd, qdd)
    qdd_out, tau_hd = hybrid_dynamics(
        MODEL, (False,) * MODEL.nb, q, qd, qdd, jnp.zeros(MODEL.nb, jnp.float64)
    )
    np.testing.assert_allclose(np.asarray(tau_hd), np.asarray(tau_id), atol=1e-10)
    np.testing.assert_allclose(np.asarray(qdd_out), np.asarray(qdd), atol=1e-14)


def test_hd_mixed_consistent_with_rnea():
    """For ANY fd split, (qdd_out, tau_out) must satisfy the equations of
    motion: rnea(q, qd, qdd_out) == tau_out (HD.m's defining property)."""
    q, qd = _state(4)
    rng = np.random.default_rng(5)
    qdd_in = jnp.asarray(rng.uniform(-3, 3, MODEL.nb), jnp.float64)
    tau_in = jnp.asarray(rng.uniform(-5, 5, MODEL.nb), jnp.float64)
    fd = tuple(bool(b) for b in rng.integers(0, 2, MODEL.nb))
    qdd_out, tau_out = hybrid_dynamics(MODEL, fd, q, qd, qdd_in, tau_in)
    tau_check = rnea(MODEL, q, qd, qdd_out)
    np.testing.assert_allclose(
        np.asarray(tau_check), np.asarray(tau_out), atol=1e-8
    )


def test_id_floating_base_inverts_fd_ab():
    """IDfb(q, qd, qdd_joints) recovers the torques that produced those
    joint accelerations under a free base (IDfb.m = hybrid dynamics)."""
    q, qd = _state(6)
    tau12 = jnp.asarray(np.random.default_rng(7).uniform(-8, 8, 12), jnp.float64)
    tau_full = jnp.concatenate([jnp.zeros(6, jnp.float64), tau12])
    qdd_full = fd_ab(MODEL, q, qd, tau_full)
    qdd_base, tau_rec = id_floating_base(MODEL, q, qd, qdd_full[6:])
    np.testing.assert_allclose(np.asarray(tau_rec), np.asarray(tau12), atol=1e-8)
    np.testing.assert_allclose(
        np.asarray(qdd_base), np.asarray(qdd_full[:6]), atol=1e-8
    )


def test_fbkin_round_trip():
    rng = np.random.default_rng(8)
    for _ in range(20):
        q6 = jnp.asarray(
            np.concatenate(
                [rng.uniform(-1, 1, 3),
                 [rng.uniform(-3, 3), rng.uniform(-1.4, 1.4), rng.uniform(-3, 3)]]
            ),
            jnp.float64,
        )
        qd6 = jnp.asarray(rng.uniform(-2, 2, 6), jnp.float64)
        x = fbkin_fwd(q6, qd6)
        assert x.shape == (13,)
        np.testing.assert_allclose(float(jnp.linalg.norm(x[:4])), 1.0, atol=1e-12)
        q_r, qd_r = fbkin_inv(x)
        # angles normalized: ry in [-pi/2, pi/2], rx/rz in [-pi, pi] —
        # compare through the rotation matrix, rates directly
        E_a = rotations.rz(q6[5]) @ rotations.ry(q6[4]) @ rotations.rx(q6[3])
        E_b = rotations.rz(q_r[5]) @ rotations.ry(q_r[4]) @ rotations.rx(q_r[3])
        np.testing.assert_allclose(np.asarray(E_b), np.asarray(E_a), atol=1e-10)
        np.testing.assert_allclose(np.asarray(q_r[:3]), np.asarray(q6[:3]), atol=1e-12)
        np.testing.assert_allclose(np.asarray(qd_r), np.asarray(qd6), atol=1e-9)


def test_fbkin_matrix_matches_rotation_chain():
    """fbkin's E equals the Rx-then-Ry-then-Rz coordinate-rotation chain of
    the model's floating-base pseudo-joints (fbkin.m:49-53)."""
    from landing_controller_tpu.dynamics.quaternion import quat_to_rot

    q6 = jnp.asarray([0.3, -0.2, 0.5, 0.4, -0.6, 1.1], jnp.float64)
    p = fbkin_fwd(q6)
    E = quat_to_rot(p[:4])
    E_chain = rotations.rz(q6[5]) @ rotations.ry(q6[4]) @ rotations.rx(q6[3])
    np.testing.assert_allclose(np.asarray(E), np.asarray(E_chain), atol=1e-12)
