"""Oracle tests for the math kit — the ports of the reference's own
verification scripts (test_jacobianApprox.m, test_analytical_IK.m,
rpyToRotMatTest.m) plus FK-vs-spatial_v2 cross-checks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from landing_controller_tpu.dynamics import featherstone, legs, rotations, srbm
from landing_controller_tpu.models import get_robot_model, get_robot_params, srbm_constants
from tests.reference_chain import Quad3DChain


@pytest.fixture(scope="module")
def params():
    return get_robot_params("mc3D")


@pytest.fixture(scope="module")
def model():
    return get_robot_model("mc3D")


def test_rotation_conventions():
    """rpyToRotMat_xyz = rx'ry'rz'; rpyToRotMat = rz'ry'rx' (reference .m:1-2)."""
    rpy = jnp.array([0.3, -0.4, 0.9])
    Rx = np.array(rotations.rx(rpy[0]))
    Ry = np.array(rotations.ry(rpy[1]))
    Rz = np.array(rotations.rz(rpy[2]))
    np.testing.assert_allclose(
        np.array(rotations.rpy_to_rot_xyz(rpy)), Rx.T @ Ry.T @ Rz.T, atol=1e-14
    )
    np.testing.assert_allclose(
        np.array(rotations.rpy_to_rot_zyx(rpy)), Rz.T @ Ry.T @ Rx.T, atol=1e-14
    )
    # both are proper rotations
    for R in (rotations.rpy_to_rot_xyz(rpy), rotations.rpy_to_rot_zyx(rpy)):
        R = np.array(R)
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-14)
        assert np.linalg.det(R) == pytest.approx(1.0)


def test_binv_bmatf_consistency():
    """Binv inverts the Euler-rate map restricted to world omega.

    omega_world = BmatF(rpy) @ rpy_dot and rpy_dot = Binv(rpy) @ omega_world
    must be mutual inverses away from the pitch singularity.
    """
    rng = np.random.default_rng(0)
    for _ in range(10):
        rpy = jnp.asarray(rng.uniform(-1.0, 1.0, 3))
        B = np.array(rotations.bmat_f(rpy))
        Bi = np.array(rotations.binv(rpy))
        np.testing.assert_allclose(Bi @ B, np.eye(3), atol=1e-12)


def test_bmatf_dot_is_derivative():
    """BmatF_dot matches d/dt BmatF along rpy(t) = rpy0 + t*rpy_dot."""
    rpy0 = jnp.array([0.2, -0.3, 0.5])
    rpy_dot = jnp.array([0.7, 0.4, -1.1])
    jac = jax.jacfwd(lambda t: rotations.bmat_f(rpy0 + t * rpy_dot))(0.0)
    np.testing.assert_allclose(
        np.array(rotations.bmat_f_dot(rpy0, rpy_dot)), np.array(jac), atol=1e-12
    )


def test_fk_closed_form_vs_spatial_v2_chain(params):
    """Closed-form world FK == the reference Featherstone propagation."""
    chain = Quad3DChain(params)
    rng = np.random.default_rng(1)
    for _ in range(10):
        base = rng.normal(size=6)
        jpos = rng.uniform(-1.5, 1.5, 12)
        q = np.concatenate([base, jpos])
        expected = chain.fk_feet(q)
        got = np.array(legs.foot_positions_world(params, jnp.asarray(base), jnp.asarray(jpos)))
        np.testing.assert_allclose(got, expected, atol=1e-12)


def test_fk_jnp_chain_vs_closed_form(model, params):
    """The generic jnp Featherstone chain agrees with the closed form too."""
    rng = np.random.default_rng(2)
    q = jnp.asarray(np.concatenate([rng.normal(size=6), rng.uniform(-1.5, 1.5, 12)]))
    got = np.array(featherstone.fk_feet(model, q))
    expected = np.array(legs.foot_positions_world(params, q[:6], q[6:]))
    np.testing.assert_allclose(got, expected, atol=1e-12)


def test_analytic_jacobian_vs_autodiff(params):
    """Analytic leg Jacobian == autodiff of closed-form FK with l4 offset.

    The reference checks analytic-vs-spatial_v2 (test_jacobianApprox.m:40-64);
    our autodiff equivalent: J == d(foot_hip_with_l4)/d(jpos).  The analytic J
    includes the 0.004 m knee y-offset, so differentiate FK with the offset
    folded into l1.
    """
    import dataclasses

    params_l4 = dataclasses.replace(
        params,
        hip_location=np.array([0.0, params.l1 + params.knee_link_y_offset, 0.0]),
    )
    rng = np.random.default_rng(3)
    for _ in range(5):
        jpos = jnp.asarray(rng.uniform(-1.5, 1.5, 12))
        J = np.array(legs.leg_jacobians(params, jpos))
        jac_full = np.array(
            jax.jacfwd(lambda j: legs.foot_positions_hip(params_l4, j))(jpos)
        )  # (4,3,12)
        for leg in range(4):
            np.testing.assert_allclose(
                J[leg], jac_full[leg, :, 3 * leg : 3 * leg + 3], atol=1e-12
            )


def test_ik_fk_roundtrip(params):
    """Closed-form IK inverts FK (test_analytical_IK.m equivalent)."""
    rng = np.random.default_rng(4)
    for _ in range(10):
        base = jnp.asarray(np.concatenate([rng.normal(size=3), rng.uniform(-0.4, 0.4, 3)]))
        # sample jpos within the production joint-limit box
        jpos = jnp.asarray(
            rng.uniform(np.tile([-np.pi / 3, -np.pi / 2, 0.1], 4), np.tile([np.pi / 3, np.pi / 2, 3 * np.pi / 4], 4))
        )
        # IK uses ZYX (reference quadInverseKinematics.m:19); FK must match it
        from landing_controller_tpu.dynamics.rotations import rpy_to_rot_zyx

        abad = jnp.asarray(legs.SIDE_SIGN_XYZ) * jnp.asarray(params.abad_location)
        p_hip = legs.foot_positions_hip(params, jpos)
        R = rpy_to_rot_zyx(base[3:6])
        p_world = (base[:3] + (abad + p_hip) @ R.T).reshape(12)
        jpos_ik = legs.inverse_kinematics(params, base, p_world, convention="zyx")
        p_rt = (base[:3] + (abad + legs.foot_positions_hip(params, jpos_ik)) @ R.T).reshape(12)
        np.testing.assert_allclose(np.array(p_rt), np.array(p_world), atol=1e-9)


def test_ik_newton_refines_and_falls_back(params):
    """Numeric-IK Newton fallback (misc/inverse_kinematics.m analogue):
    refines a perturbed guess to the true answer for reachable targets, and
    returns the guess unchanged for out-of-workspace targets."""
    rng = np.random.default_rng(7)
    base = jnp.asarray(np.concatenate([[0.0, 0.0, 0.35], rng.uniform(-0.2, 0.2, 3)]))
    jpos = jnp.asarray(
        rng.uniform(np.tile([-0.5, -1.0, 0.3], 4), np.tile([0.5, 1.0, 2.0], 4))
    )
    p_world = legs.foot_positions_world(params, base, jpos).reshape(12)
    # reachable: a perturbed guess converges back to an FK-consistent answer
    guess = jpos + 0.15 * jnp.asarray(rng.normal(size=12))
    jp_ref = legs.inverse_kinematics_newton(params, base, p_world, guess, convention="xyz")
    p_rt = legs.foot_positions_world(params, base, jp_ref).reshape(12)
    np.testing.assert_allclose(np.array(p_rt), np.array(p_world), atol=1e-6)
    # out-of-workspace: target 2 m below -> falls back to the guess
    p_far = p_world - jnp.tile(jnp.asarray([0.0, 0.0, 2.0]), 4)
    jp_fb = legs.inverse_kinematics_newton(params, base, p_far, guess, convention="xyz")
    np.testing.assert_allclose(np.array(jp_fb), np.array(guess), atol=1e-12)


def test_srbm_constants(model):
    """CRBA-derived SRBM mass/inertia at q_home match the known values."""
    mass, ib, ib_inv = srbm_constants("mc3D")
    assert mass == pytest.approx(8.252, abs=1e-9)
    np.testing.assert_allclose(ib, [0.05757730, 0.23400899, 0.27967385], atol=1e-6)
    np.testing.assert_allclose(ib * ib_inv, np.ones(3), rtol=2e-3)  # near-diagonal Ic


def test_mass_matrix_symmetric_psd(model):
    rng = np.random.default_rng(5)
    q = jnp.asarray(np.concatenate([rng.normal(size=6), rng.uniform(-1, 1, 12)]))
    H, Ic = featherstone.mass_matrix(model, q)
    H = np.array(H)
    np.testing.assert_allclose(H, H.T, atol=1e-10)
    w = np.linalg.eigvalsh(H)
    assert w.min() > -1e-9


def test_rnea_gravity_consistency(model):
    """At rest, RNEA generalized force on the z pseudo-joint = +m*g."""
    q = jnp.asarray(model.q_home)
    tau = np.array(featherstone.rnea(model, q, jnp.zeros(18), jnp.zeros(18)))
    # tau[2] is the Pz force needed to hold the robot against gravity
    assert tau[2] == pytest.approx(8.252 * 9.81, rel=1e-9)


def test_srbm_ballistic_rollout():
    """Zero GRFs -> projectile CoM motion (test_integrationDifference.m)."""
    mass, ib, ib_inv = srbm_constants("mc3D")
    x0 = jnp.array([0, 0, 1.0, 0, 0, 0, 0, 0, 0, 0.5, 0, 0.0])
    n = 50
    dts = jnp.full(n, 0.01)
    U = jnp.zeros((n, 24))
    X = srbm.rollout(x0, U, dts, mass, jnp.asarray(ib), jnp.asarray(ib_inv))
    # explicit-Euler oracle in numpy
    z, vz, zs = 1.0, 0.0, [1.0]
    for _ in range(n):
        z += vz * 0.01
        vz += -9.81 * 0.01
        zs.append(z)
    np.testing.assert_allclose(np.array(X[:, 2]), zs, atol=1e-9)
    t = np.concatenate([[0], np.cumsum(np.array(dts))])
    np.testing.assert_allclose(np.array(X[:, 0]), 0.5 * t, atol=1e-9)


def test_srbm_angular_momentum_free_fall():
    """Torque-free fall about a principal axis keeps omega constant."""
    mass, ib, ib_inv = srbm_constants("mc3D")
    x0 = jnp.array([0, 0, 1.0, 0, 0, 0, 0.0, 0, 1.3, 0, 0, 0.0])
    dts = jnp.full(40, 0.005)
    X = srbm.rollout(x0, jnp.zeros((40, 24)), dts, mass, jnp.asarray(ib), jnp.asarray(ib_inv))
    np.testing.assert_allclose(np.array(X[:, 8]), 1.3, atol=1e-9)
