"""Forward-dynamics oracle tests (spatial_v2 FDab/FDcrb/EnerMo parity).

The reference vendors Featherstone's articulated-body forward dynamics
(spatial_v2/dynamics/FDab.m), CRB forward dynamics (FDcrb.m), external
forces (apply_external_forces.m), energy/momentum (EnerMo.m), and a
joint-PD full-model simulator (dynamics-utilities/dynamicSim.m).  These
tests verify the jnp re-derivations against each other and against
first-principles identities (ID∘FD round trip, J^T f equivalence,
energy conservation) — the reference's own oracle style
(test_scripts/test_jacobianApprox.m).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from landing_controller_tpu.dynamics import featherstone as fs
from landing_controller_tpu.models.model import get_robot_model


@pytest.fixture(scope="module")
def model():
    return get_robot_model("mc3D")


@pytest.fixture(scope="module")
def state(model):
    rng = np.random.default_rng(7)
    q = jnp.asarray(
        np.concatenate(
            [
                rng.uniform(-0.3, 0.3, 3) + np.array([0, 0, 0.4]),
                rng.uniform(-0.3, 0.3, 3),
                np.asarray(model.q_home[6:]) + rng.uniform(-0.2, 0.2, 12),
            ]
        )
    )
    qd = jnp.asarray(rng.uniform(-1, 1, 18))
    tau = jnp.asarray(rng.uniform(-5, 5, 18))
    return q, qd, tau


def test_fdab_matches_fdcrb(model, state):
    q, qd, tau = state
    qdd_ab = fs.fd_ab(model, q, qd, tau)
    qdd_crb = fs.fd_crb(model, q, qd, tau)
    np.testing.assert_allclose(qdd_ab, qdd_crb, atol=1e-9)


def test_id_fd_roundtrip(model, state):
    q, qd, tau = state
    qdd = fs.fd_ab(model, q, qd, tau)
    tau_rt = fs.rnea(model, q, qd, qdd)
    np.testing.assert_allclose(tau_rt, tau, atol=1e-10)


def test_external_forces_consistent_between_algorithms(model, state):
    q, qd, tau = state
    rng = np.random.default_rng(3)
    grf = jnp.asarray(rng.uniform(-10, 10, (4, 3)))
    f_ext = fs.foot_forces_to_spatial(model, q, grf)
    qdd_ab = fs.fd_ab(model, q, qd, tau, f_ext_world=f_ext)
    qdd_crb = fs.fd_crb(model, q, qd, tau, f_ext_world=f_ext)
    np.testing.assert_allclose(qdd_ab, qdd_crb, atol=1e-9)


def test_external_foot_force_equals_jacobian_transpose(model, state):
    """A GRF applied through apply_external_forces must enter the equations
    of motion exactly as J(q)^T f — the identity behind the reference's
    torque constraint tau = J' * (-R' * f) (landing_optimization.m:167)."""
    q, qd, _ = state
    rng = np.random.default_rng(4)
    grf = jnp.asarray(rng.uniform(-10, 10, (4, 3)))
    f_ext = fs.foot_forces_to_spatial(model, q, grf)
    Jf = jax.jacobian(fs.fk_feet, argnums=1)(model, q)
    tau_jt = jnp.einsum("lij,li->j", Jf, grf)
    C0 = fs.rnea(model, q, qd, jnp.zeros(18))
    Cf = fs.rnea(model, q, qd, jnp.zeros(18), f_ext_world=f_ext)
    np.testing.assert_allclose(C0 - Cf, tau_jt, atol=1e-10)


def test_energy_momentum(model, state):
    q, qd, _ = state
    em = fs.energy_momentum(model, q, qd)
    # total mass matches the derived SRBM constant (8.252 kg, get_robot_params.m)
    assert abs(float(em["mass"]) - 8.252) < 1e-9
    # KE equals 0.5 qd' H qd with the open-chain mass matrix
    H = fs.crba_open(model, q)
    ke_ref = 0.5 * float(qd @ H @ qd)
    assert abs(float(em["ke"]) - ke_ref) < 1e-9
    # linear momentum rate in free fall = m g (Newton), via finite difference
    dt = 1e-6
    qdd = fs.fd_ab(model, q, qd, jnp.zeros(18))
    em2 = fs.energy_momentum(model, q + dt * qd, qd + dt * qdd)
    pdot = (np.asarray(em2["htot"][3:]) - np.asarray(em["htot"][3:])) / dt
    np.testing.assert_allclose(pdot, [0.0, 0.0, -9.81 * 8.252], atol=1e-3)


def test_free_fall_energy_conservation(model, state):
    q, qd, _ = state

    def etot(q, qd):
        e = fs.energy_momentum(model, q, qd)
        return float(e["ke"] + e["pe"])

    dt = 1e-5
    qq, vv = q, qd
    for _ in range(100):
        acc = fs.fd_ab(model, qq, vv, jnp.zeros(18))
        vv = vv + dt * acc
        qq = qq + dt * vv
    assert abs(etot(qq, vv) - etot(q, qd)) < 1e-4


def test_joint_pd_sim_settles(model):
    """dynamicSim analogue: drop from 0.35 m with joint PD toward q_home;
    the robot must come to rest upright on its feet without NaNs."""
    q0 = jnp.asarray(model.q_home).at[2].set(0.35)
    qs, qds, grfs = fs.joint_pd_sim(
        model,
        q0,
        jnp.zeros(18),
        jnp.asarray(model.q_home[6:]),
        jnp.zeros(12),
        kp=1000.0,
        kd=30.0,
        dt=1e-4,
        n_steps=15000,
        tau_limit=jnp.asarray(model.tau_max[:12]),
    )
    assert not bool(jnp.any(jnp.isnan(qs)))
    # settled: base upright above the feet, joint targets tracked
    assert float(qs[-1, 2]) > 0.05
    assert float(jnp.max(jnp.abs(qs[-1, 6:] - model.q_home[6:]))) < 0.1
    # residual contact jitter stays bounded
    assert float(jnp.max(jnp.abs(qds[-1]))) < 10.0
    # total weight supported by the ground at rest (m g = 80.95 N)
    fz_total = float(jnp.sum(grfs[-1, :, 2]))
    assert abs(fz_total - 8.252 * 9.81) < 10.0
