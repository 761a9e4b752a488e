"""Rotor-reflected dynamics (dynamics_one_step.m / add_rotors.m analogue)."""

import jax.numpy as jnp
import numpy as np

from landing_controller_tpu.dynamics.featherstone import (
    h_and_c,
    h_and_c_rotors,
    quad3d_rotor_model,
)
from landing_controller_tpu.models import get_robot_model, get_robot_params

PARAMS = get_robot_params("mc3D")
MODEL = get_robot_model("mc3D")
I_AX = 33e-6  # axial rotor inertia placeholder (datasheet-style value)


def _state(seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.uniform(-0.4, 0.4, MODEL.nb), jnp.float64)
    qd = jnp.asarray(rng.uniform(-1.0, 1.0, MODEL.nb), jnp.float64)
    return q, qd


def test_zero_rotor_reduces_to_plain_dynamics():
    rotors = quad3d_rotor_model(MODEL, PARAMS, rotor_inertia_axial=0.0)
    q, qd = _state()
    H0, C0 = h_and_c(MODEL, q, qd)
    H1, C1 = h_and_c_rotors(MODEL, rotors, q, qd)
    np.testing.assert_allclose(np.asarray(H1), np.asarray(H0), atol=1e-14)
    np.testing.assert_allclose(np.asarray(C1), np.asarray(C0), atol=1e-14)


def test_reflected_inertia_on_diagonal():
    """H[i,i] grows by exactly gr_i^2 * I_axial for every actuated joint
    (dynamics_one_step.m:44-45), at any configuration."""
    rotors = quad3d_rotor_model(MODEL, PARAMS, rotor_inertia_axial=I_AX)
    q, qd = _state(1)
    H0, _ = h_and_c(MODEL, q, qd)
    H1, _ = h_and_c_rotors(MODEL, rotors, q, qd)
    d = np.asarray(H1 - H0)
    gears = [
        PARAMS.abad_gear_ratio, PARAMS.hip_gear_ratio, PARAMS.knee_gear_ratio,
    ]
    for leg in range(4):
        # knee joints: no descendant rotors, so the diagonal increment is
        # EXACTLY the reflected inertia
        knee = 6 + 3 * leg + 2
        np.testing.assert_allclose(
            d[knee, knee], gears[2] ** 2 * I_AX, rtol=1e-9,
            err_msg=f"joint {knee}",
        )
        # abad/hip subtrees contain their children's rotors (those join the
        # composite inertia, as in the reference's Ic{p} update), so the
        # increment is at least the reflected term
        for j in range(2):
            i = 6 + 3 * leg + j
            assert d[i, i] >= gears[j] ** 2 * I_AX - 1e-12, f"joint {i}"


def test_rotor_H_symmetric_posdef():
    rotors = quad3d_rotor_model(MODEL, PARAMS, rotor_inertia_axial=I_AX)
    q, qd = _state(2)
    H, _ = h_and_c_rotors(MODEL, rotors, q, qd)
    Hn = np.asarray(H)
    np.testing.assert_allclose(Hn, Hn.T, atol=1e-12)
    w = np.linalg.eigvalsh(Hn)
    assert w.min() > 0.0


def test_rotor_offdiagonal_reaction_path():
    """The geared rotor couples its joint to the ancestors (the gr * I_r S
    reaction term, dynamics_one_step.m:46-47 and LOOP 4) — off-diagonal
    entries between an actuated joint and its parent chain must change."""
    rotors = quad3d_rotor_model(MODEL, PARAMS, rotor_inertia_axial=I_AX)
    q, qd = _state(3)
    H0, _ = h_and_c(MODEL, q, qd)
    H1, _ = h_and_c_rotors(MODEL, rotors, q, qd)
    d = np.asarray(np.abs(H1 - H0))
    i = 8  # first leg knee
    assert d[i, 7] > 0.0 and d[i, 6] > 0.0  # hip + abad coupling


def test_massless_rotor_gravity_free():
    """Massless rotors add no bias at rest (their spatial force is purely
    rotational and the gravity acceleration has no angular part)."""
    rotors = quad3d_rotor_model(MODEL, PARAMS, rotor_inertia_axial=I_AX)
    q, _ = _state(4)
    qd0 = jnp.zeros(MODEL.nb, jnp.float64)
    _, C0 = h_and_c(MODEL, q, qd0)
    _, C1 = h_and_c_rotors(MODEL, rotors, q, qd0)
    np.testing.assert_allclose(np.asarray(C1), np.asarray(C0), atol=1e-12)
    # massive rotors DO shift the bias (their weight loads the parents)
    rot_m = quad3d_rotor_model(
        MODEL, PARAMS, rotor_inertia_axial=I_AX, rotor_mass=0.05
    )
    _, C2 = h_and_c_rotors(MODEL, rot_m, q, qd0)
    assert float(jnp.max(jnp.abs(C2 - C0))) > 1e-4


def test_rotor_bias_velocity_terms():
    """At nonzero joint rates the rotor gyroscopic/velocity-product terms
    enter C on the geared joints (dynamics_one_step.m:52-58)."""
    rotors = quad3d_rotor_model(MODEL, PARAMS, rotor_inertia_axial=1e-3)
    q, qd = _state(5)
    _, C0 = h_and_c(MODEL, q, qd)
    _, C1 = h_and_c_rotors(MODEL, rotors, q, qd)
    dC = np.asarray(np.abs(C1 - C0))
    assert dC[6:].max() > 1e-6
