"""Animation viewer smoke tests (showmotion analogue, SURVEY.md §2.4)."""

import numpy as np
import pytest

from landing_controller_tpu.models import get_robot_params
from landing_controller_tpu.viz import animate_landing
from landing_controller_tpu.viz.animate import _chain_points
from landing_controller_tpu.dynamics import legs

import jax.numpy as jnp


def test_chain_foot_matches_fk():
    """The viewer's foot point must equal the NLP's FK foot position."""
    params = get_robot_params("mc3D")
    rng = np.random.default_rng(3)
    q_base = np.array([0.1, -0.2, 0.45, 0.1, 0.3, -0.2])
    jpos = rng.uniform(-0.8, 0.8, 12)
    pts = _chain_points(params, q_base, jpos)
    feet_ref = np.asarray(
        legs.foot_positions_world(params, jnp.asarray(q_base), jnp.asarray(jpos))
    )
    np.testing.assert_allclose(pts[:, 2, :], feet_ref, atol=1e-6)


def test_animate_writes_gif(tmp_path):
    params = get_robot_params("mc3D")
    n = 4
    t = np.linspace(0.0, 0.3, n)
    X = np.zeros((n, 12))
    X[:, 2] = np.linspace(0.6, 0.3, n)
    X[:, 4] = np.linspace(0.4, 0.0, n)
    jpos = np.tile(np.array([0.0, -0.8, 1.6] * 4), (n, 1))
    U = np.zeros((n - 1, 24))
    U[:, 14] = 30.0  # one leg pressing
    out = tmp_path / "landing.gif"
    path = animate_landing(params, t, X, jpos, U=U, save_path=str(out), fps=5)
    assert out.exists() and out.stat().st_size > 1000, path
