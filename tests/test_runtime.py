"""Native runtime tests: build, sampler rule parity, pool, result log."""

import os
import tempfile

import numpy as np
import pytest

from landing_controller_tpu.runtime import (
    NativeScenarioPool,
    ResultLog,
    native_available,
    read_result_log,
    sample_scenarios_native,
)


def test_native_builds():
    assert native_available(), "C++ toolchain present in this image; build must succeed"


def test_sampler_ranges_and_height_rule():
    q, qd = sample_scenarios_native(7, 512)
    assert np.abs(q[:, 3]).max() <= 0.25 and np.abs(q[:, 5]).max() <= 0.25
    assert np.abs(q[:, 4]).max() <= np.pi / 3
    assert (qd[:, 5] <= -0.5).all() and (qd[:, 5] >= -5.0).all()
    assert np.abs(qd[:, :3]).max() <= 0.5
    # hip-clearance height rule: z0 = 0.35 + |min hip z| + |dt0*vz|, recompute in numpy
    from landing_controller_tpu.dynamics.rotations import rpy_to_rot_xyz
    import jax.numpy as jnp

    hips = np.array([[0.19, -0.1, 0], [0.19, 0.1, 0], [-0.19, -0.1, 0], [-0.19, 0.1, 0]])
    for i in range(8):
        R = np.asarray(rpy_to_rot_xyz(jnp.asarray(q[i, 3:6], jnp.float64)))
        z_expected = 0.35 + abs((hips @ R.T)[:, 2].min()) + abs(0.05 * qd[i, 5])
        assert abs(q[i, 2] - z_expected) < 1e-5


def test_pool_produces_batches():
    with NativeScenarioPool(batch=16, depth=2, threads=2, seed=3) as pool:
        q1, qd1 = pool.next()
        q2, qd2 = pool.next()
    assert q1.shape == (16, 6) and qd2.shape == (16, 6)
    assert not np.allclose(q1, q2)  # distinct batches


def test_result_log_roundtrip_and_truncation_safety():
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "results.bin")
        z = np.arange(30, dtype=np.float32)
        with ResultLog(path) as log:
            assert log.append_solution(np.zeros(6), np.ones(6), z, True)
            assert log.append_solution(np.ones(6), np.zeros(6), 2 * z, False)
        recs = read_result_log(path)
        assert len(recs) == 2
        np.testing.assert_allclose(recs[0]["z"], z)
        assert recs[0]["converged"] and not recs[1]["converged"]
        # torn tail write must not break earlier records
        with open(path, "ab") as f:
            f.write(b"\x4b\x54\x43\x4c\xff\xff")
        assert len(read_result_log(path)) == 2
