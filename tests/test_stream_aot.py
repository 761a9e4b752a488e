"""Streaming retry-chain (V attempts) + jax.export step artifacts.

Covers the round-5 additions to parallel/stream.py:

- a 3-attempt cold-guess chain (ballistic -> nn -> reference) driven by
  the lane variant flag, with per-attempt deadlines;
- export_step/load_step: the serialized fused step must reproduce the
  traced run exactly (same finished/converged sets) and must REFUSE blobs
  whose configuration key mismatches.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from landing_controller_tpu.api import LandingSolver
from landing_controller_tpu.parallel import StreamingSolver
from landing_controller_tpu.solver import IPConfig


def _sampler(n, seed=3):
    rng = np.random.default_rng(seed)
    q = np.zeros((n, 6), np.float32)
    q[:, 2] = 0.6
    q[:, 4] = rng.uniform(-0.4, 0.4, n)
    qd = np.zeros((n, 6), np.float32)
    qd[:, 5] = -rng.uniform(1.0, 2.5, n)
    return q, qd


@pytest.mark.slow
def test_stream_retry_chain_and_aot_roundtrip(tmp_path):
    cfg = IPConfig(
        max_iter=60, hessian_mode="hybrid", mu_min=1e-5, tol=2e-4,
        sigma_max=1e5, refine_steps=1, relax_scale=1.0, delta_c=1e-6,
        kkt_backend="cri",
    )
    s = LandingSolver(
        "srbm_lcp", n_knots=21, dtype=jnp.float32, structured=True,
        config=cfg, guess="ballistic", retry_guess=("nn", "reference"),
    )
    mk = lambda: StreamingSolver(
        s, batch=8, segment=20, sampler=lambda n: _sampler(n),
        retry_failed=True, attempt_iters=(40, 40, 60),
    )
    ss = mk()
    assert ss.n_attempts == 3
    r1 = ss.run(16)
    assert r1["n_finished"] == 16

    path = str(tmp_path / "step.jaxexport")
    ss.export_step(path, 16)

    ss2 = mk()
    assert ss2.load_step(path, 16) is True
    r2 = ss2.run(16)
    assert r2["n_finished"] == r1["n_finished"]
    assert r2["n_converged"] == r1["n_converged"]
    np.testing.assert_array_equal(r2["converged_mask"], r1["converged_mask"])

    # a mismatched configuration must refuse the blob (different segment
    # length changes the compiled program)
    ss3 = StreamingSolver(
        s, batch=8, segment=10, sampler=lambda n: _sampler(n),
        retry_failed=True, attempt_iters=(40, 40, 60),
    )
    assert ss3.load_step(path, 16) is False
