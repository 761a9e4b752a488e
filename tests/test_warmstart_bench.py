"""Four-regime warm-start timing harness (nn_warmstart.m analogue)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from landing_controller_tpu.api import LandingSolver
from landing_controller_tpu.analysis import (
    plot_warmstart_comparison,
    warmstart_comparison,
)
from landing_controller_tpu.solver import IPConfig
from landing_controller_tpu.warmstart.nn import DataStats, N_KNOTS, init_mlp


@pytest.mark.slow
def test_warmstart_comparison_runs(tmp_path):
    """Smoke: tiny iteration budgets, untrained NN, 2 trials x 2 scenarios;
    rows are positive timings with the right shapes."""
    n = N_KNOTS  # the NN warm-start pipeline is tied to the production N=21
    cfg = IPConfig(max_iter=3, hessian_mode="gn", relax_scale=1.0)
    kino = LandingSolver("kinodynamic", dtype=jnp.float32, config=cfg)
    srbm = LandingSolver("srbm_lcp", n_knots=n, dtype=jnp.float32, config=cfg)

    nn_params = init_mlp(jax.random.PRNGKey(0), hidden=8, depth=2)
    stats = DataStats(
        mean_input=jnp.zeros(9), std_input=jnp.ones(9),
        mean_X=jnp.zeros((n, 12)), std_X=jnp.ones((n, 12)),
        mean_c=jnp.zeros((n - 1, 12)), std_c=jnp.ones((n - 1, 12)),
        mean_jpos=jnp.zeros((n - 1, 12)), std_jpos=jnp.ones((n - 1, 12)),
        mass=jnp.asarray(8.25),
    )

    rng = np.random.default_rng(0)
    q0s = np.zeros((2, 2, 6), np.float32)
    q0s[..., 2] = 0.5
    qd0s = np.zeros((2, 2, 6), np.float32)
    qd0s[..., 5] = -rng.uniform(1.0, 2.0, (2, 2)).astype(np.float32)

    result = warmstart_comparison(kino, srbm, nn_params, stats, q0s, qd0s, n_trials=2)
    for k in ("nn_eval", "nn_ws", "cold", "srbm_ws"):
        assert result["t"][k].shape == (2,)
        assert (result["t"][k] > 0).all()
    assert result["t"]["nn_eval"].mean() < result["t"]["cold"].mean()
    out = tmp_path / "ws.png"
    plot_warmstart_comparison(result, save_path=str(out))
    assert out.exists()
