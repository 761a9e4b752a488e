"""Solve-time comparison across warm-start regimes — the reference's own
benchmark harness (generate_data/nn_warmstart.m:32-235, SURVEY.md §3.4/§6).

Per trial, times four rows on the same scenario batch:

- ``nn_eval``   : MLP inference only (9-D IC -> 976-D trajectory guess)
- ``nn_ws``     : kinodynamic solve warm-started from the NN guess
- ``cold``      : kinodynamic solve from the linspace reference guess
- ``srbm_ws``   : SRBM-LCP solve -> IK -> kinodynamic solve (the cascade)

The reference runs these serially per scenario and boxplots t_solve
(nn_warmstart.m:232-235); here each row is one batched, jitted solve and
timings are wall-clock around `block_until_ready`.  Compile time is paid
once in a warm-up pass (the reference's analogue: loading the pre-compiled
.casadi artifact).
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from ..warmstart.cascade import make_cascade
from ..warmstart.nn import nn_warmstart_guess


def warmstart_comparison(
    kino_solver,
    srbm_solver,
    nn_params,
    stats,
    q0s,
    qd0s,
    n_trials: int = 5,
):
    """Run the four-regime timing comparison.

    q0s/qd0s: (n_trials, B, 6) scenario batches (one batch per trial; equal
    shapes so every trial reuses the compiled executables).  Returns a dict
    with per-trial timing rows (seconds) and per-regime convergence rates.
    """
    q0s = jnp.asarray(q0s, kino_solver.dtype)
    qd0s = jnp.asarray(qd0s, kino_solver.dtype)
    assert q0s.ndim == 3 and q0s.shape[0] >= n_trials

    problem = kino_solver.problem

    @jax.jit
    def nn_guess_batch(qb, qdb):
        return jax.vmap(
            lambda q, qd: nn_warmstart_guess(nn_params, stats, q, qd, problem)
        )(qb, qdb)

    # warm regimes solve at the solver's own cold barrier: the round-5
    # cascade ablation (tools/cascade_sweep.py) measured the reduced
    # mu_init=1e-2 restart as the dominant warm-start failure source
    # (every seed family loses 6-20pp vs the 1e-1 cold barrier — a
    # near-feasible but uncentered seed needs barrier room to re-center)
    kino_warm = kino_solver

    @jax.jit
    def nn_ws_batch(qb, qdb, z0b):
        return jax.vmap(kino_warm._solve_impl)(qb, qdb, z0b)

    cascade = make_cascade(srbm_solver, kino_solver)
    cascade_batch = jax.jit(jax.vmap(cascade))

    def _timed(fn, *args):
        out = fn(*args)
        jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
        t0 = time.time()
        out = fn(*args)
        jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
        return time.time() - t0, out

    # warm-up compiles on trial 0 (not timed)
    z0w = nn_guess_batch(q0s[0], qd0s[0])
    jax.block_until_ready(z0w)
    for warm in (
        lambda: nn_ws_batch(q0s[0], qd0s[0], z0w),
        lambda: kino_solver.solve_batch(q0s[0], qd0s[0]),
        lambda: cascade_batch(q0s[0], qd0s[0]),
    ):
        jax.block_until_ready(jax.tree_util.tree_leaves(warm())[0])

    rows = {k: [] for k in ("nn_eval", "nn_ws", "cold", "srbm_ws")}
    conv = {k: [] for k in ("nn_ws", "cold", "srbm_ws")}
    for t in range(n_trials):
        qb, qdb = q0s[t], qd0s[t]
        dt, z0b = _timed(nn_guess_batch, qb, qdb)
        rows["nn_eval"].append(dt)
        dt, sol = _timed(nn_ws_batch, qb, qdb, z0b)
        rows["nn_ws"].append(dt)
        conv["nn_ws"].append(float(np.array(sol.converged).mean()))
        dt, sol = _timed(kino_solver.solve_batch, qb, qdb)
        rows["cold"].append(dt)
        conv["cold"].append(float(np.array(sol.converged).mean()))
        dt, (sol2, _) = _timed(cascade_batch, qb, qdb)
        rows["srbm_ws"].append(dt)
        conv["srbm_ws"].append(float(np.array(sol2.converged).mean()))

    return {
        "t": {k: np.asarray(v) for k, v in rows.items()},
        "convergence": {k: np.asarray(v) for k, v in conv.items()},
        "batch_size": int(q0s.shape[1]),
    }


def plot_warmstart_comparison(result, save_path=None):
    """Boxplot of per-trial solve times per regime (nn_warmstart.m:232-235)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    keys = ["nn_eval", "nn_ws", "cold", "srbm_ws"]
    data = [result["t"][k] for k in keys]
    fig, ax = plt.subplots(figsize=(6, 4))
    ax.boxplot(data, tick_labels=["NN eval", "NN-WS", "cold", "SRBM-WS"])
    ax.set_ylabel(f"wall time per batch of {result['batch_size']} [s]")
    ax.set_title("Warm-start regimes: batched solve time")
    ax.grid(alpha=0.3)
    if save_path:
        fig.savefig(save_path, dpi=110, bbox_inches="tight")
        plt.close(fig)
        return save_path
    return fig
