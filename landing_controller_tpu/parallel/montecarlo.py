"""Chunked Monte-Carlo landing-envelope sweeps (BASELINE config 5).

Streams scenario batches (native pool when available) through the sharded
batched solver, accumulating success statistics and optional durable
results — the pod-scale replacement for the reference's serial sweep loops
(analysis/foot_positions.m:32-43) and append-on-accept .mat store.

Host round-trips happen only at chunk boundaries; each chunk is one
compiled sharded solve with collective reductions inside.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from .batch import make_scenario_mesh, solve_sharded


def monte_carlo_envelope(
    solver,
    n_scenarios: int,
    chunk: int = 64,
    seed: int = 0,
    mesh=None,
    result_log=None,
    use_native_pool: bool = True,
):
    """Run an n_scenarios Monte-Carlo sweep in chunks.

    solver: a LandingSolver.  Returns a stats dict: success rate, solves/s,
    per-dimension terminal-state envelope over converged scenarios, and the
    sampled ICs + convergence mask (for success-region maps).
    """
    if mesh is None:
        mesh = make_scenario_mesh()
    n_dev = mesh.devices.size
    chunk = max(chunk, n_dev) // n_dev * n_dev  # divisible by mesh size

    if use_native_pool:
        from ..runtime import NativeScenarioPool

        pool = NativeScenarioPool(batch=chunk, depth=2, threads=2, seed=seed)
        sample = pool.next
    else:
        from ..warmstart import sample_drop_scenario

        def sample(_key=[jax.random.PRNGKey(seed)]):
            _key[0], sub = jax.random.split(_key[0])
            keys = jax.random.split(sub, chunk)
            q, qd = jax.vmap(sample_drop_scenario)(keys)
            return np.asarray(q), np.asarray(qd)

    n_conv = 0
    n_done = 0
    t_solve = 0.0
    q_all, conv_all, xT_all = [], [], []
    while n_done < n_scenarios:
        q, qd = sample()
        qj, qdj = jnp.asarray(q), jnp.asarray(qd)
        t0 = time.time()
        sols, stats = solve_sharded(solver._solve_impl, qj, qdj, mesh)
        jax.block_until_ready(sols.z)
        t_solve += time.time() - t0
        n_conv += int(stats["n_converged"])
        n_done += chunk
        conv = np.asarray(sols.converged)
        q_all.append(np.concatenate([q, qd], axis=1))
        conv_all.append(conv)
        xT_all.append(np.asarray(sols.X[:, -1, :]))
        if result_log is not None:
            zs = np.asarray(sols.z)
            for i in range(chunk):
                result_log.append_solution(q[i], qd[i], zs[i], bool(conv[i]))

    ics = np.concatenate(q_all)
    conv = np.concatenate(conv_all)
    xT = np.concatenate(xT_all)
    ok = conv.astype(bool)
    return {
        "n_scenarios": n_done,
        "n_converged": n_conv,
        "success_rate": n_conv / max(1, n_done),
        "solves_per_sec": n_conv / max(t_solve, 1e-9),
        "wall_time_s": t_solve,
        "ics": ics,
        "converged": conv,
        "terminal_states": xT,
        "term_min": xT[ok].min(axis=0) if ok.any() else None,
        "term_max": xT[ok].max(axis=0) if ok.any() else None,
    }
