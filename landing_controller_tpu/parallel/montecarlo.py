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
from .multihost import global_scenario_batch, local_shards, replicated_value


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

    Multi-process (>= 2 hosts): every process calls this with the same
    global `n_scenarios`/`chunk`; each samples its local shard (seeded by
    process index), the batch is assembled as a global sharded array, and
    the returned per-lane arrays (`ics`, `converged`, `terminal_states`)
    are this process's local rows while the counts are global.  In that
    regime n_scenarios is rounded up to a multiple of `chunk` (partial-chunk
    accounting needs no cross-host gather in the single-process case only).
    """
    if mesh is None:
        mesh = make_scenario_mesh()
    n_dev = mesh.devices.size
    n_proc = jax.process_count()
    chunk = max(chunk, n_dev, n_proc) // n_dev * n_dev  # divisible by mesh size
    if n_proc > 1:
        n_scenarios = -(-n_scenarios // chunk) * chunk
        seed = seed * 1000003 + jax.process_index()
    chunk_local = chunk // n_proc

    if use_native_pool:
        from ..runtime import NativeScenarioPool

        pool = NativeScenarioPool(batch=chunk_local, depth=2, threads=2, seed=seed)
        sample = pool.next
    else:
        from ..warmstart import sample_drop_scenario

        def sample(_key=[jax.random.PRNGKey(seed)]):
            _key[0], sub = jax.random.split(_key[0])
            keys = jax.random.split(sub, chunk_local)
            q, qd = jax.vmap(sample_drop_scenario)(keys)
            return np.asarray(q), np.asarray(qd)

    n_conv = 0
    n_done = 0
    t_solve = 0.0
    q_all, conv_all, xT_all = [], [], []
    while n_done < n_scenarios:
        # the solve always runs a full mesh-divisible chunk; only the first
        # `take` lanes of the final chunk count toward the requested total
        # (multi-process: n_scenarios was rounded so take == chunk always)
        take = min(chunk, n_scenarios - n_done)
        take_local = take if n_proc == 1 else take // n_proc
        q, qd = sample()
        qj = global_scenario_batch(q, mesh)
        qdj = global_scenario_batch(qd, mesh)
        t0 = time.time()
        sols, stats = solve_sharded(solver._solve_impl, qj, qdj, mesh)
        jax.block_until_ready(sols.z)
        t_solve += time.time() - t0
        if n_proc == 1:
            conv = np.asarray(sols.converged)[:take]
            n_conv += int(conv.sum())
            zs = np.asarray(sols.z)[:take]
            lams = np.asarray(sols.lam)[:take]
            xT = np.asarray(sols.X[:take, -1, :])
        else:
            conv = local_shards(sols.converged)[:take_local]
            n_conv += int(replicated_value(stats["n_converged"]))
            zs = local_shards(sols.z)[:take_local]
            lams = local_shards(sols.lam)[:take_local]
            xT = local_shards(sols.X)[:take_local, -1, :]
        n_done += take
        q_all.append(np.concatenate([q[:take_local], qd[:take_local]], axis=1))
        conv_all.append(conv)
        xT_all.append(xT)
        if result_log is not None:
            for i in range(take_local):
                result_log.append_solution(q[i], qd[i], zs[i], bool(conv[i]), lam=lams[i])

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
