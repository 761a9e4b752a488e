"""Batched training-data factory for the learned warm start.

The reference generates samples one at a time through a three-stage native
solve cascade with a human accept/reject gate
(generate_training_data_automated.m:36-221).  Here the whole factory is a
vmapped cascade over a batch of sampled drop conditions; the convergence
mask replaces the human gate (failed scenarios are dropped, not fatal).

Input per sample: the 9-D initial condition [rpy, omega, v]
(generate_training_data_automated.m:208-213); output: the kinodynamic
solution (X, U, jpos) = 972 numbers, plus touchdown indices after
normalization (976 total).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..warmstart.reference import sample_drop_scenario


def generate_training_data(cascade_fn, n_samples: int, key=None, batch_size: int = 32):
    """Run the cascade over sampled scenarios and collect accepted solutions.

    cascade_fn: jitted (q_init, qd_init) -> (kino_solution, srbm_solution)
    (see warmstart.cascade.make_cascade).  Returns a dict of numpy arrays
    with only the converged samples:
    {"inputs" (M,9), "X" (M,N,12), "U" (M,N-1,24), "jpos" (M,N-1,12)}.
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    batched_cascade = jax.jit(jax.vmap(cascade_fn))

    inputs, Xs, Us, jposs = [], [], [], []
    n_done = 0
    while n_done < n_samples:
        b = min(batch_size, n_samples - n_done)
        keys = jax.random.split(jax.random.fold_in(key, n_done), b)
        q0s, qd0s = jax.vmap(sample_drop_scenario)(keys)
        sol2, _ = batched_cascade(q0s, qd0s)
        ok = np.asarray(sol2.converged)
        inputs.append(np.concatenate([np.asarray(q0s)[ok, 3:6], np.asarray(qd0s)[ok]], axis=1))
        Xs.append(np.asarray(sol2.X)[ok])
        Us.append(np.asarray(sol2.U)[ok])
        jposs.append(np.asarray(sol2.jpos)[ok])
        n_done += b
    return {
        "inputs": np.concatenate(inputs),
        "X": np.concatenate(Xs),
        "U": np.concatenate(Us),
        "jpos": np.concatenate(jposs),
    }


def generate_training_data_streaming(
    solver, n_samples: int, key=None, batch: int = 64, segment: int = 50,
    max_wall_s: float | None = None,
):
    """Streaming training-data factory: device-resident scenario pool with
    continuous lane refill (parallel/stream.py, collect_z) instead of the
    vmapped cascade — throughput follows the AVERAGE iteration count, so
    generating thousands of converged kinodynamic solutions takes minutes
    where the max-lane batched cascade took an hour.

    solver: a kinodynamic LandingSolver (cold solves; its convergence mask
    replaces the reference's human gate).  Returns the same dict as
    :func:`generate_training_data`.
    """
    from ..parallel.stream import StreamingSolver

    if key is None:
        key = jax.random.PRNGKey(0)
    key_box = [key]

    def sampler(n):
        key_box[0], sub = jax.random.split(key_box[0])
        keys = jax.random.split(sub, n)
        return jax.vmap(sample_drop_scenario)(keys)

    # per-attempt deadlines sized to THIS solver family: the StreamingSolver
    # default (100, 150) is tuned for srbm_lcp (p50 ~60 iters); kinodynamic
    # cold solves run ~2x longer, and clipping them at 100 iterations kills
    # most lanes that would converge — the factory-yield collapse behind the
    # round-3 39-sample artifact.  Give every attempt the solver's full
    # iteration budget; the stall detector still reaps hopeless lanes early.
    mi = solver.config.max_iter
    ss = StreamingSolver(
        solver, batch=batch, segment=segment, sampler=sampler, collect_z=True,
        attempt_iters=(mi, mi),
    )
    stats = ss.run(n_samples, max_wall_s=max_wall_s)
    ok = stats["converged_mask"]
    z = stats["z"][ok]
    ics = stats["ics"][ok]
    prob = solver.problem
    Xs, Us, Js = [], [], []
    for zi in z:
        v = prob.unpack(jnp.asarray(zi))
        Xs.append(np.asarray(v.X)); Us.append(np.asarray(v.U)); Js.append(np.asarray(v.jpos))
    return {
        "inputs": np.concatenate([ics[:, 3:6], ics[:, 6:12]], axis=1),
        "X": np.stack(Xs),
        "U": np.stack(Us),
        "jpos": np.stack(Js),
    }
