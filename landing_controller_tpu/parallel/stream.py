"""Streaming batched solver: continuous scenario throughput.

A vmapped interior-point solve runs its `lax.while_loop` until EVERY lane
finishes, so batch wall time is max-lane iterations — at <100% convergence
the slowest/failed lane sets the pace and finished lanes idle (masked, not
skipped).  This driver instead runs the solve in K-iteration **segments**
(solver.ip.solve's state0/segment_iters mode): after each segment, finished
lanes are harvested on the host and refilled with fresh scenarios via a
branch-free `where(done, fresh_state, state)` — static shapes, no
recompilation.  Throughput then scales with the *average* iteration count
instead of the max, and failed lanes stop costing anything beyond their
stall-detection window.

This is the serving architecture for the pod-scale Monte-Carlo config
(BASELINE config 5); the reference's counterpart is the serial solve loop
in generate_training_data_automated.m:38 / foot_positions.m:32.
"""

from __future__ import annotations

import time
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


class StreamingSolver:
    """Continuous-throughput wrapper over one LandingSolver.

    sampler(n) -> (q (n,6), qd (n,6)) numpy/jnp arrays of fresh scenarios.
    """

    def __init__(self, solver, batch: int = 64, segment: int = 50, sampler: Callable | None = None):
        self.solver = solver
        self.batch = batch
        self.segment = segment
        if sampler is None:
            from ..warmstart.reference import sample_drop_scenario

            key_box = [jax.random.PRNGKey(0)]

            def sampler(n):
                key_box[0], sub = jax.random.split(key_box[0])
                keys = jax.random.split(sub, n)
                q, qd = jax.vmap(sample_drop_scenario)(keys)
                return q, qd

        self.sampler = sampler
        self._seg = jax.jit(
            jax.vmap(lambda q, qd, st: solver._segment_impl(q, qd, st, segment)),
        )
        self._init = jax.jit(jax.vmap(solver.init_state))

    def run(
        self,
        n_scenarios: int,
        max_wall_s: float | None = None,
        progress_cb: Callable | None = None,
    ):
        """Solve ~n_scenarios scenarios; returns a stats dict.

        Lanes are refilled until n_scenarios have been *started*; the run
        drains until every started lane finishes.  Collected per finished
        scenario: convergence flag, iterations, violation (and the IC).

        progress_cb(stats_dict), if given, is invoked after every segment
        with the cumulative stats so far — lets a caller snapshot a partial
        result (e.g. a benchmark that must emit a number even if killed
        mid-run).
        """
        B = self.batch
        q, qd = self.sampler(B)
        q = jnp.asarray(q, self.solver.dtype)
        qd = jnp.asarray(qd, self.solver.dtype)
        state = self._init(q, qd)
        started = B
        live = np.ones(B, bool)  # lanes whose current occupant is uncollected
        results = {"converged": [], "iterations": [], "viol": [], "ic": []}
        t0 = time.time()
        n_collected = 0
        while True:
            summary, state = self._seg(q, qd, state)
            done = np.asarray(summary["done"])
            newly = done & live
            if newly.any():
                conv = np.asarray(summary["converged"])[newly]
                its = np.asarray(summary["iterations"])[newly]
                viol = np.asarray(summary["constr_viol"])[newly]
                ics = np.concatenate([np.asarray(q)[newly], np.asarray(qd)[newly]], axis=1)
                results["converged"].append(conv)
                results["iterations"].append(its)
                results["viol"].append(viol)
                results["ic"].append(ics)
                n_collected += int(newly.sum())

                n_refill = min(int(newly.sum()), max(0, n_scenarios - started))
                if n_refill:
                    # refill the first n_refill newly-done lanes with fresh
                    # scenarios (full-batch sample, masked rows used)
                    refill = np.zeros(B, bool)
                    refill[np.where(newly)[0][:n_refill]] = True
                    nq, nqd = self.sampler(B)
                    nq = jnp.asarray(nq, self.solver.dtype)
                    nqd = jnp.asarray(nqd, self.solver.dtype)
                    rmask = jnp.asarray(refill)
                    q = jnp.where(rmask[:, None], nq, q)
                    qd = jnp.where(rmask[:, None], nqd, qd)
                    fresh = self._init(q, qd)
                    state = jax.tree_util.tree_map(
                        lambda f, s: jnp.where(
                            rmask.reshape((B,) + (1,) * (f.ndim - 1)), f, s
                        ),
                        fresh,
                        state,
                    )
                    started += n_refill
                    live = (live & ~newly) | refill
                else:
                    live = live & ~newly
            if progress_cb is not None:
                progress_cb(self._stats(results, started, t0))
            if n_collected >= n_scenarios or not live.any():
                break
            if max_wall_s is not None and time.time() - t0 > max_wall_s:
                break
        return self._stats(results, started, t0)

    @staticmethod
    def _stats(results, started, t0):
        wall = time.time() - t0
        conv = np.concatenate(results["converged"]) if results["converged"] else np.zeros(0, bool)
        its = np.concatenate(results["iterations"]) if results["iterations"] else np.zeros(0, int)
        return {
            "wall_s": wall,
            "n_started": started,
            "n_finished": int(conv.shape[0]),
            "n_converged": int(conv.sum()),
            "convergence_rate": float(conv.mean()) if conv.size else 0.0,
            "converged_per_sec": float(conv.sum() / wall),
            "iters_p50": float(np.percentile(its, 50)) if its.size else -1.0,
            "iters_p90": float(np.percentile(its, 90)) if its.size else -1.0,
            "ics": np.concatenate(results["ic"]) if results["ic"] else np.zeros((0, 12)),
            "converged_mask": conv,
        }
