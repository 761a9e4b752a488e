"""Streaming batched solver: continuous scenario throughput.

A vmapped interior-point solve runs its `lax.while_loop` until EVERY lane
finishes, so batch wall time is max-lane iterations — at <100% convergence
the slowest/failed lane sets the pace and finished lanes idle (masked, not
skipped).  This driver instead runs the solve in K-iteration **segments**
(solver.ip.solve's state0/segment_iters mode) and refills finished lanes
with fresh scenarios, so throughput scales with the *average* iteration
count instead of the max.

The whole harvest/refill cycle is **device-resident** (round-3 redesign):
the scenario pool is pre-staged on device, and one jitted step function
runs [segment -> harvest results into per-scenario slots -> assign pool
scenarios to finished lanes -> re-initialize those lanes] with zero host
round-trips.  The host only polls a small packed stats array, one transfer
per segment, *after* dispatching the next segment so the transfer overlaps
compute.  (The previous host-side driver cost ~170 ms per ~390 ms segment
through the axon tunnel: a separate init dispatch, a 20-leaf tree-merge,
and 4+ device->host reads per segment.)

This is the serving architecture for the pod-scale Monte-Carlo config
(BASELINE config 5); the reference's counterpart is the serial solve loop
in generate_training_data_automated.m:38 / foot_positions.m:32.
"""

from __future__ import annotations

import time
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class _StreamCarry(NamedTuple):
    lane_q: jnp.ndarray  # (B, 6)
    lane_qd: jnp.ndarray  # (B, 6)
    lane_sid: jnp.ndarray  # (B,) scenario id per lane (P = retired/dump)
    lane_variant: jnp.ndarray  # (B,) cold-guess variant (retry policy)
    lane_prev_iters: jnp.ndarray  # (B,) iterations spent in earlier attempts
    state: object  # vmapped IPState
    cursor: jnp.ndarray  # next unassigned pool index
    active: jnp.ndarray  # (B,) lane owns an unharvested scenario
    # packed per-scenario results, (4, P+1): rows = finished flag,
    # converged flag, iterations, constraint violation; column P is the
    # scatter dump slot for non-harvesting lanes
    res: jnp.ndarray
    res_z: jnp.ndarray  # (P+1, n_vars) harvested solutions (collect_z) or (P+1, 0)
    n_finished: jnp.ndarray  # scalar, res[0, :P].sum()


class StreamingSolver:
    """Continuous-throughput wrapper over one LandingSolver.

    sampler(n) -> (q (n,6), qd (n,6)) numpy/jnp arrays of fresh scenarios.
    """

    def __init__(
        self,
        solver,
        batch: int = 64,
        segment: int = 50,
        sampler: Callable | None = None,
        retry_failed: bool = True,
        attempt_iters: tuple = (100, 150),
        collect_z: bool = False,
        steps_per_call: int = 4,
    ):
        self.solver = solver
        self.batch = batch
        self.segment = segment
        # retry policy: a scenario whose first attempt fails is re-solved
        # once in place with the alternate cold-guess family before being
        # recorded (measured: rescues ~1/3 of ballistic-guess failures);
        # its recorded iteration count is the SUM over attempts, so the
        # throughput metric pays for the retries honestly
        self.retry_failed = retry_failed
        # per-attempt iteration deadlines (first, retry): non-converging
        # lanes evade the in-solver stall detector (they keep scraping >10%
        # off their best score per window without ever converging) and
        # would otherwise burn the full max_iter TWICE per failed scenario;
        # converged lanes finish at p50 ~60, so a ~2.5x-p50 deadline costs
        # almost no real convergences while halving the failure tax
        self.attempt_iters = attempt_iters
        # collect_z: also scatter each finished scenario's solution vector
        # into a device-resident (P, n_vars) result array (the streaming
        # training-data factory path)
        self.collect_z = collect_z
        if sampler is None:
            from ..warmstart.reference import sample_drop_scenario

            key_box = [jax.random.PRNGKey(0)]

            def sampler(n):
                key_box[0], sub = jax.random.split(key_box[0])
                keys = jax.random.split(sub, n)
                q, qd = jax.vmap(sample_drop_scenario)(keys)
                return q, qd

        self.sampler = sampler
        # steps_per_call: how many [segment -> harvest -> refill] cycles run
        # inside ONE dispatched executable (lax.scan).  Each host dispatch
        # through the axon tunnel costs ~100-200 ms of latency; at ~400 ms
        # per segment that is a ~2x tax at 1 step/call (measured: streaming
        # 14.7 ms/batch-iter vs 7.9 for the bare segment, seg_profile.py).
        self.steps_per_call = max(1, int(steps_per_call))
        self._seg = jax.jit(
            jax.vmap(lambda q, qd, st: solver._segment_impl(q, qd, st, segment)),
        )
        self._init = jax.jit(jax.vmap(solver.init_state))
        self._step_cache = {}
        # pool-state precompute: ONE scanned executable initializes every
        # pool scenario's IPState, B lanes per scan step.  (The first
        # design dispatched one B-wide init per chunk from the host — at
        # factory-scale pools that was 100+ round trips through the
        # high-latency tunnel, ~20 minutes of staging.)
        B = batch

        def _init_pool(q_chunks, qd_chunks, variant):
            vv = jnp.full(B, variant, jnp.int32)

            def body(_, qs):
                st = jax.vmap(solver.init_state)(qs[0], qs[1], vv)
                return 0, st

            _, states = jax.lax.scan(body, 0, (q_chunks, qd_chunks))
            # (n_chunks, B, ...) -> (n_chunks * B, ...)
            return jax.tree_util.tree_map(
                lambda leaf: leaf.reshape((-1,) + leaf.shape[2:]), states
            )

        self._init_pool = jax.jit(_init_pool, static_argnums=(2,))

    # ------------------------------------------------------------------
    def _make_step(self, P: int):
        """Build the fused device step for a pool of P scenarios.

        The returned executable runs ``steps_per_call`` full
        [segment -> harvest -> refill] cycles per dispatch (lax.scan) and
        REFILLS lanes by *gathering* precomputed initial IPStates from the
        device-resident pool-state buffers (pool_st0/pool_st1, one per
        cold-guess variant) — the previous design re-ran the full vmapped
        solver init (scale evals + CG dual init, ~85 ms at B=64) inside
        every segment step for all B lanes even when one lane refilled.
        """
        B = self.batch
        solver = self.solver
        segment = self.segment

        retry = self.retry_failed
        a1, a2 = self.attempt_iters

        def step(pool_q, pool_qd, pool_st0, pool_st1, carry: _StreamCarry) -> _StreamCarry:
            summary, new_state = jax.vmap(
                lambda q, qd, st, v: solver._segment_impl(q, qd, st, segment, v)
            )(carry.lane_q, carry.lane_qd, carry.state, carry.lane_variant)

            conv = summary["converged"]
            # per-attempt deadline: lanes past their budget are failed NOW
            deadline = jnp.where(carry.lane_variant == 0, a1, a2)
            timed_out = ~new_state.done & (new_state.it >= deadline) & ~conv
            done = (new_state.done | timed_out) & carry.active
            if retry:
                # failed first attempts are re-solved in place with the
                # alternate cold guess instead of being recorded
                retrying = done & ~conv & (carry.lane_variant == 0)
            else:
                retrying = jnp.zeros_like(done)
            fin = done & ~retrying
            total_iters = summary["iterations"] + carry.lane_prev_iters

            # ---- harvest: scatter this segment's finished lanes into their
            # scenario slots (dump slot P for everyone else)
            sid_sc = jnp.where(fin, carry.lane_sid, P)
            res = carry.res
            res_z = (
                carry.res_z.at[sid_sc].set(summary["z"])
                if self.collect_z
                else carry.res_z
            )
            res = res.at[0, sid_sc].set(1.0)
            res = res.at[1, sid_sc].set(conv.astype(res.dtype))
            res = res.at[2, sid_sc].set(total_iters.astype(res.dtype))
            res = res.at[3, sid_sc].set(summary["constr_viol"].astype(res.dtype))

            # ---- refill finished lanes from the pool (prefix-sum ranks)
            ranks = jnp.cumsum(fin.astype(jnp.int32)) - 1
            new_sid = carry.cursor + ranks
            refill = fin & (new_sid < P)
            idx = jnp.clip(jnp.where(refill, new_sid, 0), 0, P - 1)
            lane_q = jnp.where(refill[:, None], pool_q[idx], carry.lane_q)
            lane_qd = jnp.where(refill[:, None], pool_qd[idx], carry.lane_qd)
            lane_sid = jnp.where(refill, new_sid, jnp.where(fin, P, carry.lane_sid))
            lane_variant = jnp.where(
                refill, 0, jnp.where(retrying, 1, carry.lane_variant)
            )
            lane_prev_iters = jnp.where(
                refill, 0, jnp.where(retrying, total_iters, carry.lane_prev_iters)
            )

            # fresh IPState for refilled/retrying lanes: GATHERED from the
            # precomputed pool-state buffers (refills take variant-0 state
            # of their new scenario; retries take variant-1 state of their
            # current scenario), then merged — no solver re-init on the hot
            # path
            reinit = refill | retrying
            retry_sid = jnp.clip(carry.lane_sid, 0, P - 1)

            def pick(leaf0, leaf1):
                fresh = jnp.where(
                    retrying.reshape((B,) + (1,) * (leaf0.ndim - 1)),
                    leaf1[retry_sid],
                    leaf0[idx],
                )
                return fresh

            fresh = jax.tree_util.tree_map(pick, pool_st0, pool_st1)
            state = jax.tree_util.tree_map(
                lambda f, s: jnp.where(
                    reinit.reshape((B,) + (1,) * (f.ndim - 1)), f, s
                ),
                fresh,
                new_state,
            )
            active = (carry.active & ~fin) | refill
            cursor = jnp.minimum(
                carry.cursor + jnp.sum(fin.astype(jnp.int32)), P
            ).astype(jnp.int32)
            return _StreamCarry(
                lane_q=lane_q,
                lane_qd=lane_qd,
                lane_sid=lane_sid,
                lane_variant=lane_variant,
                lane_prev_iters=lane_prev_iters,
                state=state,
                cursor=cursor,
                active=active,
                res=res,
                res_z=res_z,
                n_finished=jnp.sum(res[0, :P]).astype(jnp.int32),
            )

        K = self.steps_per_call

        def multi(pool_q, pool_qd, pool_st0, pool_st1, carry):
            if K == 1:
                return step(pool_q, pool_qd, pool_st0, pool_st1, carry)
            out, _ = jax.lax.scan(
                lambda c, _: (step(pool_q, pool_qd, pool_st0, pool_st1, c), None),
                carry,
                None,
                length=K,
            )
            return out

        return jax.jit(multi)

    # ------------------------------------------------------------------
    def run(
        self,
        n_scenarios: int,
        max_wall_s: float | None = None,
        progress_cb: Callable | None = None,
    ):
        """Solve n_scenarios scenarios; returns a stats dict.

        The pool is sampled up-front and staged on device; lanes are
        refilled until the pool drains, then the run drains the remaining
        lanes.  progress_cb(stats_dict), if given, is invoked after every
        segment with the cumulative stats so far (the stats lag the device
        by one segment so the read overlaps compute).
        """
        B = self.batch
        P = int(n_scenarios)
        q_np, qd_np = self.sampler(P)
        pool_q = jnp.asarray(q_np, self.solver.dtype)
        pool_qd = jnp.asarray(qd_np, self.solver.dtype)
        ics = np.concatenate([np.asarray(q_np), np.asarray(qd_np)], axis=1)

        step = self._step_cache.get(P)
        if step is None:
            step = self._step_cache[P] = self._make_step(P)

        # ---- precompute initial IPStates for every pool scenario (one
        # scanned executable per cold-guess variant; retries gather the
        # alternate-guess state).  Amortized once per run; removes the
        # per-segment full-batch re-init from the hot loop.
        P_pad = ((P + B - 1) // B) * B
        pad = P_pad - P
        q_pad = jnp.concatenate([pool_q, jnp.tile(pool_q[-1:], (pad, 1))]) if pad else pool_q
        qd_pad = jnp.concatenate([pool_qd, jnp.tile(pool_qd[-1:], (pad, 1))]) if pad else pool_qd
        qc = q_pad.reshape(-1, B, 6)
        qdc = qd_pad.reshape(-1, B, 6)
        pool_st0 = self._init_pool(qc, qdc, 0)
        pool_st1 = self._init_pool(qc, qdc, 1) if self.retry_failed else pool_st0

        first = jnp.minimum(jnp.arange(B), P - 1)
        lane_q = pool_q[first]
        lane_qd = pool_qd[first]
        active0 = jnp.arange(B) < P
        v0 = jnp.zeros(B, jnp.int32)
        carry = _StreamCarry(
            lane_q=lane_q,
            lane_qd=lane_qd,
            lane_sid=jnp.where(active0, jnp.arange(B), P),
            lane_variant=v0,
            lane_prev_iters=v0,
            state=jax.tree_util.tree_map(lambda b: b[first], pool_st0),
            cursor=jnp.asarray(min(B, P), jnp.int32),
            active=active0,
            res=jnp.zeros((4, P + 1), self.solver.dtype),
            res_z=jnp.zeros(
                (P + 1, self.solver.problem.n_vars if self.collect_z else 0),
                self.solver.dtype,
            ),
            n_finished=jnp.asarray(0, jnp.int32),
        )

        t0 = time.time()
        pending_res = None
        while True:
            carry = step(pool_q, pool_qd, pool_st0, pool_st1, carry)  # async dispatch
            if pending_res is not None:
                res_np = np.asarray(pending_res)  # overlaps the step above
                if progress_cb is not None:
                    progress_cb(self._stats(res_np, ics, P, B, t0))
                if int(res_np[0, :P].sum()) >= P:
                    break
            if max_wall_s is not None and time.time() - t0 > max_wall_s:
                pending_res = carry.res
                break
            pending_res = carry.res
        res_np = np.asarray(pending_res)
        out = self._stats(res_np, ics, P, B, t0)
        if self.collect_z:
            out["z"] = np.asarray(carry.res_z)[:P][res_np[0, :P] > 0.5]
        return out

    @staticmethod
    def _stats(res_np, ics, P, B, t0):
        wall = time.time() - t0
        fin = res_np[0, :P] > 0.5
        conv = res_np[1, :P][fin] > 0.5
        its = res_np[2, :P][fin]
        return {
            "wall_s": wall,
            "n_started": int(min(P, fin.sum() + B)),
            "n_finished": int(fin.sum()),
            "n_converged": int(conv.sum()),
            "convergence_rate": float(conv.mean()) if conv.size else 0.0,
            "converged_per_sec": float(conv.sum() / wall),
            "iters_p50": float(np.percentile(its, 50)) if its.size else -1.0,
            "iters_p90": float(np.percentile(its, 90)) if its.size else -1.0,
            "ics": ics[fin],
            "converged_mask": conv,
            "viol": res_np[3, :P][fin],
        }
