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
        # per-attempt iteration deadlines (first, retry, [retry2, ...]):
        # non-converging lanes evade the in-solver stall detector (they
        # keep scraping >10% off their best score per window without ever
        # converging) and would otherwise burn the full max_iter on EVERY
        # attempt of a failed scenario; converged lanes finish at p50 ~60,
        # so a ~2.5x-p50 deadline costs almost no real convergences while
        # halving the failure tax.  len(attempt_iters) sets the attempt
        # count: variant k's cold guess is the solver's retry chain entry
        # k-1 (api.LandingSolver retry_guess).
        self.attempt_iters = tuple(attempt_iters)
        self.n_attempts = len(self.attempt_iters) if retry_failed else 1
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
        device-resident pool-state buffer ``pool_sts`` (leading axis =
        cold-guess variant, one slot per attempt) — the previous design
        re-ran the full vmapped solver init (scale evals + CG dual init,
        ~85 ms at B=64) inside every segment step for all B lanes even
        when one lane refilled.
        """
        B = self.batch
        solver = self.solver
        segment = self.segment

        V = self.n_attempts
        att = jnp.asarray(self.attempt_iters[:V] or (10**9,), jnp.int32)

        def step(pool_q, pool_qd, pool_sts, carry: _StreamCarry) -> _StreamCarry:
            summary, new_state = jax.vmap(
                lambda q, qd, st, v: solver._segment_impl(q, qd, st, segment, v)
            )(carry.lane_q, carry.lane_qd, carry.state, carry.lane_variant)

            conv = summary["converged"]
            # per-attempt deadline: lanes past their budget are failed NOW
            deadline = att[jnp.clip(carry.lane_variant, 0, V - 1)]
            timed_out = ~new_state.done & (new_state.it >= deadline) & ~conv
            done = (new_state.done | timed_out) & carry.active
            # failed attempts re-solve in place down the retry chain
            # instead of being recorded
            retrying = done & ~conv & (carry.lane_variant < V - 1)
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
            next_variant = jnp.clip(carry.lane_variant + 1, 0, V - 1)
            lane_variant = jnp.where(
                refill, 0, jnp.where(retrying, next_variant, carry.lane_variant)
            )
            lane_prev_iters = jnp.where(
                refill, 0, jnp.where(retrying, total_iters, carry.lane_prev_iters)
            )

            # fresh IPState for refilled/retrying lanes: GATHERED from the
            # precomputed pool-state buffer (refills take variant-0 state
            # of their new scenario; retries take their next variant's
            # state of their current scenario), then merged — no solver
            # re-init on the hot path
            reinit = refill | retrying
            retry_sid = jnp.clip(carry.lane_sid, 0, P - 1)

            def pick(leaf):
                # leaf: (V, P, ...) stacked pool states
                fresh = jnp.where(
                    retrying.reshape((B,) + (1,) * (leaf.ndim - 2)),
                    leaf[next_variant, retry_sid],
                    leaf[0, idx],
                )
                return fresh

            fresh = jax.tree_util.tree_map(pick, pool_sts)
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

        def multi(pool_q, pool_qd, pool_sts, carry):
            if K == 1:
                return step(pool_q, pool_qd, pool_sts, carry)
            out, _ = jax.lax.scan(
                lambda c, _: (step(pool_q, pool_qd, pool_sts, c), None),
                carry,
                None,
                length=K,
            )
            return out

        return jax.jit(multi)

    def get_step(self, P: int):
        """The fused device step executable for pool size P (cached)."""
        step = self._step_cache.get(P)
        if step is None:
            step = self._step_cache[P] = self._make_step(P)
        return step

    def _make_carry(self, pool_q, pool_qd, pool_sts, P: int) -> _StreamCarry:
        """Initial carry for a pool of P scenarios (pure jnp: also used
        under jax.eval_shape to derive the export signature).  pool_sts:
        variant-stacked pool states, leading axis V."""
        B = self.batch
        first = jnp.minimum(jnp.arange(B), P - 1)
        lane_q = pool_q[first]
        lane_qd = pool_qd[first]
        active0 = jnp.arange(B) < P
        v0 = jnp.zeros(B, jnp.int32)
        return _StreamCarry(
            lane_q=lane_q,
            lane_qd=lane_qd,
            lane_sid=jnp.where(active0, jnp.arange(B), P),
            lane_variant=v0,
            lane_prev_iters=v0,
            state=jax.tree_util.tree_map(lambda b: b[0][first], pool_sts),
            cursor=jnp.asarray(min(B, P), jnp.int32),
            active=active0,
            res=jnp.zeros((4, P + 1), self.solver.dtype),
            res_z=jnp.zeros(
                (P + 1, self.solver.problem.n_vars if self.collect_z else 0),
                self.solver.dtype,
            ),
            n_finished=jnp.asarray(0, jnp.int32),
        )

    # -------------------------------------------------- AOT step artifacts
    def _pool_chunk_shape(self, P: int):
        B = self.batch
        P_pad = ((P + B - 1) // B) * B
        return (P_pad // B, B, 6)

    def artifact_key(self, P: int) -> str:
        """Content hash binding an exported step blob to the exact program
        it serializes: solver identity + config + guess families + stream
        parameters + jax version.  A blob whose key mismatches is refused
        (silent semantic drift — e.g. a changed mu schedule — would
        otherwise load stale physics)."""
        import hashlib

        import jax as _jax

        s = self.solver
        parts = [
            s.kind, str(s.problem.config), str(s.config), s.guess,
            str(getattr(s, "retry_guess", None)), str(s.dtype),
            str(s.structured),
            str({k: np.asarray(v).tolist() for k, v in sorted(s.theta_overrides.items())}),
            f"B{self.batch}", f"seg{self.segment}", f"P{P}",
            f"att{self.attempt_iters}", f"retry{self.retry_failed}",
            f"K{self.steps_per_call}", f"cz{self.collect_z}",
            _jax.__version__,
        ]
        return hashlib.sha256("|".join(parts).encode()).hexdigest()[:16]

    def export_step(self, path: str, P: int) -> None:
        """Serialize the fused step + pool-init executables for pool size P
        via jax.export — the streaming analogue of runtime.artifact
        save_solver (the reference's ``.casadi`` file,
        generate_landingCtrller_IPOPT_warmstart.m:278-366).  Loading skips
        tracing entirely; compilation then hits the persistent cache."""
        import json

        from jax import export as jax_export

        from ..runtime.artifact import register_stream_serialization

        register_stream_serialization()
        B = self.batch
        V = self.n_attempts
        d = self.solver.dtype
        sds = lambda sh, dt=d: jax.ShapeDtypeStruct(sh, dt)
        qc = sds(self._pool_chunk_shape(P))
        st_s = jax.eval_shape(lambda a, b: self._init_pool(a, b, 0), qc, qc)
        pool_sts_s = jax.tree_util.tree_map(
            lambda l: jax.ShapeDtypeStruct((V,) + l.shape, l.dtype), st_s
        )
        pool_s = sds((P, 6))
        carry_s = jax.eval_shape(
            lambda q, qd, st: self._make_carry(q, qd, st, P), pool_s, pool_s, pool_sts_s
        )
        step = self.get_step(P)
        exported_step = jax_export.export(step)(
            pool_s, pool_s, pool_sts_s, carry_s
        )
        blobs = [exported_step.serialize()]
        for variant in range(V):
            ex = jax_export.export(self._init_pool)(qc, qc, variant)
            blobs.append(ex.serialize())
        meta = {"key": self.artifact_key(P), "P": P, "B": B, "V": V}
        with open(path, "wb") as f:
            f.write(b"LCSTRM1\n")
            f.write((json.dumps(meta) + "\n").encode())
            for blob in blobs:
                f.write(len(blob).to_bytes(8, "little"))
                f.write(blob)

    def load_step(self, path: str, P: int) -> bool:
        """Try to rehydrate exported step+init executables for pool size P.
        Returns True on success (the run() hot path then uses them);
        False on any mismatch (key, shapes, platform) — callers fall back
        to tracing."""
        import json

        from jax import export as jax_export

        from ..runtime.artifact import register_stream_serialization

        try:
            with open(path, "rb") as f:
                if f.readline() != b"LCSTRM1\n":
                    return False
                meta = json.loads(f.readline().decode())
                if meta.get("key") != self.artifact_key(P):
                    return False
                V = int(meta.get("V", 2))
                if V != self.n_attempts:
                    return False
                blobs = []
                for _ in range(1 + V):
                    n = int.from_bytes(f.read(8), "little")
                    blobs.append(f.read(n))
            register_stream_serialization()
            self._step_cache[P] = jax.jit(jax_export.deserialize(blobs[0]).call)
            self._init_aot = {
                v: jax.jit(jax_export.deserialize(blobs[1 + v]).call)
                for v in range(V)
            }
            return True
        except Exception:
            return False

    def _pool_states(self, qc, qdc, variant: int):
        aot = getattr(self, "_init_aot", None)
        if aot is not None:
            return aot[variant](qc, qdc)
        return self._init_pool(qc, qdc, variant)

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

        step = self.get_step(P)

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
        # stacked pool-state buffer: one precomputed-IPState slot per
        # attempt variant, leading axis V
        states = [self._pool_states(qc, qdc, v) for v in range(self.n_attempts)]
        pool_sts = jax.tree_util.tree_map(lambda *ls: jnp.stack(ls), *states)

        carry = self._make_carry(pool_q, pool_qd, pool_sts, P)

        t0 = time.time()
        pending_res = None
        while True:
            carry = step(pool_q, pool_qd, pool_sts, carry)  # async dispatch
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
