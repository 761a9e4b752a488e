"""Scenario-sharded batched solving over a device mesh.

The reference's batch sweeps are serial MATLAB loops
(analysis/foot_positions.m:32-43, generate_training_data_automated.m:38);
here the scenario axis is the data-parallel axis of a `jax.sharding.Mesh`:
each device vmaps the solver over its local shard, and envelope/throughput
statistics are reduced with `psum` collectives over ICI — zero host
round-trips inside the batch (SURVEY.md §2.5, §5 distributed requirements).

Per-scenario convergence is a mask, not an exception: failed scenarios
survive in the output with `converged=False`.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_scenario_mesh(n_devices: int | None = None, axis: str = "scenario") -> Mesh:
    """1-D mesh over (up to) all addressable devices; axis = scenario DP."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis,))


# jitted shard_map executables, keyed by (solve_one id, mesh, axis) so that
# repeated chunked calls (parallel.montecarlo) hit the jit cache instead of
# re-tracing a fresh closure every chunk
_SHARDED_CACHE: dict = {}


def _sharded_fn(solve_one, mesh: Mesh, axis: str, collect_stats: bool = True):
    key = (id(solve_one), mesh, axis, collect_stats)
    fn = _SHARDED_CACHE.get(key)
    if fn is None:

        def shard_fn(q, qd):
            sols = jax.vmap(solve_one)(q, qd)
            if not collect_stats:
                # no in-program collectives: XLA:CPU's rendezvous enforces a
                # 40 s barrier across virtual devices, and a heavy per-shard
                # program on an oversubscribed host can miss it (observed on
                # the 2-core CI box).  Callers recompute stats host-side.
                return sols, {}
            n_conv = jax.lax.psum(jnp.sum(sols.converged.astype(jnp.int32)), axis)
            iter_sum = jax.lax.psum(jnp.sum(sols.iterations), axis)
            return sols, {"n_converged": n_conv, "iterations_sum": iter_sum}

        fn = jax.jit(
            shard_map(
                shard_fn,
                mesh=mesh,
                in_specs=(P(axis), P(axis)),
                out_specs=(P(axis), P()),
                check_rep=False,
            )
        )
        # keep a strong ref to solve_one so id() stays unique while cached
        _SHARDED_CACHE[key] = fn
        _SHARDED_CACHE[(key, "owner")] = solve_one
    return fn


def solve_sharded(solve_one, q_inits, qd_inits, mesh: Mesh, axis: str = "scenario",
                  collect_stats: bool = True):
    """Run `solve_one(q_init, qd_init) -> solution pytree` over a sharded batch.

    q_inits/qd_inits: (B, 6) with B divisible by the mesh size.  Returns the
    solution pytree with leading scenario axis, sharded over the mesh, plus a
    dict of collective statistics (already psum-reduced across devices):
    total converged count, mean iterations.
    """
    return _sharded_fn(solve_one, mesh, axis, collect_stats)(q_inits, qd_inits)


def envelope_stats(X_batch, converged, mesh: Mesh | None = None, axis: str = "scenario"):
    """Landing-envelope reductions over the scenario axis.

    Returns success rate and the per-dimension min/max terminal state over
    the *converged* scenarios — the batched analogue of the reference's
    envelope sweeps (analysis/foot_positions.m:56-75).  If `mesh` is given,
    the reduction runs as psum/pmin/pmax collectives over the scenario axis;
    otherwise plain jnp reductions.
    """
    conv = converged.astype(X_batch.dtype)
    xT = X_batch[:, -1, :]
    big = jnp.asarray(jnp.finfo(X_batch.dtype).max / 8, X_batch.dtype)
    masked_min = jnp.where(conv[:, None] > 0, xT, big).min(axis=0)
    masked_max = jnp.where(conv[:, None] > 0, xT, -big).max(axis=0)

    if mesh is None:
        return {
            "success_rate": conv.mean(),
            "term_state_min": masked_min,
            "term_state_max": masked_max,
        }

    def reduce_fn(c, mn, mx):
        total = jax.lax.psum(jnp.sum(c), axis)
        count = jax.lax.psum(jnp.asarray(c.shape[0], c.dtype), axis)
        return {
            "success_rate": total / count,
            "term_state_min": jax.lax.pmin(mn, axis),
            "term_state_max": jax.lax.pmax(mx, axis),
        }

    fn = shard_map(
        reduce_fn,
        mesh=mesh,
        in_specs=(P(axis), P(), P()),
        out_specs=P(),
        check_rep=False,
    )
    return jax.jit(fn)(conv, masked_min, masked_max)
