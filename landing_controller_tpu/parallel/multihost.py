"""Multi-host (multi-process) batch construction and result gathering.

On >= 2 processes (BASELINE configs "1 host / >= 2 hosts"), every process
holds only its local shard of the scenario batch; jitting a global-mesh
program over full host-local arrays is wrong (each process would feed a
*different* "global" array).  The correct flow, implemented here:

- `global_scenario_batch`: build a global `jax.Array` from per-process local
  shards (`jax.make_array_from_process_local_data`) laid out over the
  scenario mesh axis;
- `local_shards`: read back the addressable (process-local) rows of a
  sharded result;
- `make_scenario_mesh` (parallel.batch) already spans all processes'
  devices via `jax.devices()`.

Single-process calls degrade to plain `jnp.asarray` / `np.asarray` so the
same driver code runs in both regimes (examples/envelope_sweep.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def global_scenario_batch(local_arr, mesh: Mesh, axis: str = "scenario"):
    """Per-process local rows -> global jax.Array sharded over `axis`.

    local_arr: (B_local, ...) numpy/jax array of this process's scenarios.
    The global batch is (B_local * process_count, ...), ordered by process.
    """
    sharding = NamedSharding(mesh, P(axis))
    if jax.process_count() == 1:
        return jax.device_put(jnp.asarray(local_arr), sharding)
    return jax.make_array_from_process_local_data(sharding, np.asarray(local_arr))


def local_shards(global_arr):
    """Addressable (process-local) rows of a scenario-sharded result, as one
    numpy array in local device order."""
    shards = sorted(
        global_arr.addressable_shards, key=lambda s: s.index[0].start or 0
    )
    return np.concatenate([np.asarray(s.data) for s in shards], axis=0)


def replicated_value(global_arr):
    """A fully-replicated (P()) output as a host value."""
    return np.asarray(global_arr.addressable_data(0))
