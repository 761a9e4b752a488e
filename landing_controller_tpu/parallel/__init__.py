"""Scenario-parallel execution over device meshes (ICI/DCN scale-out)."""

from .batch import envelope_stats, make_scenario_mesh, solve_sharded
from .multihost import global_scenario_batch, local_shards, replicated_value
from .stream import StreamingSolver

__all__ = [
    "make_scenario_mesh",
    "solve_sharded",
    "envelope_stats",
    "global_scenario_batch",
    "local_shards",
    "replicated_value",
    "StreamingSolver",
]
