"""Scenario-parallel execution over device meshes (ICI/DCN scale-out)."""

from .batch import make_scenario_mesh, solve_sharded, envelope_stats

__all__ = ["make_scenario_mesh", "solve_sharded", "envelope_stats"]
