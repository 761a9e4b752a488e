"""Warm-start layer: reference trajectories, scenario sampling, cascade."""

from .reference import (
    kinodynamic_params,
    sample_drop_scenario,
    srbm_lcp_params,
    initial_guess_from_reference,
)

__all__ = [
    "kinodynamic_params",
    "srbm_lcp_params",
    "sample_drop_scenario",
    "initial_guess_from_reference",
]
