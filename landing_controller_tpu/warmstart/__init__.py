"""Warm-start layer: reference trajectories, scenario sampling, cascade,
receding-horizon replanning, NN."""

from . import nn

from .replan import Replanner, ReplanState, warm_config
from .reference import (
    ccc_params,
    contact_scheduled_params,
    default_contact_schedule,
    initial_guess_from_reference,
    kinodynamic_params,
    sample_drop_scenario,
    srbm_lcp_params,
)

__all__ = [
    "kinodynamic_params",
    "srbm_lcp_params",
    "sample_drop_scenario",
    "ccc_params",
    "contact_scheduled_params",
    "default_contact_schedule",
    "initial_guess_from_reference",
    "Replanner",
    "ReplanState",
    "warm_config",
    "nn",
]
