"""Analysis subsystems: tracking value function (VBL/Riccati), envelopes,
warm-start timing comparison harness."""

from .vbl import (
    variational_dynamics,
    riccati_step_backward,
    riccati_step_forward,
    riccati_value_function,
    default_vbl_weights,
)
from .nn_validation import nn_vs_nlp, plot_nn_overlay
from .warmstart_bench import warmstart_comparison, plot_warmstart_comparison

__all__ = [
    "nn_vs_nlp",
    "plot_nn_overlay",
    "variational_dynamics",
    "riccati_step_backward",
    "riccati_step_forward",
    "riccati_value_function",
    "default_vbl_weights",
    "warmstart_comparison",
    "plot_warmstart_comparison",
]
