"""Analysis subsystems: tracking value function (VBL/Riccati), envelopes."""

from .vbl import (
    variational_dynamics,
    riccati_step_backward,
    riccati_step_forward,
    riccati_value_function,
    default_vbl_weights,
)

__all__ = [
    "variational_dynamics",
    "riccati_step_backward",
    "riccati_step_forward",
    "riccati_value_function",
    "default_vbl_weights",
]
