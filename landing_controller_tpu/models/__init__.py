"""Robot parameter registry and rigid-body model construction."""

from .params import RobotParams, get_robot_params
from .model import RobotModel, get_robot_model, srbm_constants

__all__ = [
    "RobotParams",
    "get_robot_params",
    "RobotModel",
    "get_robot_model",
    "srbm_constants",
]
