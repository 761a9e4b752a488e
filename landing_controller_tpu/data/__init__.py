"""Training-data factory and dataset utilities."""

from .factory import generate_training_data

__all__ = ["generate_training_data"]
