"""Dynamics kit: rotations, spatial algebra, Featherstone, legs, SRBM."""

from . import featherstone, legs, quaternion, rotations, spatial, srbm

__all__ = ["rotations", "spatial", "featherstone", "legs", "quaternion", "srbm"]
