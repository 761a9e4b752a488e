"""Visualization: trajectory summary panels and envelope maps."""

from .plots import motor_voltages, plot_results, plot_envelope

__all__ = ["plot_results", "plot_envelope", "motor_voltages"]
