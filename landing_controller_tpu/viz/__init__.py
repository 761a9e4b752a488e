"""Visualization: trajectory summary panels, envelope maps, 3D animation."""

from .plots import motor_voltages, plot_results, plot_envelope
from .animate import animate_landing, draw_frame
from .html_viewer import export_html

__all__ = [
    "export_html",
    "plot_results",
    "plot_envelope",
    "motor_voltages",
    "animate_landing",
    "draw_frame",
]
