"""Batched NLP solver: primal-dual interior point, vmap/jit-compatible."""

from .ip import IPConfig, IPResult, IPState, solve, solve_batch

__all__ = ["IPConfig", "IPResult", "IPState", "solve", "solve_batch"]
