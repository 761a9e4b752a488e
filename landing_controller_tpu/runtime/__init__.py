"""Host-side runtime: native (C++) scenario pool + result log, durable
compiled-solver artifacts (persistent XLA cache + jax.export blobs)."""

from .artifact import enable_persistent_cache, load_solver, save_solver
from .native import (
    NativeScenarioPool,
    ResultLog,
    native_available,
    read_result_log,
    sample_scenarios_native,
)

__all__ = [
    "NativeScenarioPool",
    "ResultLog",
    "native_available",
    "read_result_log",
    "sample_scenarios_native",
    "enable_persistent_cache",
    "load_solver",
    "save_solver",
]
