"""Native (C++) host-side runtime: scenario pool, result log."""

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
]
