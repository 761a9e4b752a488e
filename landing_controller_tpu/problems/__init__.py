"""NLP transcriptions of the landing trajectory-optimization families.

Each problem is a pure-function triple (cost, eq, ineq) over a flat decision
vector z and a runtime parameter pytree theta — the TPU-native analogue of
the reference's CasADi ``Opti`` + ``opti.parameter`` stacks (everything that
was an ``opti.parameter`` is a theta leaf; shapes and schedule structure are
compile-time static).
"""

from .eeparam import (
    EEParamConfig,
    EEParamParams,
    EEParamProblem,
    default_eeparam_params,
    eeparam_problem,
)
from .landing import (
    LandingConfig,
    LandingParams,
    LandingProblem,
    LandingVars,
    ccc_problem,
    contact_scheduled_problem,
    kinodynamic_problem,
    kinodynamic_voltage_problem,
    sliding_problem,
    srbm_lcp_problem,
)

__all__ = [
    "LandingConfig",
    "LandingParams",
    "LandingProblem",
    "LandingVars",
    "kinodynamic_problem",
    "kinodynamic_voltage_problem",
    "srbm_lcp_problem",
    "ccc_problem",
    "contact_scheduled_problem",
    "sliding_problem",
    "EEParamConfig",
    "EEParamParams",
    "EEParamProblem",
    "eeparam_problem",
    "default_eeparam_params",
]
