"""Golden parity: the reference's committed production solution satisfies
this framework's transcription at float precision.

`main_scripts/prevSoln.mat` is a real KNITRO solution of the kinodynamic
landing NLP saved by landing_optimization.m:395.  If our (cost, eq, ineq)
stacks reproduce the reference formulation exactly — rotation conventions,
dynamics, every constraint — that solution must be feasible here too.
"""

import os

import dataclasses
import jax.numpy as jnp
import numpy as np
import pytest

GOLDEN = "/root/reference/optimizations/landing/main_scripts/prevSoln.mat"


@pytest.mark.skipif(not os.path.exists(GOLDEN), reason="reference checkout not available")
def test_reference_solution_feasible_in_our_transcription():
    import scipy.io as sio

    from landing_controller_tpu.models import get_robot_params
    from landing_controller_tpu.problems import kinodynamic_problem
    from landing_controller_tpu.problems.landing import LandingVars
    from landing_controller_tpu.warmstart import kinodynamic_params

    d = sio.loadmat(GOLDEN)
    X = d["X_star"].T  # (21, 12)
    U = d["U_star"].T  # (20, 24)
    JP = d["jpos_star"].T  # (20, 12)

    params = get_robot_params("mc3D")
    prob = kinodynamic_problem(params, n_knots=21)
    q0 = jnp.asarray(X[0, :6])
    qd0 = jnp.asarray(X[0, 6:])
    theta = dataclasses.replace(
        kinodynamic_params(q0, qd0), c_init=jnp.asarray(U[0, :12])
    )
    z = prob.pack(LandingVars(X=jnp.asarray(X), jpos=jnp.asarray(JP), U=jnp.asarray(U)))

    E = np.asarray(prob.eq(z, theta))
    g = np.asarray(prob.ineq(z, theta))
    # KNITRO solved with feastol 1e-4 / feastolabs 1e-3; at its solution our
    # residuals must be at float-noise level if the transcription matches.
    assert np.abs(E).max() < 1e-5, np.abs(E).max()
    assert g.min() > -1e-4, g.min()
