"""Kinodynamic cold-start convergence battery (VERDICT r4 weak #5).

The round-4 srbm_lcp wins (production dt, mu_init 0.3 / kappa_mu 0.5,
one Gondzio corrector, loqo rule) were never measured on the kinodynamic
family — its factory/dryrun config still runs the r3 monotone defaults.
This battery measures single-knob responses on a fixed B-scenario batch
of cold kinodynamic solves (factory distribution, reference guess).

Usage (TPU): python tools/kino_battery.py [B] [config...]
  configs: base warm03 corr loqo warm03corr ballistic
"""

import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CONFIGS = {
    "base": {},
    "warm03": {"mu_init": 0.3, "kappa_mu": 0.5},
    "corr": {"corrector": 1},
    "loqo": {"mu_strategy": "loqo", "stall_window": 40, "stall_min_iter": 40},
    "warm03corr": {"mu_init": 0.3, "kappa_mu": 0.5, "corrector": 1},
    "loqocorr": {
        "mu_strategy": "loqo", "stall_window": 40, "stall_min_iter": 40,
        "corrector": 1, "mu_init": 0.3, "kappa_mu": 0.5,
    },
    "patient": {"max_iter": 350},
    "patient500": {"max_iter": 500},
}


def main():
    import jax
    import jax.numpy as jnp

    from landing_controller_tpu.runtime import enable_persistent_cache

    enable_persistent_cache()

    from landing_controller_tpu.api import LandingSolver
    from landing_controller_tpu.solver import IPConfig
    from landing_controller_tpu.warmstart.reference import sample_drop_scenario

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    names = sys.argv[2:] or list(CONFIGS)

    key = jax.random.PRNGKey(11)
    keys = jax.random.split(key, B)
    q0s, qd0s = jax.vmap(sample_drop_scenario)(keys)

    for name in names:
        guess = "reference"
        if name == "ballistic":
            over, guess = {}, "ballistic"
        else:
            over = CONFIGS[name]
        kw = dict(
            max_iter=200, hessian_mode="hybrid", mu_min=1e-5, tol=2e-4,
            sigma_max=1e5, refine_steps=3, relax_scale=1.0, delta_c=1e-6,
            kkt_backend="cri",
        )
        kw.update(over)
        cfg = IPConfig(**kw)
        s = LandingSolver(
            "kinodynamic", dtype=jnp.float32, structured=True, config=cfg,
            guess=guess,
        )
        t0 = time.time()
        sol = s.solve_batch(q0s, qd0s)
        jax.block_until_ready(sol.z)
        conv = np.asarray(sol.converged)
        its = np.asarray(sol.iterations)
        print(
            f"{name:12s} conv {conv.mean():.3f} it_mean {its.mean():.0f} "
            f"it_p50(conv) {np.percentile(its[conv], 50) if conv.any() else -1:.0f} "
            f"wall {time.time()-t0:.0f}s",
            flush=True,
        )


if __name__ == "__main__":
    main()
