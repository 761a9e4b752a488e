"""Re-run the 4-regime warm-start comparison (nn_warmstart.m:32-235)
against the COMMITTED NN artifact and refresh data/warmstart_bench.json.

Unlike tools/train_warmstart.py this does no data generation or training
— it only re-measures the comparison (e.g. after a cascade or barrier
change).  Training provenance keys of the existing JSON are preserved.

Usage (TPU): python tools/warmstart_compare.py [B] [n_trials]
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    import jax
    import jax.numpy as jnp

    from landing_controller_tpu.runtime import enable_persistent_cache

    enable_persistent_cache()

    from landing_controller_tpu.analysis.warmstart_bench import warmstart_comparison
    from landing_controller_tpu.api import LandingSolver
    from landing_controller_tpu.solver import IPConfig
    from landing_controller_tpu.warmstart.nn import load_warmstart
    from landing_controller_tpu.warmstart.reference import sample_drop_scenario

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    n_trials = int(sys.argv[2]) if len(sys.argv) > 2 else 5

    cfg = IPConfig(
        max_iter=200, hessian_mode="hybrid", mu_min=1e-5, tol=2e-4,
        sigma_max=1e5, refine_steps=3, relax_scale=1.0, delta_c=1e-6,
        kkt_backend="cri",
    )
    srbm = LandingSolver("srbm_lcp", dtype=jnp.float32, structured=True, config=cfg)
    kino = LandingSolver("kinodynamic", dtype=jnp.float32, structured=True, config=cfg)
    params, stats = load_warmstart(
        os.path.join(REPO, "landing_controller_tpu", "data", "nn_TO_landing.npz")
    )

    key = jax.random.PRNGKey(123)
    keys = jax.random.split(key, n_trials * B).reshape(n_trials, B, 2)
    q0s, qd0s = jax.vmap(jax.vmap(sample_drop_scenario))(keys)

    t0 = time.time()
    res = warmstart_comparison(kino, srbm, params, stats, q0s, qd0s, n_trials=n_trials)
    path = os.path.join(
        REPO, "landing_controller_tpu", "data", "warmstart_bench.json"
    )
    old = {}
    if os.path.exists(path):
        with open(path) as f:
            old = json.load(f)
    out = {
        "batch": B,
        "n_trials": n_trials,
        "regimes": {
            "nn_eval": {
                "mean_s": float(np.mean(res["t"]["nn_eval"])),
                "min_s": float(np.min(res["t"]["nn_eval"])),
            },
        },
        "cascade": "x_grf seed, cold barrier (warmstart/cascade.py round-5 fix)",
        "n_training_samples": old.get("n_training_samples"),
        "final_loss": old.get("final_loss"),
    }
    for k in ("nn_ws", "cold", "srbm_ws"):
        out["regimes"][k] = {
            "mean_s": float(np.mean(res["t"][k])),
            "min_s": float(np.min(res["t"][k])),
            "convergence": float(np.mean(res["convergence"][k])),
        }
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out["regimes"], indent=1))
    print(f"wrote {path} in {time.time()-t0:.0f}s")


if __name__ == "__main__":
    main()
