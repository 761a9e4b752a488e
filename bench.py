"""Benchmark: batched landing trajectory-optimization throughput on TPU.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline", ...extras}.

Metric: converged SRBM-LCP landing solves/s on one chip (cold start, full
interior-point solve to the reference tolerance contract).  Baseline for
vs_baseline: the BASELINE.json north star of >= 1000 solves/s on a v5e-8,
i.e. 125 solves/s/chip.  Extras published alongside (so the headline can't
hide robustness): convergence rate and iteration percentiles.

The KKT backend is the Pallas inverse-based cyclic reduction ("cri",
ops/pallas_blocks.py + ops/cr_inverse.py) — the TPU replacement for the
reference's IPOPT/KNITRO native sparse KKT factorization
(quadruped_SRBM_NLP.m:253-292).
"""

import json
import os
import time

import numpy as np

BASELINE_PER_CHIP = 125.0  # north star 1000 solves/s on 8 chips


def main():
    import jax

    # Persistent XLA compile cache: the IP solve graph is large (minutes to
    # compile cold on TPU); warm runs load the cached executable instead.
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        pass

    import jax.numpy as jnp

    from landing_controller_tpu.api import LandingSolver
    from landing_controller_tpu.solver import IPConfig

    cfg = IPConfig(
        max_iter=int(os.environ.get("BENCH_MAX_ITER", "200")),
        hessian_mode="hybrid",
        mu_min=1e-5,
        tol=2e-4,
        sigma_max=1e5,
        refine_steps=int(os.environ.get("BENCH_REFINE", "3")),
        relax_scale=1.0,
        delta_c=1e-6,
        kkt_backend=os.environ.get("BENCH_BACKEND", "cri"),
    )
    solver = LandingSolver("srbm_lcp", dtype=jnp.float32, structured=True, config=cfg)

    B = int(os.environ.get("BENCH_B", "256"))
    rng = np.random.default_rng(0)
    q0s = np.zeros((B, 6), np.float32)
    q0s[:, 2] = 0.6
    q0s[:, 3] = rng.uniform(-0.25, 0.25, B)
    q0s[:, 4] = rng.uniform(-np.pi / 3, np.pi / 3, B)
    q0s[:, 5] = rng.uniform(-0.25, 0.25, B)
    qd0s = np.zeros((B, 6), np.float32)
    qd0s[:, :3] = rng.uniform(-0.5, 0.5, (B, 3))
    qd0s[:, 3:5] = rng.uniform(-1, 1, (B, 2))
    qd0s[:, 5] = -rng.uniform(0.5, 5.0, B)

    q0s = jnp.asarray(q0s)
    qd0s = jnp.asarray(qd0s)

    # compile
    sols = solver.solve_batch(q0s, qd0s)
    jax.block_until_ready(sols.z)
    # timed
    t0 = time.time()
    sols = solver.solve_batch(q0s, qd0s)
    jax.block_until_ready(sols.z)
    dt = time.time() - t0

    conv = np.array(sols.converged)
    its = np.array(sols.iterations)
    n_conv = int(conv.sum())
    value = n_conv / dt
    print(
        json.dumps(
            {
                "metric": "converged_landing_solves_per_sec_per_chip",
                "value": round(value, 2),
                "unit": "solves/s",
                "vs_baseline": round(value / BASELINE_PER_CHIP, 4),
                "batch": B,
                "wall_s": round(dt, 2),
                "convergence_rate": round(float(conv.mean()), 4),
                "iters_p50": int(np.percentile(its, 50)),
                "iters_p90": int(np.percentile(its, 90)),
                "iters_p50_converged": int(np.percentile(its[conv], 50)) if n_conv else -1,
            }
        )
    )


if __name__ == "__main__":
    main()
