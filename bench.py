"""Benchmark: batched landing trajectory-optimization throughput on TPU.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline", ...extras}.

Metric: converged cold-start SRBM-LCP landing solves/s on one chip (full
interior-point solve to the reference tolerance contract), measured in
**streaming** mode: the solver runs in 50-iteration segments and finished
lanes are refilled with fresh scenarios (parallel/stream.py), so
throughput reflects the average iteration count instead of the batch max.
Baseline for vs_baseline: the BASELINE.json north star of >= 1000
solves/s on a v5e-8, i.e. 125 solves/s/chip.  Convergence rate and
iteration percentiles are published alongside so the headline can't hide
robustness.

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


def bench_sampler(n, _box=[None]):
    if _box[0] is None:
        _box[0] = np.random.default_rng(0)
    rng = _box[0]
    q0s = np.zeros((n, 6), np.float32)
    q0s[:, 2] = 0.6
    q0s[:, 3] = rng.uniform(-0.25, 0.25, n)
    q0s[:, 4] = rng.uniform(-np.pi / 3, np.pi / 3, n)
    q0s[:, 5] = rng.uniform(-0.25, 0.25, n)
    qd0s = np.zeros((n, 6), np.float32)
    qd0s[:, :3] = rng.uniform(-0.5, 0.5, (n, 3))
    qd0s[:, 3:5] = rng.uniform(-1, 1, (n, 2))
    qd0s[:, 5] = -rng.uniform(0.5, 5.0, n)
    return q0s, qd0s


def main():
    import jax
    import jax.numpy as jnp

    from landing_controller_tpu.runtime import enable_persistent_cache

    enable_persistent_cache()

    from landing_controller_tpu.api import LandingSolver
    from landing_controller_tpu.parallel import StreamingSolver
    from landing_controller_tpu.solver import IPConfig

    cfg = IPConfig(
        max_iter=int(os.environ.get("BENCH_MAX_ITER", "200")),
        hessian_mode="hybrid",
        mu_min=1e-5,
        tol=2e-4,
        sigma_max=1e5,
        refine_steps=int(os.environ.get("BENCH_REFINE", "1")),
        relax_scale=1.0,
        delta_c=1e-6,
        kkt_backend=os.environ.get("BENCH_BACKEND", "cri"),
        ladder_scales=(0.0, 1.0),
        n_linesearch=4,
    )
    # ballistic cold-start guess: integrates the flight phase instead of
    # decelerating from knot 0 (the reference's linspace guess) — measured
    # +38% converged/s at B=64 (p50 iters 118 -> 100) on TPU v5e
    guess = os.environ.get("BENCH_GUESS", "ballistic")
    solver = LandingSolver(
        "srbm_lcp", dtype=jnp.float32, structured=True, config=cfg, guess=guess
    )

    B = int(os.environ.get("BENCH_B", "64"))
    seg = int(os.environ.get("BENCH_SEGMENT", "50"))
    ss = StreamingSolver(solver, batch=B, segment=seg, sampler=bench_sampler)

    # warm-up pass compiles the segment + init executables (the artifact
    # step; persistent cache makes it a load on repeat runs)
    ss.run(B, max_wall_s=600)

    n = int(os.environ.get("BENCH_N", str(6 * B)))
    # hard wall cap: a driver-side bench must terminate even if a lane
    # misbehaves (stats are per-finished-scenario, so a cap stays honest)
    stats = ss.run(n, max_wall_s=float(os.environ.get("BENCH_WALL_S", "900")))

    value = stats["converged_per_sec"]
    print(
        json.dumps(
            {
                "metric": "converged_landing_solves_per_sec_per_chip",
                "value": round(value, 2),
                "unit": "solves/s",
                "vs_baseline": round(value / BASELINE_PER_CHIP, 4),
                "mode": "streaming",
                "batch": B,
                "segment": seg,
                "n_scenarios": stats["n_finished"],
                "wall_s": round(stats["wall_s"], 2),
                "convergence_rate": round(stats["convergence_rate"], 4),
                "iters_p50": int(stats["iters_p50"]),
                "iters_p90": int(stats["iters_p90"]),
                "guess": guess,
            }
        )
    )


if __name__ == "__main__":
    main()
