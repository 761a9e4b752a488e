"""100k-scenario landing Monte-Carlo on one TPU chip (BASELINE config 5).

Streams 100,000 random drop scenarios through the production srbm_lcp
bench configuration (ballistic guess + NN-retry chain) on the single
available chip and commits the aggregate record the reference derives
serially, one solve at a time (analysis/foot_positions.m:32-43):

- success-region map: convergence rate binned over (pitch, v_z) — the
  reference's landing-envelope axes (plotting/pitch_xVel.m);
- iteration/violation percentiles;
- terminal-state envelope over converged scenarios.

Writes landing_controller_tpu/data/montecarlo_100k.json (~10 KB summary,
not the raw 100k solutions).

Usage (TPU): python tools/montecarlo_100k.py [n_scenarios] [batch]
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

    from landing_controller_tpu.api import LandingSolver
    from landing_controller_tpu.parallel import StreamingSolver
    from landing_controller_tpu.solver import IPConfig
    from landing_controller_tpu.warmstart.reference import DT_PRODUCTION

    N = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 64

    cfg = IPConfig(
        max_iter=200, hessian_mode="hybrid", mu_init=0.3, kappa_mu=0.5,
        mu_min=1e-5, tol=1e-4, sigma_max=1e5, refine_steps=1,
        relax_scale=1.0, delta_c=1e-6, kkt_backend="cri",
        ladder_scales=(0.0, 1.0), n_linesearch=4, mu_strategy="loqo",
        stall_window=40, stall_min_iter=40, corrector=1,
    )
    solver = LandingSolver(
        "srbm_lcp", dtype=jnp.float32, structured=True, config=cfg,
        guess="ballistic", retry_guess="nn",
        theta_overrides={"dt": np.asarray(DT_PRODUCTION, np.float32)},
    )

    rng_box = [np.random.default_rng(2026)]

    def sampler(n):
        rng = rng_box[0]
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

    ss = StreamingSolver(
        solver, batch=B, segment=25, sampler=sampler,
        retry_failed=True, attempt_iters=(100, 150),
    )
    t0 = time.time()

    # chunked pools: the device-resident pool-state buffer is
    # O(P x IPState) (~44 KB/scenario x 2 variants); a single 100k pool
    # exhausts the 16 GB HBM, so the run streams CHUNK-sized pools and
    # aggregates host-side.  The executable is shared across chunks (same
    # pool size -> same jit cache entry).
    chunk = int(os.environ.get("MC_CHUNK", "12800"))
    deadline = t0 + float(os.environ.get("MC_WALL_S", "3600"))
    ics_l, conv_l, p50s, p90s = [], [], [], []
    n_fin = n_conv = 0
    while n_fin < N and time.time() < deadline - 60:
        P = min(chunk, N - n_fin)
        stats = ss.run(P, max_wall_s=max(60.0, deadline - time.time()))
        n_fin += stats["n_finished"]
        n_conv += stats["n_converged"]
        ics_l.append(stats["ics"])
        conv_l.append(stats["converged_mask"])
        p50s.append(stats["iters_p50"])
        p90s.append(stats["iters_p90"])
        print(
            f"[mc] {n_fin}/{N} finished, conv {n_conv/max(n_fin,1):.4f}, "
            f"{n_fin/(time.time()-t0):.1f} fin/s, t={time.time()-t0:.0f}s",
            flush=True,
        )
    wall = time.time() - t0
    stats = {
        "n_finished": n_fin,
        "n_converged": n_conv,
        "convergence_rate": n_conv / max(n_fin, 1),
        "converged_per_sec": n_conv / wall,
        "iters_p50": float(np.mean(p50s)),
        "iters_p90": float(np.mean(p90s)),
    }

    ics = np.concatenate(ics_l, axis=0)  # (n_finished, 12)
    conv = np.concatenate(conv_l, axis=0)
    pitch = ics[:, 4]
    vz = ics[:, 11]

    # success-region map over (pitch, vz)
    p_edges = np.linspace(-np.pi / 3, np.pi / 3, 13)
    v_edges = np.linspace(-5.0, -0.5, 10)
    H_all, _, _ = np.histogram2d(pitch, vz, bins=[p_edges, v_edges])
    H_conv, _, _ = np.histogram2d(pitch[conv], vz[conv], bins=[p_edges, v_edges])
    with np.errstate(invalid="ignore"):
        rate = np.where(H_all > 0, H_conv / np.maximum(H_all, 1), np.nan)

    out = {
        "metric": "montecarlo_landing_100k",
        "n_requested": N,
        "n_finished": int(stats["n_finished"]),
        "n_converged": int(stats["n_converged"]),
        "convergence_rate": round(float(stats["convergence_rate"]), 4),
        "wall_s": round(float(wall), 1),
        "converged_per_sec_per_chip": round(float(stats["converged_per_sec"]), 2),
        "iters_p50": stats["iters_p50"],
        "iters_p90": stats["iters_p90"],
        "config": "srbm_lcp N=21 production-dt, ballistic guess + nn retry",
        "success_region": {
            "pitch_edges_rad": [round(float(x), 4) for x in p_edges],
            "vz_edges_mps": [round(float(x), 4) for x in v_edges],
            "rate": [[None if np.isnan(v) else round(float(v), 3) for v in row]
                     for row in rate],
            "count": [[int(v) for v in row] for row in H_all],
        },
        "reference": "analysis/foot_positions.m:32-43 serial sweep; "
                     "plotting/pitch_xVel.m envelope axes",
    }
    path = os.path.join(
        REPO, "landing_controller_tpu", "data", "montecarlo_100k.json"
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: v for k, v in out.items() if k != "success_region"}))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
