"""Profiling harness (not part of the package): where does solve time go?

Usage: python profile_bench.py [B] [backend] [n_ladder] [max_iter] [refine]
Prints wall time, convergence stats, and failure telemetry.
"""

import sys
import time

import numpy as np


def make_ics(B, seed=0):
    rng = np.random.default_rng(seed)
    q0s = np.zeros((B, 6), np.float32)
    q0s[:, 2] = 0.6
    q0s[:, 3] = rng.uniform(-0.25, 0.25, B)
    q0s[:, 4] = rng.uniform(-np.pi / 3, np.pi / 3, B)
    q0s[:, 5] = rng.uniform(-0.25, 0.25, B)
    qd0s = np.zeros((B, 6), np.float32)
    qd0s[:, :3] = rng.uniform(-0.5, 0.5, (B, 3))
    qd0s[:, 3:5] = rng.uniform(-1, 1, (B, 2))
    qd0s[:, 5] = -rng.uniform(0.5, 5.0, B)
    return q0s, qd0s


def main():
    import jax
    import jax.numpy as jnp

    from landing_controller_tpu.api import LandingSolver
    from landing_controller_tpu.solver import IPConfig

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    backend = sys.argv[2] if len(sys.argv) > 2 else "scan"
    n_ladder = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    max_iter = int(sys.argv[4]) if len(sys.argv) > 4 else 200
    refine = int(sys.argv[5]) if len(sys.argv) > 5 else 3

    ladder = ((0.0, 1.0, 10.0, 1000.0))[:n_ladder]
    cfg = IPConfig(
        max_iter=max_iter,
        hessian_mode="hybrid",
        mu_min=1e-5,
        tol=2e-4,
        sigma_max=1e5,
        refine_steps=refine,
        relax_scale=1.0,
        delta_c=1e-6,
        kkt_backend=backend,
        ladder_scales=ladder,
    )
    solver = LandingSolver("srbm_lcp", dtype=jnp.float32, structured=True, config=cfg)

    q0s, qd0s = make_ics(B)
    q0s, qd0s = jnp.asarray(q0s), jnp.asarray(qd0s)
    t0 = time.time()
    sols = solver.solve_batch(q0s, qd0s)
    jax.block_until_ready(sols.z)
    tc = time.time() - t0
    t0 = time.time()
    sols = solver.solve_batch(q0s, qd0s)
    jax.block_until_ready(sols.z)
    dt = time.time() - t0
    its = np.array(sols.iterations)
    conv = np.array(sols.converged)
    kkt = np.array(sols.kkt_error)
    viol = np.array(sols.constr_viol)
    print(
        f"B={B} backend={backend} ladder={n_ladder} refine={refine} "
        f"wall={dt:.2f}s compile={tc:.1f}s conv={conv.mean():.3f} "
        f"it mean/med/max={its.mean():.0f}/{np.median(its):.0f}/{its.max()} "
        f"solves/s={conv.sum()/dt:.2f}"
    )
    bad = ~conv
    if bad.any():
        print(
            f"failures: {bad.sum()}  kkt p50/p90={np.median(kkt[bad]):.2e}/"
            f"{np.quantile(kkt[bad], 0.9):.2e}  "
            f"viol p50/p90={np.median(viol[bad]):.2e}/{np.quantile(viol[bad], 0.9):.2e}"
        )
        # how close are failures? count lanes failing only the KKT tol
        n_kkt_only = (viol[bad] <= 1e-3).sum()
        print(f"failures with viol<=1e-3 (KKT-only failures): {n_kkt_only}/{bad.sum()}")


if __name__ == "__main__":
    main()
