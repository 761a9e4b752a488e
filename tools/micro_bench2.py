"""Ablation: which parts of one IP iteration dominate wall time on TPU?

Each config runs max_iter=8 and max_iter=16; per-iter = (t16-t8)/8.
Usage: python micro_bench2.py [B]
"""

import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from landing_controller_tpu.api import LandingSolver
    from landing_controller_tpu.solver import IPConfig

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    rng = np.random.default_rng(0)
    q0s = jnp.asarray(np.column_stack([
        np.zeros((B, 2)), np.full(B, 0.6), rng.uniform(-0.2, 0.2, (B, 3))
    ]).astype(np.float32))
    qd0s = jnp.asarray(np.column_stack([
        rng.uniform(-0.3, 0.3, (B, 5)), -rng.uniform(1, 3, B)
    ]).astype(np.float32))

    base = dict(
        mu_min=1e-5, tol=2e-4, sigma_max=1e5, relax_scale=1.0, delta_c=1e-6,
    )
    variants = {
        "baseline(hybrid,ls12,refine3,ladder4)": dict(
            hessian_mode="hybrid", n_linesearch=12, refine_steps=3,
            ladder_scales=(0.0, 1.0, 10.0, 1000.0),
        ),
        "gn_hessian": dict(
            hessian_mode="gn", n_linesearch=12, refine_steps=3,
            ladder_scales=(0.0, 1.0, 10.0, 1000.0),
        ),
        "ls4": dict(
            hessian_mode="hybrid", n_linesearch=4, refine_steps=3,
            ladder_scales=(0.0, 1.0, 10.0, 1000.0),
        ),
        "refine0": dict(
            hessian_mode="hybrid", n_linesearch=12, refine_steps=0,
            ladder_scales=(0.0, 1.0, 10.0, 1000.0),
        ),
        "ladder2": dict(
            hessian_mode="hybrid", n_linesearch=12, refine_steps=3,
            ladder_scales=(0.0, 1.0),
        ),
        "lean(gn,ls4,refine1,ladder2)": dict(
            hessian_mode="gn", n_linesearch=4, refine_steps=1,
            ladder_scales=(0.0, 1.0),
        ),
    }

    def run(cfg_kw, max_iter):
        cfg = IPConfig(max_iter=max_iter, kkt_backend="scan", **base, **cfg_kw)
        solver = LandingSolver("srbm_lcp", dtype=jnp.float32, structured=True, config=cfg)
        out = solver.solve_batch(q0s, qd0s)
        jax.block_until_ready(out.z)
        t0 = time.perf_counter()
        for _ in range(3):
            out = solver.solve_batch(q0s, qd0s)
            jax.block_until_ready(out.z)
        return (time.perf_counter() - t0) / 3

    for name, kw in variants.items():
        t8 = run(kw, 8)
        t16 = run(kw, 16)
        print(f"{name:42s} per-iter={(t16-t8)/8*1e3:7.2f}ms (8it={t8*1e3:.0f}ms)", flush=True)


if __name__ == "__main__":
    main()
