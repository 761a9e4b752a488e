"""Tuning sweep for the cri backend on TPU (dev tool).

Usage: python tune_sweep.py
Each line: config -> wall, conv, iters, solves/s.
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import itertools
import time

import numpy as np


def make_ics(B, seed=0, sampler="legacy"):
    import jax
    import jax.numpy as jnp

    if sampler == "reference":
        from landing_controller_tpu.warmstart.reference import sample_drop_scenario

        keys = jax.random.split(jax.random.PRNGKey(seed), B)
        q0s, qd0s = jax.vmap(sample_drop_scenario)(keys)
        return jnp.asarray(q0s, jnp.float32), jnp.asarray(qd0s, jnp.float32)
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
    return jnp.asarray(q0s), jnp.asarray(qd0s)


def run_cfg(name, B, sampler="legacy", **kw):
    import jax
    import jax.numpy as jnp

    from landing_controller_tpu.api import LandingSolver
    from landing_controller_tpu.solver import IPConfig

    base = dict(
        max_iter=200, hessian_mode="hybrid", mu_min=1e-5, tol=2e-4,
        sigma_max=1e5, refine_steps=3, relax_scale=1.0, delta_c=1e-6,
        kkt_backend="cri",
    )
    base.update(kw)
    cfg = IPConfig(**base)
    solver = LandingSolver("srbm_lcp", dtype=jnp.float32, structured=True, config=cfg)
    q0s, qd0s = make_ics(B, sampler=sampler)
    t0 = time.time()
    sols = solver.solve_batch(q0s, qd0s)
    jax.block_until_ready(sols.z)
    tc = time.time() - t0
    t0 = time.time()
    sols = solver.solve_batch(q0s, qd0s)
    jax.block_until_ready(sols.z)
    dt = time.time() - t0
    conv = np.array(sols.converged)
    its = np.array(sols.iterations)
    print(
        f"{name:40s} B={B:4d} wall={dt:6.2f}s comp={tc:5.0f}s conv={conv.mean():.3f} "
        f"it p50/p90={np.percentile(its,50):3.0f}/{np.percentile(its,90):3.0f} "
        f"solves/s={conv.sum()/dt:7.2f}",
        flush=True,
    )


CONFIGS = {
    "ladder2": dict(ladder_scales=(0.0, 1.0)),
    "ladder2_refine1": dict(ladder_scales=(0.0, 1.0), refine_steps=1),
    "b256": dict(_B=256),
    "loqo": dict(mu_strategy="loqo"),
    "refsampler": dict(_sampler="reference"),
    "maxiter120": dict(max_iter=120),
    "base": dict(),
    "stall_lean": dict(ladder_scales=(0.0, 1.0), refine_steps=1, n_linesearch=4),
    "stall_base": dict(),
    "lean_mu2": dict(ladder_scales=(0.0, 1.0), refine_steps=1, n_linesearch=4, mu_init=1e-2),
    "lean_kmu01": dict(ladder_scales=(0.0, 1.0), refine_steps=1, n_linesearch=4, kappa_mu=0.1),
    "lean_b256": dict(_B=256, ladder_scales=(0.0, 1.0), refine_steps=1, n_linesearch=4),
    "lean_ref": dict(_sampler="reference", ladder_scales=(0.0, 1.0), refine_steps=1, n_linesearch=4),
    "lean_mi150": dict(max_iter=150, ladder_scales=(0.0, 1.0), refine_steps=1, n_linesearch=4),
    "b512": dict(_B=512),
    "b128": dict(_B=128),
    "lean": dict(ladder_scales=(0.0, 1.0), refine_steps=1, n_linesearch=4),
}


def main():
    import sys

    names = sys.argv[1:] or list(CONFIGS)
    for name in names:
        kw = dict(CONFIGS[name])
        B = kw.pop("_B", 64)
        sampler = kw.pop("_sampler", "legacy")
        run_cfg(name, B, sampler=sampler, **kw)


if __name__ == "__main__":
    main()
