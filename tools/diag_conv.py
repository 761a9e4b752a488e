"""Convergence diagnosis: why do cold-start lanes fail? (dev tool)

Solves a batch, then prints per-lane telemetry for the worst lanes:
kkt/mu/alpha trajectories, where progress stalls.

Usage: python diag_conv.py [B] [backend] [mu_strategy] [sampler]
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import sys
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
    import jax.numpy as jnp

    return jnp.asarray(q0s), jnp.asarray(qd0s)


def main():
    import jax
    import jax.numpy as jnp
    from functools import partial

    from landing_controller_tpu.api import LandingSolver
    from landing_controller_tpu.solver import IPConfig, solve
    from landing_controller_tpu.solver.scaling import scale_problem
    from landing_controller_tpu.warmstart.reference import initial_guess_from_reference

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    backend = sys.argv[2] if len(sys.argv) > 2 else "scan"
    mu_strategy = sys.argv[3] if len(sys.argv) > 3 else "monotone"
    sampler = sys.argv[4] if len(sys.argv) > 4 else "legacy"

    cfg = IPConfig(
        max_iter=200, hessian_mode="hybrid", mu_min=1e-5, tol=2e-4,
        sigma_max=1e5, refine_steps=3, relax_scale=1.0, delta_c=1e-6,
        kkt_backend=backend, mu_strategy=mu_strategy,
    )
    solver = LandingSolver("srbm_lcp", dtype=jnp.float32, structured=True, config=cfg)
    q0s, qd0s = make_ics(B, sampler=sampler)

    # raw IPResult (with histories) via the underlying solve
    prob = solver.problem

    def raw_solve(q0, qd0):
        theta = solver.build_params(q0, qd0)
        z0 = initial_guess_from_reference(prob, theta).astype(jnp.float32)
        snlp = scale_problem(
            partial(prob.cost, theta=theta),
            partial(prob.eq, theta=theta),
            partial(prob.ineq, theta=theta),
            z0,
            z_scale=solver._z_scale.astype(jnp.float32),
        )
        from landing_controller_tpu.solver.structured import make_structured_newton_step

        step = make_structured_newton_step(prob, theta, cfg, snlp)
        return solve(
            snlp.cost, snlp.eq, snlp.ineq, snlp.to_scaled(z0), cfg,
            relax_mask=prob.relax_mask().astype(jnp.float32),
            newton_step_fn=step,
        )

    fn = jax.jit(jax.vmap(raw_solve))
    res = fn(q0s, qd0s)
    jax.block_until_ready(res.z)
    t0 = time.time()
    res = fn(q0s, qd0s)
    jax.block_until_ready(res.z)
    dt = time.time() - t0

    conv = np.array(res.converged)
    its = np.array(res.iterations)
    kkt_h = np.array(res.kkt_history)
    mu_h = np.array(res.mu_history)
    al_h = np.array(res.alpha_history)
    print(
        f"B={B} backend={backend} mu={mu_strategy} sampler={sampler} wall={dt:.2f}s "
        f"conv={conv.mean():.3f} it p50/p90/max={np.percentile(its,50):.0f}/"
        f"{np.percentile(its,90):.0f}/{its.max()} solves/s={conv.sum()/dt:.2f}"
    )
    # converged lanes: where did they converge?
    if conv.any():
        print(f"converged-lane iterations: p50={np.median(its[conv]):.0f} "
              f"p90={np.percentile(its[conv],90):.0f}")
    bad = np.where(~conv)[0]
    for i in bad[:6]:
        k = kkt_h[i]
        a = al_h[i]
        m = mu_h[i]
        print(
            f"lane {i}: kkt[50,100,150,199]="
            + ",".join(f"{k[j]:.1e}" for j in (50, 100, 150, 199))
            + f" mu_end={m[199]:.1e}"
            + f" alpha: frac<1e-3={np.mean(a < 1e-3):.2f} last20_mean={a[-20:].mean():.2e}"
        )


if __name__ == "__main__":
    main()
