"""Cascade seed ablation: which stage-1 (SRBM) blocks help stage 2?

The SRBM->kinodynamic cascade is the reference's production data-factory
flow (generate_training_data_automated.m:121-176) but has measured BELOW
cold start for three rounds (warmstart_bench.json srbm_ws 0.297 vs cold
0.716).  This sweep isolates the seed by block: stage 2 always solves the
same scenarios from z0 variants that mix stage-1 output with the default
cold-guess blocks:

  full   : X + FK-consistent feet + stage-1 GRFs + IK jpos (current)
  x_only : stage-1 X; feet/GRFs/jpos from the ballistic guess
  x_feet : stage-1 X + feet (+IK jpos); GRFs from the ballistic schedule
  x_grf  : stage-1 X + GRFs; feet/jpos from the ballistic guess
  cold   : reference linspace guess (baseline)
  ballistic : ballistic guess (baseline)

each at warm_mu_init in {1e-2, 1e-1}.  One executable per mu: z0 is a
runtime argument to the jitted batched solve.

Usage (TPU): python tools/cascade_sweep.py [B] [n_batches]
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
    from landing_controller_tpu.problems.landing import LandingVars
    from landing_controller_tpu.solver import IPConfig
    from landing_controller_tpu.warmstart.cascade import kinodynamic_guess_from_srbm
    from landing_controller_tpu.warmstart.reference import (
        ballistic_guess,
        initial_guess_from_reference,
        sample_drop_scenario,
    )

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 2

    cfg = IPConfig(
        max_iter=200, hessian_mode="hybrid", mu_min=1e-5, tol=2e-4,
        sigma_max=1e5, refine_steps=3, relax_scale=1.0, delta_c=1e-6,
        kkt_backend="cri",
    )
    srbm = LandingSolver("srbm_lcp", dtype=jnp.float32, structured=True, config=cfg)
    kino = LandingSolver("kinodynamic", dtype=jnp.float32, structured=True, config=cfg)
    theta0 = kino.build_params(jnp.zeros(6), jnp.zeros(6))
    jl = (theta0.jpos_min, theta0.jpos_max)
    prob = kino.problem
    rp = kino.robot_params

    # stage-1 srbm on the kino production grid (cascade.py dt alignment)
    dt_kino = np.asarray(theta0.dt)
    srbm = LandingSolver(
        "srbm_lcp", dtype=jnp.float32, structured=True, config=cfg,
        theta_overrides={"dt": dt_kino},
    )

    def seed_variant(name, q, qd, X1, U1):
        theta = kino.build_params(q, qd)
        zb = ballistic_guess(prob, theta)
        vb = prob.unpack(zb)
        zfull = kinodynamic_guess_from_srbm(prob, rp, X1, U1, jl)
        vf = prob.unpack(zfull)
        if name == "full":
            return zfull
        if name == "x_only":
            return prob.pack(LandingVars(X=X1, jpos=vb.jpos, U=vb.U))
        if name.startswith("x_blend"):
            # interior-blended seed: pull the near-boundary stage-1
            # trajectory toward the centered cold reference
            a = float(name[len("x_blend"):]) / 100.0
            vref = prob.unpack(initial_guess_from_reference(prob, theta))
            Xb = a * X1 + (1 - a) * vref.X
            return prob.pack(LandingVars(X=Xb, jpos=vb.jpos, U=vb.U))
        if name == "x_feet":
            U = jnp.concatenate([vf.U[:, :12], vb.U[:, 12:]], axis=1)
            return prob.pack(LandingVars(X=X1, jpos=vf.jpos, U=U))
        if name == "x_grf":
            U = jnp.concatenate([vb.U[:, :12], U1[:, 12:]], axis=1)
            return prob.pack(LandingVars(X=X1, jpos=vb.jpos, U=U))
        if name == "cold":
            return initial_guess_from_reference(prob, theta)
        if name == "ballistic":
            return zb
        raise KeyError(name)

    solvers = {
        "1e-2": kino.warm_variant(1e-2),
        "1e-1": kino.warm_variant(1e-1),
    }
    solve_z = {
        k: jax.jit(jax.vmap(lambda q, qd, z0, _s=s: _s._solve_impl(q, qd, z0)))
        for k, s in solvers.items()
    }
    srbm_batch = jax.jit(jax.vmap(srbm._solve_impl))
    names = (
        sys.argv[3].split(",")
        if len(sys.argv) > 3
        else ["full", "x_only", "x_feet", "x_grf", "cold", "ballistic"]
    )
    seed_batch = {
        name: jax.jit(jax.vmap(lambda q, qd, X1, U1, _n=name: seed_variant(_n, q, qd, X1, U1)))
        for name in names
    }

    key = jax.random.PRNGKey(7)
    results = {}
    for bi in range(n_batches):
        key, sub = jax.random.split(key)
        keys = jax.random.split(sub, B)
        q0s, qd0s = jax.vmap(sample_drop_scenario)(keys)
        t0 = time.time()
        s1 = srbm_batch(q0s, qd0s)
        jax.block_until_ready(s1.z)
        s1_conv = np.asarray(s1.converged)
        print(f"[b{bi}] stage1 conv {s1_conv.mean():.3f} t={time.time()-t0:.0f}s", flush=True)
        for name in seed_batch:
            z0b = seed_batch[name](q0s, qd0s, s1.X, s1.U)
            for muk in solve_z:
                if name in ("cold", "ballistic") and muk == "1e-2":
                    continue  # cold baselines run at the cold barrier only
                t0 = time.time()
                sol = solve_z[muk](q0s, qd0s, z0b)
                jax.block_until_ready(sol.z)
                conv = np.asarray(sol.converged)
                row = results.setdefault(f"{name}@mu{muk}", {"conv": [], "it": []})
                row["conv"].append(float(conv.mean()))
                row["it"].append(float(np.asarray(sol.iterations).mean()))
                # conditional on stage-1 success (the cascade only makes
                # sense where stage 1 produced something)
                if s1_conv.any():
                    row.setdefault("conv_s1ok", []).append(
                        float(conv[s1_conv].mean())
                    )
                print(
                    f"[b{bi}] {name}@mu{muk}: conv {conv.mean():.3f} "
                    f"(|s1ok {conv[s1_conv].mean():.3f}) it {np.asarray(sol.iterations).mean():.0f} "
                    f"t={time.time()-t0:.0f}s",
                    flush=True,
                )

    summary = {
        k: {kk: float(np.mean(vv)) for kk, vv in v.items()} for k, v in results.items()
    }
    print(json.dumps(summary, indent=1))


if __name__ == "__main__":
    main()
