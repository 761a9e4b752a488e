"""eeParam (free contact timing) TPU throughput bench — VERDICT r3 weak #6.

Measures batched f32 EEParamSolver throughput + convergence on a drop
scenario sweep (the reference's config-2 capability,
quadruped_SRBM_eeParam.m:324-409, solved there one-at-a-time by IPOPT) and
writes the result to landing_controller_tpu/data/eeparam_bench.json —
committed evidence for the chip record.

Usage: python tools/eeparam_bench.py [B] [n_trials]
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import dataclasses as dc
import json
import os
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from landing_controller_tpu.api import EEParamSolver
    from landing_controller_tpu.runtime import enable_persistent_cache

    enable_persistent_cache()
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    n_trials = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    # config sweep knobs (env overrides on the EEParamSolver default)
    ip_config = None
    over = {}
    if os.environ.get("EE_LADDER"):
        over["ladder_scales"] = tuple(
            float(x) for x in os.environ["EE_LADDER"].split(",")
        )
    for env, field, cast in (
        ("EE_REFINE", "refine_steps", int),
        ("EE_CORR", "corrector", int),
        ("EE_MU_INIT", "mu_init", float),
        ("EE_KAPPA_MU", "kappa_mu", float),
        ("EE_LS", "n_linesearch", int),
        ("EE_MAXIT", "max_iter", int),
        ("EE_MU", "mu_strategy", str),
        ("EE_PREC", "matmul_precision", str),
    ):
        if os.environ.get(env):
            over[field] = cast(os.environ[env])
    if over:
        import dataclasses as _dc

        from landing_controller_tpu.solver import IPConfig

        base_cfg = IPConfig(
            max_iter=200, hessian_mode="gn", relax_scale=0.0, delta_c=1e-6,
            mu_min=1e-5, tol=2e-4, sigma_max=1e5, refine_steps=5,
        )
        ip_config = _dc.replace(base_cfg, **over)
        print(f"[config] overrides: {over}", flush=True)

    s = EEParamSolver(ip_config=ip_config)
    base = s.build_params()
    rng = np.random.default_rng(0)

    def make_thetas(seed):
        r = np.random.default_rng(seed)
        hs = jnp.asarray(r.uniform(0.45, 0.65, B), jnp.float32)
        vzs = jnp.asarray(-r.uniform(0.5, 1.5, B), jnp.float32)
        pitches = jnp.asarray(r.uniform(-0.2, 0.2, B), jnp.float32)
        return jax.vmap(
            lambda h, vz, p: dc.replace(
                base,
                r_init=jnp.asarray([0.0, 0.0, 1.0], jnp.float32) * h,
                rdot_init=jnp.asarray([0.0, 0.0, 1.0], jnp.float32) * vz,
                theta_init=jnp.asarray([0.0, 1.0, 0.0], jnp.float32) * p,
            )
        )(hs, vzs, pitches)

    # compile on trial 0 (not timed)
    t0 = time.time()
    sol = s.solve_batch(make_thetas(0))
    jax.block_until_ready(sol.z)
    compile_s = time.time() - t0

    rates, times, iters = [], [], []
    for t in range(n_trials):
        th = make_thetas(100 + t)
        t0 = time.time()
        sol = s.solve_batch(th)
        jax.block_until_ready(sol.z)
        dt = time.time() - t0
        conv = np.asarray(sol.converged)
        times.append(dt)
        rates.append(float(conv.mean()))
        iters.append(float(np.asarray(sol.iterations).mean()))
        print(
            f"trial {t}: {dt:.2f}s conv={conv.mean():.3f} "
            f"solves/s={conv.sum()/dt:.1f} iters_mean={iters[-1]:.0f}",
            flush=True,
        )

    out = {
        "problem": "eeparam_free_contact_timing",
        "batch": B,
        "n_trials": n_trials,
        "dtype": "float32",
        "kkt": "dense inertia-corrected Schur (api.EEParamSolver default)",
        "compile_s": round(compile_s, 1),
        "wall_s_mean": round(float(np.mean(times)), 2),
        "convergence_rate": round(float(np.mean(rates)), 4),
        "converged_solves_per_sec": round(
            float(np.mean(rates)) * B / float(np.mean(times)), 2
        ),
        "iters_mean": round(float(np.mean(iters)), 1),
        "reference": "quadruped_SRBM_eeParam.m:324-409 (IPOPT, one scenario at a time)",
    }
    print(json.dumps(out), flush=True)
    if os.environ.get("EE_WRITE", "1") != "1":
        return
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "landing_controller_tpu", "data", "eeparam_bench.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
