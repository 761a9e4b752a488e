"""Per-iteration cost sweep on the real chip (dev tool).

Times ONE streaming segment executable (the bench hot loop) across solver
configs to answer: where does per-iteration time go, and which knobs
(hessian_mode, ladder size, n_linesearch, refine_steps, batch) buy their
cost in convergence?  VERDICT r2 weak-#2 asked for exactly this breakdown.

Usage: python tools/iter_bench.py [quick|full]

Method: compile solver._segment_impl at each config, run a fixed number of
segments from the bench scenario distribution, report ms/iter-per-lane and
convergence/iters after a fixed iteration budget.
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import json
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


def run_config(name, B, cfg_kwargs, n_iters=200, seed=0, guess="ballistic"):
    import jax
    import jax.numpy as jnp

    from landing_controller_tpu.api import LandingSolver
    from landing_controller_tpu.runtime import enable_persistent_cache
    from landing_controller_tpu.solver import IPConfig

    enable_persistent_cache()

    base = dict(
        max_iter=n_iters,
        hessian_mode="hybrid",
        mu_min=1e-5,
        tol=2e-4,
        sigma_max=1e5,
        refine_steps=1,
        relax_scale=1.0,
        delta_c=1e-6,
        kkt_backend="cri",
        ladder_scales=(0.0, 1.0),
        n_linesearch=4,
    )
    base.update(cfg_kwargs)
    cfg = IPConfig(**base)
    solver = LandingSolver(
        "srbm_lcp", dtype=jnp.float32, structured=True, config=cfg, guess=guess
    )
    q, qd = make_ics(B, seed)
    q, qd = jnp.asarray(q), jnp.asarray(qd)
    seg = 50
    seg_fn = jax.jit(
        jax.vmap(lambda a, b, st: solver._segment_impl(a, b, st, seg))
    )
    init_fn = jax.jit(jax.vmap(solver.init_state))
    t0 = time.time()
    state = init_fn(q, qd)
    jax.block_until_ready(state.z)
    t_init = time.time() - t0
    t0 = time.time()
    summary, state = seg_fn(q, qd, state)
    jax.block_until_ready(state.z)
    t_compile = time.time() - t0
    # timed segments: all lanes still live in segment 1 (cold start); later
    # segments have frozen lanes (they still cost the same — masked lanes
    # execute the full body), so per-iter time is honest at any segment
    times = []
    n_segs = (n_iters // seg) - 1
    for i in range(n_segs):
        t0 = time.time()
        summary, state = seg_fn(q, qd, state)
        jax.block_until_ready(state.z)
        times.append(time.time() - t0)
    its = np.asarray(summary["iterations"])
    conv = np.asarray(summary["converged"])
    ms_per_iter = 1e3 * np.mean(times) / seg
    out = dict(
        name=name,
        B=B,
        ms_per_iter_batch=round(ms_per_iter, 2),
        us_per_iter_lane=round(1e3 * ms_per_iter / B, 1),
        compile_s=round(t_compile + t_init, 1),
        conv=round(float(conv.mean()), 3),
        iters_p50=float(np.percentile(its, 50)),
        iters_p90=float(np.percentile(its, 90)),
        # effective converged/s if iters were the only cost (streaming upper
        # bound): conv_rate / (avg_iters * iter_time)
        est_solves_s=round(
            float(conv.sum() / (np.minimum(its, n_iters).mean() * ms_per_iter / 1e3 / B * B)),
            2,
        ),
    )
    print(json.dumps(out), flush=True)
    return out


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "quick"
    results = []
    # baseline = round-2 bench config
    results.append(run_config("r2-bench-baseline", 64, {}))
    results.append(run_config("gn-only", 64, {"hessian_mode": "gn"}))
    results.append(run_config("exact-only", 64, {"hessian_mode": "exact"}))
    results.append(run_config("ladder1", 64, {"ladder_scales": (1.0,)}))
    results.append(run_config("ls2", 64, {"n_linesearch": 2}))
    results.append(run_config("refine0", 64, {"refine_steps": 0}))
    results.append(
        run_config(
            "lean-gn",
            64,
            {
                "hessian_mode": "gn",
                "ladder_scales": (1.0,),
                "n_linesearch": 2,
            },
        )
    )
    if mode == "full":
        results.append(run_config("B128", 128, {}))
        results.append(run_config("B256", 256, {}))
        results.append(
            run_config("lean-gn-B256", 256, {
                "hessian_mode": "gn", "ladder_scales": (1.0,), "n_linesearch": 2,
            })
        )
        results.append(run_config("loqo", 64, {"mu_strategy": "loqo"}))
        results.append(run_config("backend-scan", 64, {"kkt_backend": "scan"}))
    print("== summary ==")
    for r in results:
        print(
            f"{r['name']:>16}: {r['ms_per_iter_batch']:7.2f} ms/iter (B={r['B']})"
            f"  conv={r['conv']:.3f} p50={r['iters_p50']:.0f}"
            f" est={r['est_solves_s']}/s compile={r['compile_s']}s"
        )


if __name__ == "__main__":
    main()
