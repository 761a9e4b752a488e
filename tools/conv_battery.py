"""Convergence battery: what fraction of bench-distribution failures are
real divergence vs. impatience? (dev tool)

Round-2 bench converged 61-69% with max_iter=200 and an aggressive stall
detector tuned for vmapped mode (one slow lane pins the whole batch).  In
the device-resident streaming mode a slow lane only costs its own
iterations, so patience is cheap — this battery measures convergence and
iteration percentiles across (max_iter, stall, mu-rule) settings to find
the conv>=0.9 configuration with the lowest average iteration count.

Usage: python tools/conv_battery.py [quick|full] [B]
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import json
import sys

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


def run_config(name, B, cfg_kwargs, seed=0):
    import jax
    import jax.numpy as jnp

    from landing_controller_tpu.api import LandingSolver
    from landing_controller_tpu.runtime import enable_persistent_cache
    from landing_controller_tpu.solver import IPConfig

    enable_persistent_cache()
    base = dict(
        max_iter=200,
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
        "srbm_lcp", dtype=jnp.float32, structured=True, config=cfg,
        guess="ballistic",
    )
    q, qd = make_ics(B, seed)
    sols = solver.solve_batch(jnp.asarray(q), jnp.asarray(qd))
    jax.block_until_ready(sols.z)
    conv = np.asarray(sols.converged)
    its = np.asarray(sols.iterations)
    kkt = np.asarray(sols.kkt_error)
    viol = np.asarray(sols.constr_viol)
    bad = ~conv
    out = dict(
        name=name,
        B=B,
        conv=round(float(conv.mean()), 4),
        iters_mean=round(float(its.mean()), 1),
        iters_p50=float(np.percentile(its, 50)),
        iters_p90=float(np.percentile(its, 90)),
        conv_iters_mean=round(float(its[conv].mean()), 1) if conv.any() else -1,
        fail_viol_p50=float(np.median(viol[bad])) if bad.any() else 0.0,
        fail_kkt_p50=float(np.median(kkt[bad])) if bad.any() else 0.0,
        fail_kkt_only=int(((viol <= 1e-3) & bad).sum()),
        n_fail=int(bad.sum()),
    )
    print(json.dumps(out), flush=True)
    return out


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "quick"
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    runs = [
        ("baseline-200", {}),
        # patience: does more budget convert failures?
        ("patient-400", {"max_iter": 400}),
        ("patient-400-nostall", {"max_iter": 400, "stall_window": 0}),
        # loqo: fewer iterations; where do its failures come from?
        ("loqo-200", {"mu_strategy": "loqo"}),
        ("loqo-400-nostall", {"mu_strategy": "loqo", "max_iter": 400, "stall_window": 0}),
    ]
    if mode == "full":
        runs += [
            ("kappa01", {"kappa_mu": 0.1}),
            ("mu-init-3e2", {"mu_init": 3e-2}),
            ("alpha-y-primal", {"alpha_for_y": "primal"}),
            ("loqo-patient-stall100", {"mu_strategy": "loqo", "max_iter": 400, "stall_window": 100}),
            ("tol1e-4", {"tol": 1e-4, "max_iter": 400}),
        ]
    results = [run_config(n, B, kw) for n, kw in runs]
    print("== summary ==")
    for r in results:
        print(
            f"{r['name']:>22}: conv={r['conv']:.3f} it_mean={r['iters_mean']}"
            f" p50={r['iters_p50']:.0f} p90={r['iters_p90']:.0f}"
            f" kkt_only_fails={r['fail_kkt_only']}/{r['n_fail']}"
        )


if __name__ == "__main__":
    main()
