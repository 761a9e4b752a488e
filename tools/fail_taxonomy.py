"""Failure taxonomy: WHICH constraint groups pin the non-converging lanes?

Solves a bench-distribution batch, then for every failed lane reports the
dominant violated group (dynamics defects / LCP / no-slip / friction /
kin-box / state box) and the scenario parameters, to correlate failure
modes with drop conditions.  (VERDICT r3 item: push cold-start convergence
to >= 0.9 by fixing failure modes, not by hiding them.)

Usage: python tools/fail_taxonomy.py [B] [mu_strategy]
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import sys
from collections import Counter

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
    from landing_controller_tpu.runtime import enable_persistent_cache
    from landing_controller_tpu.solver import IPConfig

    enable_persistent_cache()
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    mu = sys.argv[2] if len(sys.argv) > 2 else "loqo"
    cfg = IPConfig(
        max_iter=200, hessian_mode="hybrid", mu_min=1e-5, tol=2e-4,
        sigma_max=1e5, refine_steps=1, relax_scale=1.0, delta_c=1e-6,
        kkt_backend="cri", ladder_scales=(0.0, 1.0), n_linesearch=4,
        mu_strategy=mu,
    )
    solver = LandingSolver(
        "srbm_lcp", dtype=jnp.float32, structured=True, config=cfg,
        guess="ballistic",
    )
    q, qd = make_ics(B)
    q, qd = jnp.asarray(q), jnp.asarray(qd)
    sols = solver.solve_batch(q, qd)
    jax.block_until_ready(sols.z)
    conv = np.asarray(sols.converged)
    its = np.asarray(sols.iterations)
    print(f"B={B} mu={mu} conv={conv.mean():.3f} iters_mean={its.mean():.0f}")
    bad = np.where(~conv)[0]
    if not bad.size:
        return

    prob = solver.problem
    labels = prob.ineq_row_labels()
    group_of = [lab.split(":")[-1].split("[")[0] for lab in labels]
    n = prob.config.n_knots

    def lane_groups(z, q0, qd0):
        theta = solver.build_params(q0, qd0)
        E = np.asarray(prob.eq(z, theta))
        g = np.asarray(prob.ineq(z, theta))
        out = {}
        out["eq_head"] = np.abs(E[:12]).max()
        out["eq_dyn"] = np.abs(E[12 : 12 + 12 * (n - 1)]).max()
        gv = np.maximum(-g, 0.0)
        for lab, v in zip(group_of, gv):
            out[lab] = max(out.get(lab, 0.0), float(v))
        return out

    counts = Counter()
    print("-- failed lanes (dominant violated group) --")
    for i in bad[:40]:
        gr = lane_groups(sols.z[i], q[i], qd[i])
        dom, val = max(gr.items(), key=lambda kv: kv[1])
        counts[dom] += 1
        qi, qdi = np.asarray(q[i]), np.asarray(qd[i])
        print(
            f"lane {i:3d}: {dom:9s} viol={val:.3f} it={its[i]:3d} "
            f"pitch={qi[4]:+.2f} roll={qi[3]:+.2f} vz={qdi[5]:+.2f} "
            f"wx={qdi[3]:+.2f} wy={qdi[4]:+.2f} kkt={float(sols.kkt_error[i]):.1e}"
        )
    print("dominant-group counts:", dict(counts))
    # correlation with drop severity
    sev = np.abs(np.asarray(q)[:, 4]) + 0.2 * np.abs(np.asarray(qd)[:, 5])
    print(
        f"severity |pitch|+0.2|vz|: failed mean={sev[~conv].mean():.2f} "
        f"converged mean={sev[conv].mean():.2f}"
    )


if __name__ == "__main__":
    main()
