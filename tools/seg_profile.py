"""Op-level breakdown of one streaming segment + streaming overhead audit.

Answers two questions the bench wall-clock can't separate:
1. inside the segment executable, where do the 50 IP iterations spend time
   (assembly / factor / solve / line search)?  -> jax.profiler trace
2. how much does the streaming driver add per segment on the host
   (_init on refill, where-merges, summary transfer)?  -> direct timing

Usage: python tools/seg_profile.py [B] [trace]
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
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
    from landing_controller_tpu.parallel import StreamingSolver
    from landing_controller_tpu.runtime import enable_persistent_cache
    from landing_controller_tpu.solver import IPConfig

    enable_persistent_cache()
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    do_trace = len(sys.argv) > 2 and sys.argv[2] == "trace"

    cfg = IPConfig(
        max_iter=200, hessian_mode="hybrid", mu_min=1e-5, tol=2e-4,
        sigma_max=1e5, refine_steps=1, relax_scale=1.0, delta_c=1e-6,
        kkt_backend="cri", ladder_scales=(0.0, 1.0), n_linesearch=4,
    )
    solver = LandingSolver(
        "srbm_lcp", dtype=jnp.float32, structured=True, config=cfg,
        guess="ballistic",
    )
    ss = StreamingSolver(solver, batch=B, segment=50, sampler=make_ics)
    q, qd = make_ics(B)
    q, qd = jnp.asarray(q), jnp.asarray(qd)

    t0 = time.time()
    st = ss._init(q, qd)
    jax.block_until_ready(st.z)
    print(f"_init compile+run: {time.time()-t0:.2f}s")
    t0 = time.time()
    st2 = ss._init(q, qd)
    jax.block_until_ready(st2.z)
    t_init = time.time() - t0
    print(f"_init run: {t_init*1e3:.1f} ms")

    t0 = time.time()
    summary, st = ss._seg(q, qd, st)
    jax.block_until_ready(st.z)
    print(f"_seg compile+run: {time.time()-t0:.2f}s")
    times = []
    for _ in range(3):
        t0 = time.time()
        summary, st = ss._seg(q, qd, st)
        jax.block_until_ready(st.z)
        times.append(time.time() - t0)
    t_seg = float(np.mean(times))
    print(f"_seg run: {t_seg*1e3:.1f} ms ({t_seg/50*1e3:.2f} ms/iter)")

    # host-side summary conversion cost (what StreamingSolver.run does)
    t0 = time.time()
    done = np.asarray(summary["done"]); conv = np.asarray(summary["converged"])
    its = np.asarray(summary["iterations"]); viol = np.asarray(summary["constr_viol"])
    t_sum = time.time() - t0
    print(f"summary->host: {t_sum*1e3:.1f} ms")

    # merge cost (refill path): tree_map where over the full state
    rmask = jnp.asarray(np.arange(B) % 7 == 0)
    fresh = ss._init(q, qd)
    t0 = time.time()
    merged = jax.tree_util.tree_map(
        lambda f, s: jnp.where(rmask.reshape((B,) + (1,) * (f.ndim - 1)), f, s),
        fresh, st,
    )
    jax.block_until_ready(merged.z)
    t_merge0 = time.time() - t0
    t0 = time.time()
    merged = jax.tree_util.tree_map(
        lambda f, s: jnp.where(rmask.reshape((B,) + (1,) * (f.ndim - 1)), f, s),
        fresh, st,
    )
    jax.block_until_ready(merged.z)
    t_merge = time.time() - t0
    print(f"state merge: compile+run {t_merge0*1e3:.1f} ms, run {t_merge*1e3:.1f} ms")
    print(
        f"per-segment overhead estimate (init+merge+host): "
        f"{(t_init+t_merge+t_sum)*1e3:.1f} ms vs segment {t_seg*1e3:.1f} ms"
    )

    if do_trace:
        with jax.profiler.trace("/tmp/seg_trace"):
            summary, st = ss._seg(q, qd, st)
            jax.block_until_ready(st.z)
        print("trace written to /tmp/seg_trace")


if __name__ == "__main__":
    main()
