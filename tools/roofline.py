"""Roofline / MFU measurement for the bench hot loop (VERDICT r4 weak #7).

Compiles the exact bench segment executable (vmapped 25-iteration
streaming segment of the srbm_lcp structured solve at B=64), pulls XLA's
own cost analysis (logical flops + bytes accessed) from the compiled
executable, times it on the chip, and prints achieved FLOP/s and memory
bandwidth against the v5e ceilings:

  MXU peak (bf16):            197 TFLOP/s
  f32-via-bf16x6 ("highest"): ~33 TFLOP/s effective on matmul flops
  HBM bandwidth:              819 GB/s

The verdict asked for one honest paragraph: what fraction of the chip
does one bench iteration use, and which ceiling binds.

Usage (TPU): python tools/roofline.py [B] [segment]
"""

import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

V5E_BF16_PEAK = 197e12
V5E_HBM_BW = 819e9


def main():
    import jax
    import jax.numpy as jnp

    from landing_controller_tpu.api import LandingSolver
    from landing_controller_tpu.solver import IPConfig
    from landing_controller_tpu.warmstart.reference import DT_PRODUCTION

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    segment = int(sys.argv[2]) if len(sys.argv) > 2 else 25

    cfg = IPConfig(
        max_iter=200, hessian_mode="hybrid", mu_init=0.3, kappa_mu=0.5,
        mu_min=1e-5, tol=1e-4, sigma_max=1e5, refine_steps=1,
        relax_scale=1.0, delta_c=1e-6, kkt_backend="cri",
        ladder_scales=(0.0, 1.0), n_linesearch=4, mu_strategy="loqo",
        stall_window=40, stall_min_iter=40, corrector=1,
        matmul_precision=os.environ.get("BENCH_PREC", "highest"),
    )
    solver = LandingSolver(
        "srbm_lcp", dtype=jnp.float32, structured=True, config=cfg,
        guess="ballistic",
        theta_overrides={"dt": np.asarray(DT_PRODUCTION, np.float32)},
    )

    rng = np.random.default_rng(0)
    q0s = np.zeros((B, 6), np.float32)
    q0s[:, 2] = 0.6
    q0s[:, 3] = rng.uniform(-0.25, 0.25, B)
    q0s[:, 4] = rng.uniform(-np.pi / 3, np.pi / 3, B)
    q0s[:, 5] = rng.uniform(-0.25, 0.25, B)
    qd0s = np.zeros((B, 6), np.float32)
    qd0s[:, :3] = rng.uniform(-0.5, 0.5, (B, 3))
    qd0s[:, 3:5] = rng.uniform(-1, 1, (B, 2))
    qd0s[:, 5] = -rng.uniform(0.5, 5.0, B)
    q0s, qd0s = jnp.asarray(q0s), jnp.asarray(qd0s)

    init = jax.jit(jax.vmap(solver.init_state))
    st0 = init(q0s, qd0s, jnp.zeros(B, jnp.int32))
    jax.block_until_ready(jax.tree_util.tree_leaves(st0)[0])

    seg_fn = jax.jit(
        jax.vmap(lambda q, qd, st: solver._segment_impl(q, qd, st, segment))
    )
    lowered = seg_fn.lower(q0s, qd0s, st0)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    flops = float(ca.get("flops", 0.0))
    bytes_acc = float(ca.get("bytes accessed", 0.0))

    # run fixed-work segments on a fresh state each time (every lane
    # executes the full `segment` iterations only while not done; use the
    # initial state so no lane is done during the timing window)
    out = compiled(q0s, qd0s, st0)
    jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
    n_rep = 10
    t0 = time.time()
    for _ in range(n_rep):
        out = compiled(q0s, qd0s, st0)
    jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
    dt = (time.time() - t0) / n_rep

    ms_per_iter = dt / segment * 1e3
    achieved_flops = flops / dt
    achieved_bw = bytes_acc / dt
    ai = flops / max(bytes_acc, 1.0)
    print(f"B={B} segment={segment} precision={cfg.matmul_precision}")
    print(f"segment wall: {dt*1e3:.1f} ms  ({ms_per_iter:.2f} ms per batch-iteration)")
    print(f"XLA cost analysis: {flops/1e9:.2f} GFLOP, {bytes_acc/1e6:.1f} MB accessed per segment")
    print(f"arithmetic intensity: {ai:.1f} flop/byte")
    print(
        f"achieved: {achieved_flops/1e12:.3f} TFLOP/s "
        f"({100*achieved_flops/V5E_BF16_PEAK:.2f}% of bf16 peak, "
        f"{100*achieved_flops/(V5E_BF16_PEAK/6):.2f}% of f32-bf16x6 peak)"
    )
    print(
        f"achieved HBM: {achieved_bw/1e9:.1f} GB/s "
        f"({100*achieved_bw/V5E_HBM_BW:.2f}% of 819 GB/s)"
    )
    bound = "memory-bandwidth" if achieved_bw / V5E_HBM_BW > achieved_flops / (V5E_BF16_PEAK / 6) else "compute"
    if max(achieved_bw / V5E_HBM_BW, achieved_flops / (V5E_BF16_PEAK / 6)) < 0.2:
        bound = (
            "neither roofline: latency/occupancy-bound (12-24-dim blocks "
            "leave the 128x128 MXU tiles and 8x128 VPU lanes mostly idle)"
        )
    print(f"bound: {bound}")


if __name__ == "__main__":
    main()
