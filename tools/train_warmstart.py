"""End-to-end NN warm-start training + benchmark driver.

1. generate >= N_SAMPLES converged kinodynamic solutions via the batched
   SRBM->IK->kino cascade (data/factory.py; the reference's
   generate_training_data_automated.m flow with the convergence mask
   replacing the human gate);
2. fit normalization stats + train the 9->256^3->976 MLP (warmstart/nn.py;
   the reference trains externally in PyTorch and ships
   nn_TO_landing.onnx + data_stats.mat);
3. save weights+stats to landing_controller_tpu/data/nn_TO_landing.npz
   (the committed artifact);
4. run the 4-regime timing comparison (nn_warmstart.m:32-235) on fresh
   scenarios and print the table + write JSON.

Usage: python tools/train_warmstart.py [n_samples] [batch]
Intended to run on TPU (cold compile ~minutes; persistent cache wired).
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
    from landing_controller_tpu.analysis.warmstart_bench import warmstart_comparison
    from landing_controller_tpu.data.factory import generate_training_data
    from landing_controller_tpu.solver import IPConfig
    from landing_controller_tpu.warmstart import nn as wsnn
    from landing_controller_tpu.warmstart.cascade import make_cascade
    from landing_controller_tpu.warmstart.reference import sample_drop_scenario

    n_samples = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 128

    def mk_cfg(max_iter):
        # monotone mu rule: the loqo rule that wins on srbm_lcp LOSES badly
        # on the kinodynamic family (measured 0.19 vs 0.81 convergence at
        # B=32 — loqo lanes end feasible but never polish stationarity)
        return IPConfig(
            max_iter=max_iter, hessian_mode="hybrid", mu_min=1e-5, tol=2e-4,
            sigma_max=1e5, refine_steps=3, relax_scale=1.0, delta_c=1e-6,
            kkt_backend="cri",
        )

    srbm = LandingSolver("srbm_lcp", dtype=jnp.float32, structured=True, config=mk_cfg(200))
    # bootstrapping iteration (round 5): the factory's failed COLD lanes
    # retry from the CURRENT committed NN guess, so hard-drop scenarios
    # that only the learned seed can land enter the next dataset — the
    # retrained network then covers the corner its predecessor rescued.
    # (A converged solution is a valid training sample regardless of what
    # seeded the solve; the reference's own factory is seeded too —
    # generate_training_data_automated.m:121-176.)
    retry = "nn" if os.environ.get("FACTORY_NN_RETRY", "1") == "1" else None
    kino = LandingSolver(
        "kinodynamic", dtype=jnp.float32, structured=True, config=mk_cfg(200),
        retry_guess=retry,
    )

    # streaming factory (device-resident refill): cold kinodynamic solves
    # converge at ~0.8 on the factory distribution and stream at the
    # average iteration count — the batched max-lane cascade could not
    # produce 5k+ samples inside a TPU session budget
    from landing_controller_tpu.data.factory import generate_training_data_streaming

    t0 = time.time()
    npz = os.environ.get("DATA_NPZ", "")
    if npz and os.path.exists(npz):
        # resume path: the streaming factory checkpoints its harvested
        # dataset to /tmp before training, so a tunnel wedge in the
        # train/benchmark phases doesn't force a ~25-minute re-solve
        d = np.load(npz)
        data = {k: d[k] for k in d.files}
        print(f"[data] resumed {data['inputs'].shape[0]} samples from {npz}", flush=True)
    else:
        data = generate_training_data_streaming(
            kino, n_samples, batch=batch,
            max_wall_s=float(os.environ.get("DATA_WALL_S", "1200")),
        )
        np.savez_compressed("/tmp/training_data_landing.npz", **data)
    m = data["inputs"].shape[0]
    print(f"[data] {m}/{n_samples} converged samples in {time.time()-t0:.0f}s", flush=True)

    # ---- artifact sanity gate (round-3 postmortem: a wall-clock-truncated
    # run harvested 39 samples and silently REPLACED the committed
    # 499-sample net + its benchmark JSON with garbage).  A run that could
    # not produce a floor's worth of samples must never overwrite the
    # committed artifacts; train/benchmark to /tmp for inspection instead.
    floor = int(os.environ.get("SAMPLE_FLOOR", "500"))
    commit_ok = m >= floor
    if not commit_ok:
        print(
            f"[gate] only {m} samples (< SAMPLE_FLOOR={floor}): writing "
            "artifacts to /tmp, NOT overwriting committed files", flush=True,
        )

    # ---- normalize + train
    stats = wsnn.compute_stats(
        jnp.asarray(data["inputs"]), jnp.asarray(data["X"]),
        jnp.asarray(data["U"]), jnp.asarray(data["jpos"]),
        float(kino.build_params(jnp.zeros(6), jnp.zeros(6)).mass),
    )
    xin_n, targets = jax.vmap(lambda x, X, U, J: wsnn.normalize_sample(stats, x, X, U, J))(
        jnp.asarray(data["inputs"]), jnp.asarray(data["X"]),
        jnp.asarray(data["U"]), jnp.asarray(data["jpos"]),
    )
    t0 = time.time()
    params, losses = wsnn.train_mlp(xin_n, targets, epochs=400)
    print(f"[train] {len(losses)} epochs in {time.time()-t0:.0f}s; "
          f"loss {losses[0]:.4f} -> {losses[-1]:.5f}", flush=True)

    out = (
        os.path.join(REPO, "landing_controller_tpu", "data", "nn_TO_landing.npz")
        if commit_ok
        else "/tmp/nn_TO_landing.npz"
    )
    wsnn.save_warmstart(out, params, stats)
    print(f"[save] {out} ({os.path.getsize(out)//1024} KB)", flush=True)

    # ---- 4-regime comparison on fresh scenarios
    n_trials, B = 5, 64
    keys = jax.random.split(jax.random.PRNGKey(999), n_trials * B)
    q0s, qd0s = jax.vmap(sample_drop_scenario)(keys)
    q0s = q0s.reshape(n_trials, B, 6)
    qd0s = qd0s.reshape(n_trials, B, 6)
    res = warmstart_comparison(kino, srbm, params, stats, q0s, qd0s, n_trials=n_trials)
    table = {
        k: {"mean_s": float(np.mean(v)), "min_s": float(np.min(v))}
        for k, v in res["t"].items()
    }
    for k, v in res["convergence"].items():
        table[k]["convergence"] = float(np.mean(v))
    print(json.dumps({"batch": B, "regimes": table}, indent=1), flush=True)
    # second gate: the benchmark JSON is published evidence — a cold-start
    # convergence row wildly below the streaming bench's measured rate means
    # THIS run was broken (truncated, wedged tunnel, bad config), not the
    # solver; refuse to publish it.
    cold_conv = table.get("cold", {}).get("convergence", 0.0)
    cold_floor = float(os.environ.get("COLD_CONV_FLOOR", "0.5"))
    publish = commit_ok and cold_conv >= cold_floor
    bench_path = (
        os.path.join(REPO, "landing_controller_tpu", "data", "warmstart_bench.json")
        if publish
        else "/tmp/warmstart_bench.json"
    )
    if not publish:
        print(
            f"[gate] cold convergence {cold_conv:.3f} < {cold_floor} or sample "
            f"floor unmet: benchmark JSON -> /tmp only", flush=True,
        )
    with open(bench_path, "w") as f:
        json.dump({"batch": B, "n_trials": n_trials, "regimes": table,
                   "n_training_samples": m, "final_loss": losses[-1]}, f, indent=1)


if __name__ == "__main__":
    main()
