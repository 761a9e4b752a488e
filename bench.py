"""Benchmark: batched landing trajectory-optimization throughput on TPU.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline", ...extras}.

Metric: converged cold-start SRBM-LCP landing solves/s on one chip (full
interior-point solve to the reference tolerance contract), measured in
**streaming** mode: the solver runs in K-iteration segments and finished
lanes are refilled with fresh scenarios (parallel/stream.py), so
throughput reflects the average iteration count instead of the batch max.
Baseline for vs_baseline: the BASELINE.json north star of >= 1000
solves/s on a v5e-8, i.e. 125 solves/s/chip.  Convergence rate and
iteration percentiles are published alongside so the headline can't hide
robustness.

The KKT backend is the Pallas inverse-based cyclic reduction ("cri",
ops/pallas_blocks.py + ops/cr_inverse.py) — the TPU replacement for the
reference's IPOPT/KNITRO native sparse KKT factorization
(quadruped_SRBM_NLP.m:253-292).

Robustness architecture (rounds 2-3 postmortem):
- The axon TPU tunnel nondeterministically WEDGES at an early device op:
  the process sleeps on a relay socket inside a blocking C call, so
  in-process SIGALRM/SIGTERM handlers never run (Python delivers signals
  only between bytecodes).  Both prior rounds' official bench runs died
  this way (r2 rc=124, r3 honest-0.0).
- Therefore this script is a PARENT WATCHDOG that never imports jax: it
  spawns the measurement worker (`bench.py --worker`), reads heartbeat
  ("#hb <phase>") and snapshot (JSON) lines from its stdout, kills the
  worker's process group on a wedge (no tpu_ok within BENCH_TPU_OK_S, or
  no first measurement within BENCH_COMPILE_S after tpu_ok) and retries.
  Observed: a wedged attempt's immediate retry succeeds.
- The parent ALWAYS prints exactly one JSON line to stdout and exits 0:
  the latest worker snapshot, else an honest zero row.  SIGTERM/SIGINT to
  the parent (the driver's timeout) trigger the same emission — the
  parent is never inside a blocking device call, so its handlers run.
- Compile cost is bounded by the committed warm XLA cache (bench_cache/,
  runtime/artifact.py enable_persistent_cache): a cache hit turns the
  multi-minute XLA compile into a multi-second load (measured 1.7s ->
  0.1s on a probe; the worker reports `compile_s` either way), the
  reference's ".casadi artifact" analogue
  (generate_landingCtrller_IPOPT_warmstart.m:278-366).
"""

import json
import os
import signal
import subprocess
import sys
import threading
import time

BASELINE_PER_CHIP = 125.0  # north star 1000 solves/s on 8 chips

ZERO_ROW = {
    "metric": "converged_landing_solves_per_sec_per_chip",
    "value": 0.0,
    "unit": "solves/s",
    "vs_baseline": 0.0,
    "note": "no measurement (all attempts wedged or killed during compile)",
}


# ======================================================================
# parent watchdog (no jax; signals always deliverable)
# ======================================================================

def parent_main():
    budget = float(os.environ.get("BENCH_TOTAL_S", "420"))
    # hard budget: while NO measurement exists, keep retrying past the soft
    # budget up to this wall.  Exceeding the driver's own timeout is safe:
    # GNU timeout signals the whole process group, this parent's SIGTERM
    # handler prints the best row before dying, and the driver reads it
    # from the output tail.  With a measurement in hand, exit at the soft
    # budget with rc=0 (the clean r3-style capture).
    hard_s = float(os.environ.get("BENCH_HARD_S", "1500"))
    tpu_ok_s = float(os.environ.get("BENCH_TPU_OK_S", "90"))
    compile_s = float(os.environ.get("BENCH_COMPILE_S", "270"))
    # mid-phase wedge detector: the wedged process freezes (sleeps on the
    # relay socket), so its CPU clock stops; a healthy compile phase keeps
    # ticking (tracing, staging, small jits) except during the one big
    # remote XLA compile (~45-60 s of CPU silence).  Kill when BOTH the
    # stdout heartbeat AND the CPU clock have been silent this long.
    cpu_stall_s = float(os.environ.get("BENCH_CPU_STALL_S", "150"))
    reserve_s = 15.0  # kept back for the final kill+print
    t0 = time.time()
    t_end = t0 + budget
    t_hard = t0 + max(hard_s, budget)

    state = {"best": None, "printed": False}
    lock = threading.Lock()

    best_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), ".bench_best.json"
    )

    def save_best(row):
        # continuously persisted best row: a SIGKILL to the parent (driver
        # `timeout -s KILL`, OOM) leaves no stdout, but this side file
        # still holds the last measurement
        try:
            with open(best_path + ".tmp", "w") as f:
                f.write(json.dumps(row) + "\n")
            os.replace(best_path + ".tmp", best_path)
        except OSError:
            pass

    def emit():
        with lock:
            if state["printed"]:
                return
            state["printed"] = True
            row = state["best"] if state["best"] is not None else ZERO_ROW
            print(json.dumps(row), flush=True)

    child_pgid = [None]

    def kill_child(sig=signal.SIGKILL):
        pgid = child_pgid[0]
        if pgid is not None:
            try:
                os.killpg(pgid, sig)
            except (ProcessLookupError, PermissionError):
                pass

    def on_signal(signum, frame):
        emit()
        kill_child()
        os._exit(0)

    signal.signal(signal.SIGTERM, on_signal)
    signal.signal(signal.SIGINT, on_signal)

    attempt = 0
    while attempt < 8:
        now = time.time()
        # soft budget governs when a measurement exists; the hard budget
        # governs the nothing-measured case (emission on SIGTERM covers a
        # driver kill during the extension)
        stop_at = t_end if state["best"] is not None else t_hard
        if now > stop_at - reserve_s:
            break
        attempt += 1
        if attempt > 1:
            time.sleep(15.0)  # let the relay clear the killed session
        # the worker sizes its measured run to this deadline: the soft end
        # while it is still reachable, else one more ~4-minute window
        deadline_cap = min(max(t_end, time.time() + 240.0), t_hard)
        env = dict(os.environ)
        env["BENCH_WORKER_DEADLINE"] = str(deadline_cap - reserve_s)
        # hold signals across Popen -> child_pgid assignment: a SIGTERM in
        # that window would run the handler before the new group is
        # recorded, leaving the worker unkilled
        signal.pthread_sigmask(signal.SIG_BLOCK, {signal.SIGTERM, signal.SIGINT})
        try:
            proc = subprocess.Popen(
                [sys.executable, os.path.abspath(__file__), "--worker"],
                stdout=subprocess.PIPE,
                stderr=sys.stderr,
                text=True,
                start_new_session=True,  # own process group -> killable tree
                env=env,
                cwd=os.path.dirname(os.path.abspath(__file__)),
            )
            child_pgid[0] = proc.pid
        finally:
            signal.pthread_sigmask(
                signal.SIG_UNBLOCK, {signal.SIGTERM, signal.SIGINT}
            )
        hb = {"t": time.time(), "tpu_ok": None, "measured": False}

        def reader():
            for line in proc.stdout:
                line = line.strip()
                if not line:
                    continue
                hb["t"] = time.time()
                if line.startswith("#hb"):
                    if "tpu_ok" in line and hb["tpu_ok"] is None:
                        hb["tpu_ok"] = time.time()
                    print(f"[bench a{attempt}] {line}", file=sys.stderr, flush=True)
                elif line.startswith("{"):
                    try:
                        row = json.loads(line)
                    except ValueError:
                        continue
                    if row.get("value", 0) > 0 or state["best"] is None:
                        with lock:
                            if not state["printed"]:
                                state["best"] = row
                        save_best(row)
                    hb["measured"] = True

        rt = threading.Thread(target=reader, daemon=True)
        rt.start()

        def child_cpu():
            try:
                with open(f"/proc/{proc.pid}/stat") as f:
                    parts = f.read().split()
                return (int(parts[13]) + int(parts[14])) / os.sysconf("SC_CLK_TCK")
            except (OSError, IndexError, ValueError):
                return None

        cpu_last = {"v": 0.0, "t": time.time()}
        wedged = False
        while proc.poll() is None:
            time.sleep(1.0)
            now = time.time()
            cpu = child_cpu()
            # per-sample rate test (>=~30% CPU over the 1 s poll): a wedged
            # process still creeps ~0.05 s/min, which a cumulative-delta
            # test mistakes for progress
            if cpu is not None:
                if cpu - cpu_last["v"] > 0.3:
                    cpu_last["t"] = now
                cpu_last["v"] = cpu
            if now > (t_end if state["best"] is not None else t_hard) - reserve_s:
                break
            if hb["tpu_ok"] is None and now - hb["t"] > tpu_ok_s:
                wedged = "no tpu_ok"
                break
            if hb["tpu_ok"] is not None and not hb["measured"]:
                if now - hb["t"] > compile_s:
                    wedged = "no measurement after compile window"
                    break
                if now - hb["t"] > cpu_stall_s and now - cpu_last["t"] > cpu_stall_s:
                    wedged = "cpu+output frozen"
                    break

        if proc.poll() is None:
            # budget exhausted or wedge: ask nicely (a live worker emits its
            # final snapshot on SIGTERM), then kill the whole group
            kill_child(signal.SIGTERM)
            deadline = time.time() + 5.0
            while proc.poll() is None and time.time() < deadline:
                time.sleep(0.2)
            kill_child(signal.SIGKILL)
            try:
                proc.wait(timeout=5.0)
            except subprocess.TimeoutExpired:
                pass
        rt.join(timeout=2.0)
        if wedged:
            print(
                f"[bench a{attempt}] wedge detected ({wedged}); retrying",
                file=sys.stderr,
                flush=True,
            )
            continue
        if state["best"] is None and proc.returncode not in (0, None):
            print(
                f"[bench a{attempt}] worker died rc={proc.returncode}; retrying",
                file=sys.stderr,
                flush=True,
            )
            continue
        break  # worker finished (or budget ran out)

    emit()
    kill_child()
    sys.exit(0)


# ======================================================================
# worker: the actual measurement (may wedge; parent supervises)
# ======================================================================

def bench_sampler(n, _box=[None]):
    import numpy as np

    if _box[0] is None:
        _box[0] = np.random.default_rng(0)
    rng = _box[0]
    q0s = np.zeros((n, 6), np.float32)
    q0s[:, 2] = 0.6
    q0s[:, 3] = rng.uniform(-0.25, 0.25, n)
    q0s[:, 4] = rng.uniform(-np.pi / 3, np.pi / 3, n)
    q0s[:, 5] = rng.uniform(-0.25, 0.25, n)
    qd0s = np.zeros((n, 6), np.float32)
    qd0s[:, :3] = rng.uniform(-0.5, 0.5, (n, 3))
    qd0s[:, 3:5] = rng.uniform(-1, 1, (n, 2))
    qd0s[:, 5] = -rng.uniform(0.5, 5.0, n)
    return q0s, qd0s


def worker_main():
    import numpy as np

    t_start = time.time()
    deadline = float(os.environ.get("BENCH_WORKER_DEADLINE", str(t_start + 390.0)))

    def hb(phase):
        print(f"#hb {phase} t={time.time()-t_start:.1f}", flush=True)

    best = [None]

    def snapshot(stats, extra):
        if stats["n_finished"] == 0:
            return
        value = stats["converged_per_sec"]
        best[0] = {
            "metric": "converged_landing_solves_per_sec_per_chip",
            "value": round(value, 2),
            "unit": "solves/s",
            "vs_baseline": round(value / BASELINE_PER_CHIP, 4),
            "mode": "streaming",
            "n_scenarios": stats["n_finished"],
            "wall_s": round(stats["wall_s"], 2),
            "convergence_rate": round(stats["convergence_rate"], 4),
            "iters_p50": int(stats["iters_p50"]),
            "iters_p90": int(stats["iters_p90"]),
            **extra,
        }
        print(json.dumps(best[0]), flush=True)

    def on_term(signum, frame):
        # parent asked for the final row; re-print the best and die
        if best[0] is not None:
            print(json.dumps(best[0]), flush=True)
        os._exit(0)

    signal.signal(signal.SIGTERM, on_term)

    hb("start")
    import jax.numpy as jnp

    from landing_controller_tpu.runtime import enable_persistent_cache

    enable_persistent_cache()
    import jax

    jax.devices()
    hb("devices")
    jnp.zeros(8).block_until_ready()  # first device op: the classic wedge site
    hb("tpu_ok")

    from landing_controller_tpu.api import LandingSolver
    from landing_controller_tpu.parallel import StreamingSolver
    from landing_controller_tpu.solver import IPConfig

    ladder = tuple(
        float(x) for x in os.environ.get("BENCH_LADDER", "0,1").split(",")
    )
    # round-4 measured defaults (PERF.md §7): warmer barrier start with a
    # gentler rate cap (mu_init 0.3 / kappa_mu 0.5: conv 0.648 -> 0.714 on
    # the bench pool), one Gondzio corrector (+6pp conv, p50 77 -> ~55)
    cfg = IPConfig(
        max_iter=int(os.environ.get("BENCH_MAX_ITER", "200")),
        hessian_mode=os.environ.get("BENCH_HESS", "hybrid"),
        mu_init=float(os.environ.get("BENCH_MU_INIT", "0.3")),
        kappa_mu=float(os.environ.get("BENCH_KAPPA_MU", "0.5")),
        mu_min=1e-5,
        # the reference tolerance contract, NOT the relaxed f32 default:
        # tol 1e-4 / constr_viol_tol 1e-3 (landing_optimization.m:326-329);
        # measured identical convergence to 2e-4 on this problem
        tol=float(os.environ.get("BENCH_TOL", "1e-4")),
        sigma_max=1e5,
        refine_steps=int(os.environ.get("BENCH_REFINE", "1")),
        relax_scale=1.0,
        delta_c=1e-6,
        kkt_backend=os.environ.get("BENCH_BACKEND", "cri"),
        ladder_scales=ladder,
        n_linesearch=int(os.environ.get("BENCH_LS", "4")),
        # adaptive centrality mu rule: measured p50 63 vs 100 iterations
        # against the monotone Fiacco-McCormick schedule at equal-or-better
        # convergence (tools/conv_battery.py)
        mu_strategy=os.environ.get("BENCH_MU", "loqo"),
        # tighter stall schedule than the vmapped-mode default: in streaming
        # mode failure detection latency is pure wasted throughput (a failed
        # first attempt delays its retry), and converged loqo lanes finish
        # at p50 ~60 — restore at ~80/120, declare failure at ~160
        stall_window=int(os.environ.get("BENCH_STALL_WINDOW", "40")),
        stall_min_iter=int(os.environ.get("BENCH_STALL_MIN", "40")),
        matmul_precision=os.environ.get("BENCH_PREC", "highest"),
        corrector=int(os.environ.get("BENCH_CORR", "1")),
    )
    # ballistic cold-start guess: integrates the flight phase instead of
    # decelerating from knot 0 (the reference's linspace guess) — measured
    # +38% converged/s at B=64 (p50 iters 118 -> 100) on TPU v5e
    guess = os.environ.get("BENCH_GUESS", "ballistic")
    # the reference's production non-uniform dt schedule
    # ([0.05, 15x0.02, 0.05, 0.05, 0.1, 0.2], landing_optimization.m:28):
    # measured +1.6pp convergence over the uniform grid, and failed lanes
    # land near-feasible instead of diverged (PERF.md §7) — a runtime theta
    # change, no recompile
    overrides = None
    if os.environ.get("BENCH_DT", "production") == "production":
        from landing_controller_tpu.warmstart.reference import DT_PRODUCTION
        import numpy as np_

        overrides = {"dt": np_.asarray(DT_PRODUCTION, np_.float32)}
    # retry family: failed first attempts re-solve from the NN warm-start
    # guess (warmstart/nn.py, the reference's production seed —
    # nn_warmstart.m:130-218).  Measured on the bench distribution: the NN
    # guess converges 0.828 of scenarios standalone (vs ballistic 0.807)
    # but at p50 77 iterations vs 46 — so it serves as the RESCUE (only
    # failed lanes pay its slower polish), keeping attempt 1 on the fast
    # ballistic guess.
    retry_guess = os.environ.get("BENCH_RETRY_GUESS", "nn") or None
    solver = LandingSolver(
        "srbm_lcp", dtype=jnp.float32, structured=True, config=cfg, guess=guess,
        theta_overrides=overrides, retry_guess=retry_guess,
    )
    hb("solver_built")

    B = int(os.environ.get("BENCH_B", "64"))
    seg = int(os.environ.get("BENCH_SEGMENT", "25"))
    retry = os.environ.get("BENCH_RETRY", "1") == "1"
    att = tuple(
        int(x) for x in os.environ.get("BENCH_ATTEMPT_ITERS", "100,150").split(",")
    )
    ss = StreamingSolver(
        solver, batch=B, segment=seg, sampler=bench_sampler, retry_failed=retry,
        attempt_iters=att,
    )

    extra = {
        "batch": B, "segment": seg, "guess": guess,
        "retry_guess": retry_guess, "tol": cfg.tol,
        "mu_strategy": cfg.mu_strategy, "retry_failed": retry,
    }

    # warm-up: one zero-wall run at the SAME pool size compiles (or, on the
    # committed bench_cache, loads) the fused device-resident step — one
    # executable for init + segment + harvest/refill, jit-cached per pool
    # size — so the measured run's wall clock is pure solve throughput.
    # BENCH_AOT=1 loads a jax.export blob (see stream.export_step) instead
    # of tracing.  Measured on this jax version and REJECTED as the
    # default: the deserialized StableHLO does not hit the persistent
    # cache (different module fingerprint -> full 215 s recompile) and the
    # resulting executable ran the same pool 4.4x slower (28.3 s vs
    # 6.4 s at identical convergence/iterations) — the exported calling
    # convention defeats the compile-cache artifact.  The shipped
    # fast path is the committed bench_cache/ compile-cache seed.
    # BENCH_EXPORT=1 regenerates the blob for future re-evaluation.
    hb("compile_start")
    n = int(os.environ.get("BENCH_N", str(6 * B)))
    aot_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "bench_cache",
        "stream_step.jaxexport",
    )
    if os.environ.get("BENCH_AOT", "0") == "1":
        extra["aot"] = ss.load_step(aot_path, n)
    ss.run(n, max_wall_s=0.0)
    if os.environ.get("BENCH_EXPORT") == "1" and not extra.get("aot"):
        ss.export_step(aot_path, n)
        print(f"#hb exported {aot_path}", flush=True)
    extra["compile_s"] = round(time.time() - t_start, 1)
    hb("compile_done")

    # single measured run; every segment prints an emit-ready snapshot, so
    # the parent holds a real number ~2 segments after warm-up finishes
    run_wall = max(30.0, deadline - time.time() - 10.0)
    stats = ss.run(
        n,
        max_wall_s=run_wall,
        progress_cb=lambda s: snapshot(s, extra),
    )
    snapshot(stats, extra)
    hb("done")


if __name__ == "__main__":
    if "--worker" in sys.argv:
        worker_main()
    else:
        parent_main()
