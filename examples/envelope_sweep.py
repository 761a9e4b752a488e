"""Monte-Carlo landing-envelope sweep (single- or multi-host).

Usage:
  python examples/envelope_sweep.py --n 256 --chunk 64
  # multi-host (one process per host, BASELINE config 5):
  python examples/envelope_sweep.py --n 100000 --chunk 1024 \
      --coordinator <host0>:1234 --num-hosts 2 --host-id <i>

Each host joins jax.distributed, the scenario mesh spans all chips across
hosts (ICI within a slice, DCN across), and envelope statistics reduce with
psum collectives.  Produces a success-region map and a durable result log.
"""

import argparse


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=256)
    ap.add_argument("--chunk", type=int, default=64)
    ap.add_argument("--problem", default="srbm_lcp")
    ap.add_argument("--coordinator", default=None, help="host:port for jax.distributed")
    ap.add_argument("--num-hosts", type=int, default=1)
    ap.add_argument("--host-id", type=int, default=0)
    ap.add_argument("--log", default=None, help="binary result log path")
    ap.add_argument("--map", default=None, help="success-map PNG path")
    args = ap.parse_args()

    import jax

    if args.coordinator:
        jax.distributed.initialize(
            coordinator_address=args.coordinator,
            num_processes=args.num_hosts,
            process_id=args.host_id,
        )

    import jax.numpy as jnp

    from landing_controller_tpu.api import LandingSolver
    from landing_controller_tpu.parallel.montecarlo import monte_carlo_envelope
    from landing_controller_tpu.runtime import ResultLog

    solver = LandingSolver(args.problem, dtype=jnp.float32)
    log = ResultLog(args.log) if args.log else None
    stats = monte_carlo_envelope(
        solver, args.n, chunk=args.chunk, result_log=log, seed=args.host_id
    )
    if log:
        log.close()

    print(
        f"[host {args.host_id}] {stats['n_converged']}/{stats['n_scenarios']} converged "
        f"({100*stats['success_rate']:.1f}%) at {stats['solves_per_sec']:.1f} solves/s"
    )
    if stats["term_min"] is not None:
        print("terminal-state envelope min:", stats["term_min"].round(3))
        print("terminal-state envelope max:", stats["term_max"].round(3))

    if args.map:
        import numpy as np

        from landing_controller_tpu.viz import plot_envelope

        # bin success over (pitch, vz) - the reference's pitch_xVel-style map
        pitch = stats["ics"][:, 4]
        vz = stats["ics"][:, 11]
        pb = np.linspace(-1.1, 1.1, 13)
        vb = np.linspace(-5.2, -0.4, 13)
        H = np.zeros((len(vb) - 1, len(pb) - 1))
        Cnt = np.zeros_like(H)
        pi_ = np.clip(np.digitize(pitch, pb) - 1, 0, len(pb) - 2)
        vi_ = np.clip(np.digitize(vz, vb) - 1, 0, len(vb) - 2)
        for p, v, c in zip(pi_, vi_, stats["converged"]):
            H[v, p] += c
            Cnt[v, p] += 1
        rate = np.where(Cnt > 0, H / np.maximum(Cnt, 1), np.nan)
        plot_envelope(
            0.5 * (pb[:-1] + pb[1:]), 0.5 * (vb[:-1] + vb[1:]), rate,
            "pitch (rad)", "v_z (m/s)", save_path=args.map,
        )
        print("wrote", args.map)


if __name__ == "__main__":
    main()
