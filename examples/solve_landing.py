"""Solve one landing scenario end to end and plot the diagnostics panel.

Usage: python examples/solve_landing.py [--kind kinodynamic] [--plot out.png]
"""

import argparse


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--kind", default="srbm_lcp")
    ap.add_argument("--cascade", action="store_true", help="SRBM -> kinodynamic cascade")
    ap.add_argument("--plot", default=None)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from landing_controller_tpu.api import LandingSolver
    from landing_controller_tpu.warmstart import sample_drop_scenario

    q0, qd0 = sample_drop_scenario(jax.random.PRNGKey(args.seed))
    print("IC q:", np.asarray(q0).round(3), " qd:", np.asarray(qd0).round(3))

    if args.cascade:
        from landing_controller_tpu.warmstart.cascade import make_cascade
        from landing_controller_tpu.warmstart.reference import DT_PRODUCTION

        srbm = LandingSolver("srbm_lcp", theta_overrides={"dt": DT_PRODUCTION})
        kino = LandingSolver("kinodynamic")
        sol, _ = make_cascade(srbm, kino)(q0, qd0)
        solver = kino
    else:
        solver = LandingSolver(args.kind)
        sol = solver.solve(q0, qd0)

    print(
        f"converged={bool(sol.converged)} iterations={int(sol.iterations)} "
        f"kkt={float(sol.kkt_error):.2e} viol={float(sol.constr_viol):.2e}"
    )
    if args.plot:
        from landing_controller_tpu.models import get_robot_model
        from landing_controller_tpu.viz import plot_results

        theta = solver.build_params(q0, qd0)
        t = np.concatenate([[0], np.cumsum(np.asarray(theta.dt))])
        jpos = np.asarray(sol.jpos) if sol.jpos.shape[1] else np.zeros((len(t) - 1, 12))
        plot_results(get_robot_model(), t, sol.X, sol.U, jpos, save_path=args.plot)
        print("wrote", args.plot)


if __name__ == "__main__":
    main()
