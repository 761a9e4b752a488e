"""Primal-dual interior-point NLP solver — the TPU-native IPOPT/KNITRO
replacement (SURVEY.md §2.5).

Solves   min f(z)  s.t.  E(z) = 0,  g(z) >= 0
via slacks (g(z) - s = 0, s > 0) and the log barrier, with:

- exact Lagrangian Hessian (forward-over-reverse autodiff),
- condensed symmetric KKT system solved by (batched) LU with one step of
  iterative refinement (f32-friendly),
- fraction-to-boundary rule + parallel backtracking line search on an
  L1-penalty merit function (all candidates evaluated at once — no
  data-dependent control flow, so the whole solve jits and vmaps),
- monotone Fiacco-McCormick barrier schedule with superlinear decrease
  (the branch-free subset of IPOPT's 'monotone' mu_strategy;
  reference option block: quadruped_SRBM_NLP.m:253-292),
- per-scenario convergence masks: converged scenarios freeze while the
  batch keeps stepping (failed scenarios are masked, not fatal —
  SURVEY.md §5 failure-detection requirement).

Everything below is a pure function of (z0, theta); `solve` is wrapped in
jit by callers and `solve_batch` vmaps it over scenario axes.  The KKT
solve is pluggable: the dense path here is the correctness baseline; the
stage-structured Riccati path (ops/) drops in behind the same interface.

Tolerance contract (matches the reference bar, landing_optimization.m:326-329):
``tol=1e-4`` on the scaled KKT error, ``constr_viol_tol=1e-3``.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class IPConfig:
    max_iter: int = 60
    tol: float = 1e-4  # scaled KKT error (IPOPT 'tol')
    constr_viol_tol: float = 1e-3
    mu_init: float = 1e-1  # IPOPT 'mu_init' (reference value)
    mu_min: float = 1e-6
    kappa_mu: float = 0.2  # linear mu decrease factor
    theta_mu: float = 1.5  # superlinear mu exponent
    kappa_eps: float = 10.0  # barrier subproblem tolerance = kappa_eps * mu
    mu_strategy: str = "monotone"  # "monotone": Fiacco-McCormick stages
    # (each mu held until barrier_err <= kappa_eps*mu — IPOPT's default);
    # "loqo": adaptive centrality-based rule mu = 0.1*min(0.05(1-xi)/xi, 2)^3
    # * avg(s lam), xi = min(s lam)/avg (IPOPT mu_oracle='loqo').  The
    # adaptive rule avoids stalling whole mu stages on slow barrier
    # subproblems — it is the batched/branch-free choice here because one
    # slow scenario otherwise pins its lane at a high mu for tens of
    # iterations (the dominant failure mode observed on cold-start LCP).
    tau_min: float = 0.99  # fraction-to-boundary
    s_init_min: float = 1e-2  # slack floor at init (bound_push analogue)
    delta_w: float = 1e-6  # primal (Hessian) regularization floor
    delta_w_fail: float = 1e-2  # extra regularization when step is bad
    delta_c: float = 1e-8  # dual regularization
    n_linesearch: int = 12  # parallel backtracking ladder size
    # filter line search constants (IPOPT defaults, Waechter-Biegler 2006)
    gamma_theta: float = 1e-5
    gamma_phi: float = 1e-5
    delta_switch: float = 1.0
    s_theta: float = 1.1
    s_phi: float = 2.3
    eta_phi: float = 1e-4  # Armijo constant for f-type steps
    theta_max_fac: float = 1e4  # cap on constraint violation vs initial
    filter_size: int = 32
    kappa_sigma: float = 1e10  # multiplier safeguard lam in [mu/(k s), k mu/s]
    hessian_mode: str = "hybrid"  # "gn": drop constraint curvature (PD by
    # construction, robust); "exact": full Lagrangian Hessian (fast local
    # convergence, needs inertia correction); "hybrid": GN while far from
    # feasibility, exact in the endgame (best of both)
    hybrid_viol_switch: float = 1e-3  # hybrid: exact Hessian below this viol
    hybrid_kkt_switch: float = 1.0  # ... and below this scaled KKT error
    hybrid_mu_switch: float = 2e-3  # ... and below this barrier parameter
    y_max: float = 1e5  # equality-multiplier magnitude cap
    sigma_max: float = 1e8  # cap on lam/s entering the condensed Hessian
    slack_floor: float = 1e-2  # s >= slack_floor * mu after every step: keeps
    # the fraction-to-boundary step length bounded away from zero (a tiny
    # slack with a large-negative ds otherwise collapses alpha_max for the
    # whole iterate — the failure mode observed on warm restarts)
    rescue_alpha: float = 1e-7  # slack-reset rescue: if the boundary rule
    # caps the step below this, the barrier wall has been breached (tiny s,
    # big |ds|); instead of taking a null step forever, re-center (s, lam)
    # barrier-consistently at the current z and reset the filter — a
    # branch-free, per-lane restoration-lite (IPOPT enters its restoration
    # phase in the same situation)
    stall_window: int = 50  # windowed stall detector: every stall_window
    # iterations, compare the best viol+kkt score against the previous
    # window's snapshot; a lane that improved < 10% with an unchanged
    # barrier parameter is declared FAILED and frozen.  In a vmapped solve
    # the while_loop runs until every lane is done; without failure
    # detection one hopeless lane pins the whole batch at max_iter (the
    # dominant wall-time cost at <100% convergence).  0 disables.
    stall_min_iter: int = 60  # never declare failure before this iteration
    stall_restarts: int = 2  # best-iterate restarts before declaring failure:
    # at a stall boundary the lane first RESTORES (z, s, lam, y) from its
    # best-scoring snapshot with the filter cleared and the inertia shift
    # bumped — a bounded retry from the last good point (IPOPT's
    # restoration-phase analogue) — and only fails after this many restarts
    # didn't help.  Keying the restore on the stall window (not on raw
    # score growth) matters: the mu=0 KKT error legitimately spikes 100x+
    # mid-homotopy on healthy solves, while true divergence (exploded
    # duals, wandering filter acceptances on hard drops) persists across a
    # whole window.  0 keeps round-2 behavior (fail at first stall).
    stall_grace: float = 50.0  # never stall-kill a lane whose best score is
    # within stall_grace * tol: slow endgame creep (degenerate LCP duals
    # converge a few %/window) is progress, not hopelessness
    corrector: int = 0  # second-order complementarity corrections per
    # iteration (Mehrotra/Gondzio): each re-solves the SAME KKT factors
    # with the -(ds o dlam)/s term and keeps the corrected direction only
    # where it lengthens the fraction-to-boundary step
    refine_steps: int = 1  # iterative refinement of the KKT solve
    # inertia-correction ladder: the candidate shifts factorized in parallel
    # each iteration.  0.0 -> the delta_w floor; s > 0 -> s * delta_last
    # (the carried adaptive shift).  Shorter ladders factor less per
    # iteration; a failed step bumps delta_last 10x for the next iteration,
    # so robustness costs occasional extra iterations instead of 4x factor
    # work every iteration (IPOPT re-factors inside an iteration; we
    # amortize across iterations to stay branch-free).
    ladder_scales: tuple = (0.0, 1.0, 10.0, 1000.0)
    matmul_precision: str = "highest"  # f32 matmul emulation on the MXU:
    # "highest" = bf16x6 (near-f32), "high" = bf16x3 (~half the MXU work,
    # ~3e-7 -> ~1e-6 relative error).  The KKT factor/solve tolerates
    # "high" when iterative refinement is on; measured on the bench before
    # switching any default.
    kkt_backend: str = "scan"  # structured KKT: "scan" (sequential block
    # LDL' sweep) or "cr" (block cyclic reduction — log-depth, batched
    # factor/update per level; the TPU-friendly choice)
    relax_scale: float = 0.0  # mu-proportional relaxation of marked rows
    # (MPCC homotopy: g_eff = g + relax_scale*mu*mask; exact as mu -> floor)
    alpha_for_y: str = "bound-mult"  # equality-multiplier step size:
    # "bound-mult" (IPOPT alpha_for_y='bound-mult', the reference's tuned
    # choice, landing_optimization.m:342) or "primal" (IPOPT default).
    # bound-mult creeps on degenerate-LCP endgames: alpha_lam collapses to
    # ~5e-3 on active complementarity rows and y inherits it, so the dual
    # residual decays at (1-alpha_lam)/iter.  primal lets y move with the
    # accepted primal step.
    bound_relax_factor: float = 1e-6  # constant relaxation of ALL inequality
    # rows (IPOPT bound_relax_factor, the reference's tuned value,
    # landing_optimization.m:333): restores a strict interior for pinched
    # bound pairs (e.g. scheduled flight legs with 0 <= fz <= 0), keeping
    # their multipliers bounded


class IPResult(NamedTuple):
    z: jnp.ndarray  # primal solution
    s: jnp.ndarray  # slacks
    lam: jnp.ndarray  # inequality multipliers (>= 0)
    y: jnp.ndarray  # equality multipliers (sign: L = f + y'E - lam'(g-s))
    converged: jnp.ndarray  # bool
    iterations: jnp.ndarray  # int
    kkt_error: jnp.ndarray  # final scaled KKT error
    constr_viol: jnp.ndarray  # final max violation
    cost: jnp.ndarray
    # telemetry (fixed length max_iter):
    kkt_history: jnp.ndarray
    mu_history: jnp.ndarray
    alpha_history: jnp.ndarray


class IPState(NamedTuple):
    """Full resumable solver state (streaming/segmented solves carry this
    between jitted segments; see solve(..., state0, segment_iters))."""

    z: jnp.ndarray
    s: jnp.ndarray
    lam: jnp.ndarray
    y: jnp.ndarray
    mu: jnp.ndarray
    delta: jnp.ndarray  # adaptive inertia-correction regularization
    filt_theta: jnp.ndarray  # filter corners (constraint violation)
    filt_phi: jnp.ndarray  # filter corners (barrier objective)
    filt_ptr: jnp.ndarray  # next filter slot
    it: jnp.ndarray
    done: jnp.ndarray
    best_score: jnp.ndarray  # best viol+kkt seen (stall detector + restore)
    best_z: jnp.ndarray  # best-scoring iterate (explosion restore point)
    best_s: jnp.ndarray
    best_lam: jnp.ndarray
    best_y: jnp.ndarray
    snap_score: jnp.ndarray  # best score at the last window snapshot
    snap_mu: jnp.ndarray  # mu at the last window snapshot
    n_restores: jnp.ndarray  # stall-restart count (see IPConfig.stall_restarts)
    kkt_hist: jnp.ndarray
    mu_hist: jnp.ndarray
    alpha_hist: jnp.ndarray


def _kkt_error_rd(r_d, E, g, s, lam, y, mu):
    """Scaled KKT error from a precomputed dual residual r_d."""
    m = s.shape[0] + y.shape[0]
    s_d = jnp.maximum(100.0, (jnp.sum(jnp.abs(lam)) + jnp.sum(jnp.abs(y))) / m) / 100.0
    s_c = jnp.maximum(100.0, jnp.sum(jnp.abs(lam)) / s.shape[0]) / 100.0
    err_d = jnp.max(jnp.abs(r_d)) / s_d
    err_e = jnp.max(jnp.abs(E))
    err_g = jnp.max(jnp.abs(g - s))
    err_c = jnp.max(jnp.abs(s * lam - mu)) / s_c
    return jnp.maximum(jnp.maximum(err_d, err_e), jnp.maximum(err_g, err_c)), r_d


def _kkt_error(grad_f, Je, Jg, E, g, s, lam, y, mu):
    """Scaled KKT error (dense-Jacobian convenience wrapper)."""
    return _kkt_error_rd(grad_f + Je.T @ y - Jg.T @ lam, E, g, s, lam, y, mu)


def _merit(f, E, g, s, mu, rho):
    """L1 exact-penalty barrier merit function."""
    return f - mu * jnp.sum(jnp.log(s)) + rho * (jnp.sum(jnp.abs(E)) + jnp.sum(jnp.abs(g - s)))


def _solve_kkt(H0, Je, rhs_z, rhs_y, delta_last, cfg):
    """Inertia-corrected Schur-complement KKT solve.

    Solves [[H0+dI, Je'],[Je, -delta_c I]] [dz; dy] = [rhs_z; rhs_y] where d
    is the smallest value from a ladder {delta_w, delta_last, 10 delta_last,
    1e3 delta_last} making H0+dI positive definite (Cholesky succeeds) — the
    branch-free analogue of IPOPT's inertia-correction loop (all candidates
    factorized in parallel; jit/vmap friendly).  Requiring full H > 0 (not
    just reduced-space) is conservative but guarantees a descent direction
    and a quasi-definite system solvable by two PD Cholesky factorizations —
    much friendlier to f32/TPU than an indefinite LU.

    Returns (dz, dy, delta_used, resolve) where ``resolve(rhs_z, rhs_y)``
    re-solves with the SAME factorization (corrector steps).
    """
    n = rhs_z.shape[0]
    dtype = H0.dtype
    eye = jnp.eye(n, dtype=dtype)
    # Jacobi equilibration: solve (D H D)(D^-1 dz) = D rhs with
    # D = (diag(H) + base)^(-1/2), base = mean diagonal.  The absolute term
    # matters: Gauss-Newton cost curvature touches few variables, so bare
    # diag(H) can be ~0 (e.g. interior joint angles), and both the scaling
    # and the *relative* delta-shift would vanish exactly where
    # regularization is needed.  With the mixed base, the normalized matrix
    # has diag <= 1 and the ladder shift delta*I corresponds to
    # delta*(diag(H) + base) unnormalized — relative + absolute in one.
    diag0 = jnp.diagonal(H0)
    # fractional absolute floor: big enough to bound the scaling of
    # zero-curvature variables (and give them delta-regularization), small
    # enough not to wash out the relative scaling of active rows in f32
    base = 1e-2 * jnp.mean(diag0) + jnp.asarray(1e-12, dtype)
    dH = jnp.sqrt(diag0 + base)
    dinv = 1.0 / dH
    Hn = H0 * dinv[:, None] * dinv[None, :]
    deltas = jnp.stack(
        [
            jnp.asarray(cfg.delta_w, dtype) if s == 0.0 else s * delta_last
            for s in cfg.ladder_scales
        ]
    )
    Hs = Hn[None] + deltas[:, None, None] * eye[None]
    Ls = jax.vmap(jnp.linalg.cholesky)(Hs)
    ok = jax.vmap(lambda L: jnp.all(jnp.isfinite(L)))(Ls)
    # first (smallest-delta) successful candidate; fall back to the largest
    idx = jnp.where(jnp.any(ok), jnp.argmax(ok), deltas.shape[0] - 1)
    L = Ls[idx]
    delta_used = deltas[idx]
    # guard: if even the largest failed, add a big emergency shift
    need_emergency = ~jnp.any(ok)
    L = jnp.where(
        need_emergency,
        jnp.linalg.cholesky(Hn + (1e3 * delta_last + 1e3) * eye),
        L,
    )
    delta_used = jnp.where(need_emergency, 1e3 * delta_last + 1e3, delta_used)

    def hsolve(b):
        # un-equilibrated solve: (H + d*diag(H))^-1 b via the scaled factor
        bn = b * dinv if b.ndim == 1 else b * dinv[:, None]
        xn = jax.scipy.linalg.cho_solve((L, True), bn)
        return xn * dinv if b.ndim == 1 else xn * dinv[:, None]

    # Schur complement on the equality block (also equilibrated):
    #   S dy = Je H^-1 rhs_z - rhs_y,   dz = H^-1 (rhs_z - Je' dy)
    HiJt = hsolve(Je.T)  # (n, me)
    delta_c = jnp.maximum(jnp.asarray(cfg.delta_c, dtype), 1e-6 * delta_used)
    S = Je @ HiJt + delta_c * jnp.eye(Je.shape[0], dtype=dtype)
    dS = jnp.sqrt(jnp.maximum(jnp.diagonal(S), 1e-12))
    dSinv = 1.0 / dS
    Sn = S * dSinv[:, None] * dSinv[None, :]
    # Schur shift ladder: with redundant equality rows (e.g. the eeParam
    # structure pins) Je H^-1 Je' is only PSD, and in f32 the normalized
    # complement needs more than a 1e-7 shift — take the smallest shift
    # whose Cholesky is finite (observed: eeParam f32 NaN'd here and every
    # step of the solve was rejected as non-finite)
    eye_s = jnp.eye(S.shape[0], dtype=dtype)
    s_shifts = jnp.asarray([1e-7, 1e-5, 1e-3, 1e-1], dtype)
    Ls_cands = jax.vmap(lambda sh: jnp.linalg.cholesky(Sn + sh * eye_s))(s_shifts)
    ok_s = jax.vmap(lambda Lc: jnp.all(jnp.isfinite(Lc)))(Ls_cands)
    idx_s = jnp.where(jnp.any(ok_s), jnp.argmax(ok_s), s_shifts.shape[0] - 1)
    Ls_s = Ls_cands[idx_s]

    def ssolve(b):
        return jax.scipy.linalg.cho_solve((Ls_s, True), b * dSinv) * dSinv

    Hd = H0 + delta_used * (dH * dH)[None, :] * eye  # actual shifted matrix

    def resolve(rhs_z_v, rhs_y_v):
        dy_v = ssolve(Je @ hsolve(rhs_z_v) - rhs_y_v)
        dz_v = hsolve(rhs_z_v - Je.T @ dy_v)
        for _ in range(cfg.refine_steps):
            # one step of iterative refinement on the full KKT system
            r_z = rhs_z_v - (Hd @ dz_v + Je.T @ dy_v)
            r_y = rhs_y_v - (Je @ dz_v - delta_c * dy_v)
            ddy = ssolve(Je @ hsolve(r_z) - r_y)
            ddz = hsolve(r_z - Je.T @ ddy)
            dz_v = dz_v + ddz
            dy_v = dy_v + ddy
        return dz_v, dy_v

    dz, dy = resolve(rhs_z, rhs_y)
    return dz, dy, delta_used, resolve


def solve(
    cost_fn: Callable,
    eq_fn: Callable,
    ineq_fn: Callable,
    z0: jnp.ndarray,
    config: IPConfig = IPConfig(),
    y0: jnp.ndarray | None = None,
    lam0: jnp.ndarray | None = None,
    s0: jnp.ndarray | None = None,
    relax_mask: jnp.ndarray | None = None,
    newton_step_fn=None,
    state0: "IPState | None" = None,
    segment_iters: int | None = None,
    return_state: bool = False,
):
    """Solve one NLP instance.  cost/eq/ineq are closures over theta.

    Warm start: pass (y0, lam0, s0) from a previous solve; primal warm start
    is just z0 (the reference's warm-start flow saves/restores exactly these,
    landing_optimization.m:395-403).

    relax_mask marks degenerate (e.g. complementarity) inequality rows for
    the mu-proportional relaxation homotopy: those rows are loosened by
    ``relax_scale * (mu - mu_floor)`` so their multipliers stay bounded
    during the early barrier stages (Scholtes-style MPCC regularization tied
    to the barrier schedule); the relaxation vanishes as mu reaches its
    floor, so converged iterates satisfy the original constraints.

    Segmented (streaming) mode: pass state0 (from a previous call with
    return_state=True) to resume, and segment_iters=K to run at most K
    further iterations (segment_iters=0 with return_state just initializes).
    The iteration histories are ring buffers indexed it % max_iter.
    """
    cfg = config
    dtype = z0.dtype
    n = z0.shape[0]

    raw_ineq_fn = ineq_fn
    br = cfg.bound_relax_factor

    def base_ineq_fn(z):
        return raw_ineq_fn(z) + br

    if relax_mask is not None and cfg.relax_scale > 0.0:
        _mask = jnp.asarray(relax_mask, dtype)
        _mu_floor = jnp.asarray(cfg.mu_min, dtype)

        def make_ineq(mu):
            off = cfg.relax_scale * jnp.maximum(mu - _mu_floor, 0.0)
            return lambda z: base_ineq_fn(z) + off * _mask
    else:

        def make_ineq(mu):
            return base_ineq_fn

    # TPU: f32 matmuls default to bf16 MXU passes - fatal for KKT solves.
    # Trace everything below at raised precision (bf16x6 'highest' by
    # default; 'high' = bf16x3 halves MXU passes — see IPConfig).
    _prec = jax.default_matmul_precision(cfg.matmul_precision)

    grad_f_fn = jax.grad(cost_fn)
    Je_fn = jax.jacfwd(eq_fn)
    Jg_fn = jax.jacfwd(ineq_fn)

    def lagrangian(z, y, lam):
        return cost_fn(z) + eq_fn(z) @ y - ineq_fn(z) @ lam

    hess_exact_fn = jax.jacfwd(jax.grad(lagrangian, argnums=0), argnums=0)
    hess_gn_fn = jax.jacfwd(jax.grad(cost_fn))

    if config.hessian_mode == "exact":

        def hess_fn(z, y, lam, use_exact):
            return hess_exact_fn(z, y, lam)

    elif config.hessian_mode == "gn":

        def hess_fn(z, y, lam, use_exact):
            return hess_gn_fn(z)

    else:  # hybrid: GN globally, exact Lagrangian curvature in the endgame.
        # The Hessian is LINEAR in (y, lam), so scaling the multipliers by
        # the switch flag yields both branches from ONE forward-over-reverse
        # sweep: uf=0 gives exactly the cost (GN) Hessian, uf=1 the full
        # Lagrangian Hessian — no double evaluation under the old
        # jnp.where(use_exact, exact, gn) form (VERDICT r3 weak #4).

        def hess_fn(z, y, lam, use_exact):
            uf = use_exact.astype(z.dtype)
            return hess_exact_fn(z, uf * y, uf * lam)

    def vjp_eq(z, v):
        return jax.vjp(eq_fn, z)[1](v)[0]

    def vjp_ineq(z, v):
        return jax.vjp(ineq_fn, z)[1](v)[0]

    def jvp_ineq(z, dz):
        return jax.jvp(ineq_fn, (z,), (dz,))[1]

    if newton_step_fn is None:

        def newton_step_fn(z, y, lam, sigma, mu, use_exact, r_d, r_g, rhs_z, rhs_y, delta_last):
            Je = Je_fn(z)
            Jg = Jg_fn(z)
            W = hess_fn(z, y, lam, use_exact)
            H = W + Jg.T @ (sigma[:, None] * Jg)
            return _solve_kkt(H, Je, rhs_z, rhs_y, delta_last, cfg)

    g0 = ineq_fn(z0)
    E0 = eq_fn(z0)
    me, mi = E0.shape[0], g0.shape[0]

    # barrier-consistent slack init: s solves s*(s - g) = mu, i.e. the
    # positive root (g + sqrt(g^2 + 4 mu))/2 — keeps sigma = lam/s = mu/s^2
    # bounded even at infeasible starts (vs. pinning s at a floor).  The
    # floor is mu-scaled (the same slack_floor*mu invariant the loop
    # maintains): a fixed floor would shove active-row slacks to 1e-2 on
    # warm starts at small mu_init and perturb a feasible z0 by that much.
    s_floor = jnp.minimum(
        jnp.asarray(cfg.s_init_min, dtype), cfg.slack_floor * cfg.mu_init
    )
    s_init = (
        jnp.maximum((g0 + jnp.sqrt(g0 * g0 + 4.0 * cfg.mu_init)) / 2.0, s_floor)
        if s0 is None
        else s0
    )
    lam_init = (
        jnp.clip(cfg.mu_init / s_init, 1e-8, 1e3) if lam0 is None else lam0
    )
    if y0 is None:
        # least-squares equality-dual initialization (IPOPT's
        # least-square-primal-dual init): y = argmin ||grad_f - Jg'lam + Je'y||
        # — prevents the first iterations from wandering off a warm start
        # while the duals catch up.  Solved MATRIX-FREE by CG on the normal
        # equations (Je Je' y = -Je r) with jvp/vjp matvecs: materializing
        # dense Je/Jg here cost ~27 MB f32 per scenario lane on the CCC
        # problem (mi ~4.6k x n ~1.5k) and capped batch sizes.  The init
        # only needs to be approximate; 25 CG iterations is plenty.
        _gf0 = grad_f_fn(z0)
        _r = _gf0 - vjp_ineq(z0, lam_init)

        def _G_mv(v):
            return jax.jvp(eq_fn, (z0,), (vjp_eq(z0, v),))[1] + 1e-8 * v

        _b = -jax.jvp(eq_fn, (z0,), (_r,))[1]

        def _cg_body(carry, _):
            yk, rk, pk, rs = carry
            Ap = _G_mv(pk)
            alpha_cg = rs / jnp.maximum(pk @ Ap, 1e-30)
            yk = yk + alpha_cg * pk
            rk = rk - alpha_cg * Ap
            rs_new = rk @ rk
            pk = rk + (rs_new / jnp.maximum(rs, 1e-30)) * pk
            return (yk, rk, pk, rs_new), None

        _y0 = jnp.zeros(me, dtype)
        (_ycg, _, _, _), _ = jax.lax.scan(
            _cg_body, (_y0, _b, _b, _b @ _b), None, length=25
        )
        y_init = jnp.clip(_ycg, -cfg.y_max, cfg.y_max)
        y_init = jnp.where(jnp.isfinite(y_init), y_init, 0.0)
    else:
        y_init = y0

    theta_0 = jnp.sum(jnp.abs(eq_fn(z0))) + jnp.sum(jnp.abs(ineq_fn(z0) - s_init))
    theta_max = cfg.theta_max_fac * jnp.maximum(1.0, theta_0)
    big = jnp.asarray(jnp.finfo(dtype).max / 4, dtype)
    init = IPState(
        z=z0,
        s=s_init,
        lam=lam_init,
        y=y_init,
        mu=jnp.asarray(cfg.mu_init, dtype),
        delta=jnp.asarray(cfg.delta_w_fail, dtype),
        filt_theta=jnp.full(cfg.filter_size, theta_max, dtype),
        filt_phi=jnp.full(cfg.filter_size, -big, dtype),
        filt_ptr=jnp.asarray(0, jnp.int32),
        it=jnp.asarray(0, jnp.int32),
        done=jnp.asarray(False),
        best_score=big,
        best_z=z0,
        best_s=s_init,
        best_lam=lam_init,
        best_y=y_init,
        snap_score=big,
        snap_mu=jnp.asarray(cfg.mu_init, dtype),
        n_restores=jnp.asarray(0, jnp.int32),
        kkt_hist=jnp.zeros(cfg.max_iter, dtype),
        mu_hist=jnp.zeros(cfg.max_iter, dtype),
        alpha_hist=jnp.zeros(cfg.max_iter, dtype),
    )

    if state0 is not None:
        init = state0
    if segment_iters is None:
        it_stop = jnp.asarray(cfg.max_iter, jnp.int32)
    else:
        it_stop = init.it + jnp.asarray(segment_iters, jnp.int32)
        it_stop = jnp.minimum(it_stop, cfg.max_iter)

    def cond(st: IPState):
        return (st.it < it_stop) & (~st.done)

    def body(st: IPState):
        z, s, lam, y, mu = st.z, st.s, st.lam, st.y, st.mu
        ineq_mu = make_ineq(mu)

        f = cost_fn(z)
        E = eq_fn(z)
        g = ineq_mu(z)
        g_true = base_ineq_fn(z)
        grad_f = grad_f_fn(z)
        # matrix-free dual residual: r_d = grad_f + Je'y - Jg'lam
        r_d = grad_f + vjp_eq(z, y) - vjp_ineq(z, lam)

        kkt_err, _ = _kkt_error_rd(r_d, E, g, s, lam, y, mu)
        viol = jnp.maximum(jnp.max(jnp.abs(E)), jnp.max(jnp.maximum(-g_true, 0.0)))
        # overall convergence test at mu -> tol level, on the TRUE constraints
        kkt_err0, _ = _kkt_error_rd(r_d, E, g_true, s, lam, y, 0.0)
        converged = (kkt_err0 <= cfg.tol) & (viol <= cfg.constr_viol_tol)

        # ---- Newton step on the barrier KKT system (slack elimination)
        sigma = jnp.minimum(lam / s, cfg.sigma_max)
        use_exact = (
            (viol < cfg.hybrid_viol_switch)
            & (kkt_err0 < cfg.hybrid_kkt_switch)
            & (mu <= cfg.hybrid_mu_switch)
        )
        r_g = g - s
        rhs_z = -(r_d) + vjp_ineq(z, mu / s - lam - sigma * r_g)
        rhs_y = -E
        dz, dy, delta_used, resolve = newton_step_fn(
            z, y, lam, sigma, mu, use_exact, r_d, r_g, rhs_z, rhs_y, st.delta
        )
        ds = jvp_ineq(z, dz) + r_g
        dlam = mu / s - lam - sigma * ds

        # ---- fraction-to-boundary
        tau = jnp.maximum(cfg.tau_min, 1.0 - mu)

        def max_step(v, dv, pinned=None):
            ratio = jnp.where(dv < 0, -v / jnp.where(dv < 0, dv, -1.0), jnp.inf)
            if pinned is not None:
                # rows whose slack sits at the mu-floor don't gate the step:
                # their positivity is enforced by the post-step floor clip.
                # Without this, ONE active row with tiny s and large |ds|
                # throttles every lane's alpha to ~s/|ds| and the solve
                # creeps (the dominant warm-restart/cold-stall failure mode).
                ratio = jnp.where(pinned, jnp.inf, ratio)
            return jnp.minimum(1.0, tau * jnp.min(ratio))

        s_pinned = s <= 2.0 * cfg.slack_floor * mu
        alpha_s = max_step(s, ds, pinned=s_pinned)
        alpha_lam = max_step(lam, dlam)

        # ---- second-order (Mehrotra/Gondzio-style) complementarity
        # corrector: re-solve with the SAME factorization, adding the
        # -(ds o dlam)/s term the Newton linearization of S Lam e = mu e
        # drops.  The corrected direction is kept only where it lengthens
        # the fraction-to-boundary step (Gondzio's acceptance test) —
        # branch-free per lane.  One extra backsolve per correction; the
        # factorization (the expensive part) is reused.
        for _ in range(cfg.corrector):
            corr = -(ds * dlam) / s
            dz_c, dy_c = resolve(rhs_z + vjp_ineq(z, corr), rhs_y)
            ds_c = jvp_ineq(z, dz_c) + r_g
            dlam_c = mu / s - lam + corr - sigma * ds_c
            alpha_s_c = max_step(s, ds_c, pinned=s_pinned)
            alpha_lam_c = max_step(lam, dlam_c)
            better_c = (
                jnp.minimum(alpha_s_c, alpha_lam_c)
                >= jnp.minimum(alpha_s, alpha_lam)
            ) & jnp.all(jnp.isfinite(dz_c)) & jnp.all(jnp.isfinite(dlam_c))
            dz = jnp.where(better_c, dz_c, dz)
            dy = jnp.where(better_c, dy_c, dy)
            ds = jnp.where(better_c, ds_c, ds)
            dlam = jnp.where(better_c, dlam_c, dlam)
            alpha_s = jnp.where(better_c, alpha_s_c, alpha_s)
            alpha_lam = jnp.where(better_c, alpha_lam_c, alpha_lam)

        # ---- filter line search (Waechter-Biegler 2006, the IPOPT
        # globalization the reference's tuned option block relies on).
        # All ladder candidates are evaluated in parallel; acceptability is
        # tested against the (fixed-size) filter, the current point, and the
        # Armijo condition on f-type steps.
        theta0 = jnp.sum(jnp.abs(E)) + jnp.sum(jnp.abs(g - s))
        phi0 = f - mu * jnp.sum(jnp.log(s))
        grad_phi_dz = grad_f @ dz - mu * jnp.sum(ds / s)

        alphas = alpha_s * (0.5 ** jnp.arange(cfg.n_linesearch, dtype=dtype))

        def eval_at(a):
            z_t = z + a * dz
            # same floor clip as the accepted step (pinned rows are excluded
            # from the boundary rule, so s + a*ds can cross zero there)
            s_t = jnp.maximum(s + a * ds, cfg.slack_floor * mu)
            E_t = eq_fn(z_t)
            g_t = ineq_mu(z_t)
            theta_t = jnp.sum(jnp.abs(E_t)) + jnp.sum(jnp.abs(g_t - s_t))
            phi_t = cost_fn(z_t) - mu * jnp.sum(jnp.log(s_t))
            return theta_t, phi_t

        thetas, phis = jax.vmap(eval_at)(alphas)

        # acceptability vs filter entries and vs the current point
        f_th = jnp.concatenate([st.filt_theta, theta0[None]])
        f_ph = jnp.concatenate([st.filt_phi, phi0[None]])
        acc_mat = (thetas[:, None] <= (1.0 - cfg.gamma_theta) * f_th[None, :]) | (
            phis[:, None] <= f_ph[None, :] - cfg.gamma_phi * f_th[None, :]
        )
        acc_filter = jnp.all(acc_mat, axis=1) & (thetas <= theta_max)

        # switching condition: f-type iteration requires Armijo on phi
        descent = grad_phi_dz < 0
        switch = descent & (
            alphas * (-grad_phi_dz) ** cfg.s_phi
            > cfg.delta_switch * theta0**cfg.s_theta
        )
        armijo_ok = phis <= phi0 + cfg.eta_phi * alphas * grad_phi_dz
        acceptable = acc_filter & jnp.where(switch, armijo_ok, True)

        step_finite = (
            jnp.all(jnp.isfinite(dz))
            & jnp.all(jnp.isfinite(dy))
            & jnp.all(jnp.isfinite(ds))
            & jnp.all(jnp.isfinite(dlam))
        )
        acceptable = acceptable & step_finite & jnp.isfinite(thetas) & jnp.isfinite(phis)
        any_ok = jnp.any(acceptable)
        idx_ok = jnp.argmax(acceptable)  # largest acceptable alpha
        # fallback (restoration surrogate): most feasibility-reducing candidate
        idx_fb = jnp.argmin(jnp.where(jnp.isfinite(thetas), thetas, jnp.inf))
        idx = jnp.where(any_ok, idx_ok, idx_fb)
        alpha = jnp.where(step_finite, alphas[idx], 0.0)
        # a theta-type acceptance augments the filter
        theta_type = any_ok & ~(switch[idx] & armijo_ok[idx])
        slot = st.filt_ptr % cfg.filter_size
        filt_theta_new = jnp.where(
            theta_type,
            st.filt_theta.at[slot].set((1.0 - cfg.gamma_theta) * theta0),
            st.filt_theta,
        )
        filt_phi_new = jnp.where(
            theta_type,
            st.filt_phi.at[slot].set(phi0 - cfg.gamma_phi * theta0),
            st.filt_phi,
        )
        filt_ptr_new = st.filt_ptr + theta_type.astype(jnp.int32)

        # carry the inertia-correction shift: decay after a good step, bump
        # after a rejected one (next _solve_kkt ladder starts from this).
        delta_new = jnp.where(
            any_ok,
            jnp.maximum(delta_used / 3.0, cfg.delta_w_fail * 1e-2),
            jnp.minimum(jnp.maximum(delta_used, cfg.delta_w_fail) * 10.0, 1e6),
        )

        safe = lambda d: jnp.where(jnp.isfinite(d), d, 0.0)
        dz, ds, dlam, dy = safe(dz), safe(ds), safe(dlam), safe(dy)
        z_new = z + alpha * dz
        s_new = jnp.maximum(s + alpha * ds, cfg.slack_floor * mu)
        lam_new = jnp.clip(lam + alpha_lam * dlam, 1e-12, None)
        # IPOPT kappa_Sigma safeguard: keep lam within a band of mu/s so
        # sigma can never poison the condensed Hessian (IPOPT eq. (16)).
        lam_new = jnp.clip(
            lam_new, mu / (cfg.kappa_sigma * s_new), cfg.kappa_sigma * mu / s_new
        )
        # equality-multiplier step size: see IPConfig.alpha_for_y
        alpha_y = alpha_lam if cfg.alpha_for_y == "bound-mult" else alpha
        y_new = jnp.clip(y + alpha_y * dy, -cfg.y_max, cfg.y_max)

        # ---- stall rescue: fraction-to-boundary collapse means the barrier
        # wall was breached (slack pinned ~0 against a large-negative ds, a
        # capped-sigma leak).  Re-center (s, lam) on the barrier manifold at
        # the unchanged z and clear the filter; the next iteration sees the
        # restored wall.  Null steps would otherwise repeat forever.
        collapsed = step_finite & (alpha_s < cfg.rescue_alpha)
        s_resc = jnp.maximum(
            (g + jnp.sqrt(g * g + 4.0 * mu)) / 2.0, cfg.slack_floor * mu
        )
        lam_resc = jnp.clip(mu / s_resc, 1e-8, 1e3)
        z_new = jnp.where(collapsed, z, z_new)
        s_new = jnp.where(collapsed, s_resc, s_new)
        lam_new = jnp.where(collapsed, lam_resc, lam_new)
        y_new = jnp.where(collapsed, y, y_new)

        # rescue also clears the filter (the old corners were recorded
        # against now-reset slacks) and the carried inertia shift
        filt_theta_new = jnp.where(collapsed, jnp.full_like(filt_theta_new, theta_max), filt_theta_new)
        filt_phi_new = jnp.where(collapsed, jnp.full_like(filt_phi_new, -big), filt_phi_new)
        filt_ptr_new = jnp.where(collapsed, 0, filt_ptr_new)

        # ---- best-iterate snapshot (stall-restart restore point): score
        # measured at the CURRENT iterate, so the snapshot is the pre-step
        # state of the best iteration seen
        score = viol + kkt_err0
        is_best = score < st.best_score
        snap = lambda cur, old: jnp.where(is_best, cur, old)
        best_z_new = snap(z, st.best_z)
        best_s_new = snap(s, st.best_s)
        best_lam_new = snap(lam, st.best_lam)
        best_y_new = snap(y, st.best_y)

        # ---- barrier update
        if cfg.mu_strategy == "loqo":
            # adaptive centrality rule (LOQO / IPOPT mu_oracle='loqo'),
            # evaluated at the accepted iterate; mu moves every iteration,
            # so the filter is NOT reset on mu changes (it would never act)
            comp = s_new * lam_new
            avg = jnp.maximum(jnp.mean(comp), jnp.asarray(1e-30, dtype))
            xi = jnp.min(comp) / avg
            sig_c = 0.1 * jnp.minimum(
                0.05 * (1.0 - xi) / jnp.maximum(xi, 1e-12), 2.0
            ) ** 3
            mu_new = jnp.clip(sig_c * avg, cfg.mu_min, cfg.mu_init)
            # rate-limit the decrease to kappa_mu per iteration: the MPCC
            # relaxation rides mu (relax_scale), so a cliff-drop in mu
            # rips the complementarity relaxation out from under lanes that
            # haven't discovered their active set yet (hard-drop failures)
            mu_new = jnp.maximum(mu_new, cfg.kappa_mu * mu)
        else:
            # monotone Fiacco-McCormick with superlinear decrease
            barrier_err, _ = _kkt_error_rd(r_d, E, g, s, lam, y, mu)
            shrink = barrier_err <= cfg.kappa_eps * mu
            mu_new = jnp.where(
                shrink,
                jnp.maximum(cfg.tol / 10.0, jnp.minimum(cfg.kappa_mu * mu, mu**cfg.theta_mu)),
                mu,
            )
            mu_new = jnp.maximum(mu_new, cfg.mu_min)
            # reset the filter whenever the barrier parameter changes (IPOPT does)
            mu_changed = mu_new != mu
            filt_theta_new = jnp.where(mu_changed, jnp.full_like(filt_theta_new, theta_max), filt_theta_new)
            filt_phi_new = jnp.where(mu_changed, jnp.full_like(filt_phi_new, -big), filt_phi_new)
            filt_ptr_new = jnp.where(mu_changed, 0, filt_ptr_new)

        # ---- windowed stall detector (see IPConfig.stall_window): at each
        # window boundary, a lane whose best viol+kkt score improved < 10%
        # over the window while mu never moved has stalled inside a barrier
        # stage (IPOPT's analogue: restoration failure) -> freeze as FAILED
        best_new = jnp.minimum(st.best_score, score)
        if cfg.stall_window > 0:
            at_boundary = (st.it + 1) % cfg.stall_window == 0
            # "barrier stage unchanged" guard: under the monotone rule mu is
            # piecewise constant, so equality is the right test; under loqo
            # mu moves every iteration and equality NEVER holds — a stalled
            # loqo lane then burns its whole budget (observed: loqo failures
            # all ran to max_iter).  For loqo, treat "mu not meaningfully
            # lower than at the snapshot" as the unchanged-stage condition.
            if cfg.mu_strategy == "loqo":
                mu_same_stage = mu_new > 0.5 * st.snap_mu
            else:
                mu_same_stage = mu_new == st.snap_mu
            stalled_raw = (
                at_boundary
                & (best_new > 0.9 * st.snap_score)
                & (best_new > cfg.stall_grace * cfg.tol)
                & mu_same_stage
                & (st.it >= cfg.stall_min_iter)
            )
            # first stall_restarts stalls RESTORE the best iterate and retry
            # (bumped inertia shift, cleared filter) instead of failing
            do_restore = stalled_raw & (st.n_restores < cfg.stall_restarts)
            stalled = stalled_raw & ~do_restore
            z_new = jnp.where(do_restore, best_z_new, z_new)
            s_new = jnp.where(do_restore, best_s_new, s_new)
            lam_new = jnp.where(do_restore, best_lam_new, lam_new)
            y_new = jnp.where(do_restore, best_y_new, y_new)
            delta_new = jnp.where(
                do_restore,
                jnp.minimum(jnp.maximum(delta_used, cfg.delta_w_fail) * 30.0, 1e6),
                delta_new,
            )
            filt_theta_new = jnp.where(
                do_restore, jnp.full_like(filt_theta_new, theta_max), filt_theta_new
            )
            filt_phi_new = jnp.where(
                do_restore, jnp.full_like(filt_phi_new, -big), filt_phi_new
            )
            filt_ptr_new = jnp.where(do_restore, 0, filt_ptr_new)
            n_restores_new = st.n_restores + do_restore.astype(jnp.int32)
            snap_score_new = jnp.where(at_boundary, best_new, st.snap_score)
            snap_mu_new = jnp.where(at_boundary, mu_new, st.snap_mu)
        else:
            stalled = jnp.asarray(False)
            snap_score_new = st.snap_score
            snap_mu_new = st.snap_mu
            n_restores_new = st.n_restores

        # freeze once converged (or hopeless)
        keep = st.done | converged | stalled
        upd = lambda new, old: jnp.where(keep, old, new)
        st_new = IPState(
            z=upd(z_new, z),
            s=upd(s_new, s),
            lam=upd(lam_new, lam),
            y=upd(y_new, y),
            mu=upd(mu_new, mu),
            delta=upd(delta_new, st.delta),
            filt_theta=jnp.where(keep, st.filt_theta, filt_theta_new),
            filt_phi=jnp.where(keep, st.filt_phi, filt_phi_new),
            filt_ptr=jnp.where(keep, st.filt_ptr, filt_ptr_new),
            it=st.it + 1,
            done=keep,
            best_score=best_new,
            best_z=upd(best_z_new, st.best_z),
            best_s=upd(best_s_new, st.best_s),
            best_lam=upd(best_lam_new, st.best_lam),
            best_y=upd(best_y_new, st.best_y),
            snap_score=jnp.where(keep, st.snap_score, snap_score_new),
            snap_mu=jnp.where(keep, st.snap_mu, snap_mu_new),
            n_restores=jnp.where(keep, st.n_restores, n_restores_new),
            kkt_hist=st.kkt_hist.at[st.it % cfg.max_iter].set(kkt_err0),
            mu_hist=st.mu_hist.at[st.it % cfg.max_iter].set(mu),
            alpha_hist=st.alpha_hist.at[st.it % cfg.max_iter].set(jnp.where(keep, 0.0, alpha)),
        )
        return st_new

    with _prec:
        final = jax.lax.while_loop(cond, body, init)

    # final diagnostics (same matmul precision as the loop, true constraints)
    z, s, lam, y = final.z, final.s, final.lam, final.y
    with _prec:
        f = cost_fn(z)
        E = eq_fn(z)
        g = base_ineq_fn(z)
        grad_f = grad_f_fn(z)
        r_d = grad_f + vjp_eq(z, y) - vjp_ineq(z, lam)
        kkt_err0, _ = _kkt_error_rd(r_d, E, g, s, lam, y, 0.0)
    viol = jnp.maximum(jnp.max(jnp.abs(E)), jnp.max(jnp.maximum(-g, 0.0)))
    converged = (kkt_err0 <= cfg.tol) & (viol <= cfg.constr_viol_tol)
    result = IPResult(
        z=z,
        s=s,
        lam=lam,
        y=y,
        converged=converged,
        iterations=final.it,
        kkt_error=kkt_err0,
        constr_viol=viol,
        cost=f,
        kkt_history=final.kkt_hist,
        mu_history=final.mu_hist,
        alpha_history=final.alpha_hist,
    )
    if return_state:
        # a converged/stalled lane must stay frozen across future segments;
        # a lane at the iteration cap can never progress again — mark it
        # done (failed), else a streaming driver drains it forever
        final = final._replace(
            done=final.done | converged | (final.it >= cfg.max_iter)
        )
        return result, final
    return result


def solve_batch(cost_fn, eq_fn, ineq_fn, z0_batch, config: IPConfig = IPConfig(), theta_axes=None):
    """vmap `solve` over a batch of initial points (and optionally thetas).

    cost/eq/ineq here take (z, theta); z0_batch: (B, n); theta pytree with
    leading batch axis per `theta_axes` (None = shared).
    """

    def one(z0, theta):
        return solve(
            partial(cost_fn, theta=theta),
            partial(eq_fn, theta=theta),
            partial(ineq_fn, theta=theta),
            z0,
            config,
        )

    return jax.vmap(one, in_axes=(0, theta_axes))
