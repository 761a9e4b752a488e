"""Stage-structured Newton step for the landing NLPs.

Replaces the dense KKT assembly/factorization of the interior-point solver
with per-knot blocks and the block-tridiagonal quasi-definite sweep
(ops.block_tridiag).  Exploits the transcription structure (SURVEY.md §7.3
hard-part #3):

- inequality rows of knot k touch only (w_k = [x_k, u_k, jpos_k], c_{k+1});
- dynamics defects touch (x_k, u_k) and x_{k+1} diagonally;
- the Lagrangian Hessian is block-tridiagonal in knot bundles.

Per-iteration linear-algebra cost drops from O(n^3) dense (n ~ 1000) to
O(N * B^3) with B = 60-84 — about two orders of magnitude — and every
piece is a vmap over knots or a lax.scan along the horizon, so the whole
step jits small and vmaps over scenarios.

The step runs in the solver's *scaled* space: stage functions compose the
per-variable scales (z = d * z_tilde) and per-row constraint scales from
the ScaledNLP, exactly matching the scaled cost/eq/ineq closures the outer
loop evaluates.

Usage::

    step = make_structured_newton_step(problem, theta, cfg, snlp)
    res = solve(snlp.cost, snlp.eq, snlp.ineq, z0_scaled, cfg,
                relax_mask=..., newton_step_fn=step)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.block_tridiag import qd_block_tridiag_factor, qd_block_tridiag_solve
from ..ops.cr_inverse import cri_factor, cri_solve
from ..ops.cyclic_reduction import cr_factor, cr_solve
from ..ops.pallas_blocks import make_qd_inverse


def _layout(problem):
    """Static index layout for the flat z vector <-> knot blocks."""
    cfg = problem.config
    n = cfg.n_knots
    nx, nu, nj = 12, 24, cfg.n_joints
    nw = nx + nu + nj
    nh = 12 + (12 if (cfg.kinodynamic or cfg.init_foot_eq) else 0)  # head eq rows
    # scheduled variant: 4 ground-pin + 12 no-slip equality rows per knot
    # (quadruped_SRBM_NLP.m:158-163), linear in (u_k, c_{k+1})
    nsch = 16 if cfg.contact_scheduled else 0
    nd = 12 + nsch + nh  # dynamics + scheduled + (padded) head slots per block
    bs = nw + nd
    nb = n  # blocks: N-1 knots + tail

    idx = np.full((nb, nw), -1, dtype=np.int64)
    off_x, off_j, off_u = 0, 12 * n, 12 * n + nj * (n - 1)
    for k in range(n - 1):
        idx[k, :nx] = off_x + 12 * k + np.arange(12)
        idx[k, nx : nx + nu] = off_u + 24 * k + np.arange(24)
        if nj:
            idx[k, nx + nu :] = off_j + 12 * k + np.arange(12)
    idx[n - 1, :nx] = off_x + 12 * (n - 1) + np.arange(12)
    return dict(
        n=n, nx=nx, nu=nu, nj=nj, nw=nw, nh=nh, nsch=nsch, nd=nd, bs=bs, nb=nb, idx=idx
    )


def make_structured_newton_step(problem, theta, cfg, snlp):
    """Build a newton_step_fn for solver.ip.solve (scaled space).

    `problem`: a LandingProblem (kinodynamic / srbm_lcp / ccc /
    contact_scheduled layouts).  `theta`: the runtime parameter pytree.
    `snlp`: the ScaledNLP whose closures the outer loop uses (provides
    z/row scales).
    """
    L = _layout(problem)
    n, nx, nu, nj, nw, nh, nd, bs, nb = (
        L["n"], L["nx"], L["nu"], L["nj"], L["nw"], L["nh"], L["nd"], L["bs"], L["nb"],
    )
    nsch = L["nsch"]
    idx = jnp.asarray(L["idx"])
    valid = idx >= 0
    idx_safe = jnp.where(valid, idx, 0)
    pcfg = problem.config
    n_vars = problem.n_vars

    mg_term = 24 if pcfg.terminal_box else 0
    mgk = (problem.n_ineq - mg_term) // (n - 1)
    ns_masks_np = (np.arange(n - 1) < (n - 2)).astype(np.float64)

    # scales in block layout
    zs = snlp.z_scale
    dtype = zs.dtype
    zs_b = jnp.where(valid, zs[idx_safe], 1.0)  # (nb, nw)
    gsc = snlp.ineq_scale[: (n - 1) * mgk].reshape(n - 1, mgk)
    gsc_t = snlp.ineq_scale[(n - 1) * mgk :]
    esc_head = snlp.eq_scale[:nh]
    esc_dyn = snlp.eq_scale[nh : nh + 12 * (n - 1)].reshape(n - 1, 12)
    f_scale = snlp.f_scale
    if nsch:
        # scheduled eq rows follow the defects in problem.eq: all ground
        # rows (n-1, 4) then all no-slip rows (n-1, 12)
        off_g = nh + 12 * (n - 1)
        esc_ground = snlp.eq_scale[off_g : off_g + 4 * (n - 1)].reshape(n - 1, 4)
        esc_noslip = snlp.eq_scale[off_g + 4 * (n - 1) :].reshape(n - 1, 12)

    def z_to_blocks(z):
        return jnp.where(valid, z[idx_safe], 0.0)

    def blocks_to_z(wb):
        flat = jnp.zeros(n_vars, dtype=wb.dtype)
        return flat.at[idx_safe.reshape(-1)].add(
            jnp.where(valid, wb, 0.0).reshape(-1)
        )

    # ---- scaled stage functions ------------------------------------------
    def split_v(v):
        w, cn = v[:nw], v[nw:]
        return w[:nx], w[nx : nx + nu], w[nx + nu :], cn

    def stage_ineq_s(v_t, vscale, gscale, ns_mask, dt_k):
        v = v_t * vscale
        x, u, jp, cn = split_v(v)
        if pcfg.contact_scheduled:
            # the per-knot mask slot carries cs_k (4,) for this variant
            raw = problem._knot_ineq_scheduled(x, u, ns_mask, theta)
        elif pcfg.kinodynamic:
            raw = problem._knot_ineq_kino(x, u, jp, cn, ns_mask, theta)
        else:
            raw = problem._knot_ineq_srbm(x, u, cn, ns_mask, theta, dt_k)
        return gscale * raw

    def stage_defect_s(w_t, wscale, escale, dt_k):
        """Scaled defect minus its x_{k+1} term (handled diagonally)."""
        w = w_t * wscale
        x, u = w[:nx], w[nx : nx + nu]
        xdot = problem._xdot(x, u, theta)
        return escale * (-x - xdot * dt_k)

    def stage_cost_s(w_t, wscale, x_ref_k, u_ref_k, dt_k):
        if not pcfg.running_cost:
            return jnp.zeros((), dtype=w_t.dtype)
        w = w_t * wscale
        x, u = w[:nx], w[nx : nx + nu]
        p_hip = jnp.asarray(pcfg.p_hip_cost, w.dtype).reshape(12)
        x_err = x - x_ref_k
        pf_err = jnp.tile(x[0:3], 4) + p_hip - u[:12]
        f_err = u[12:] - u_ref_k[12:]
        return f_scale * (
            jnp.sum(theta.qx * x_err * x_err)
            + jnp.sum(jnp.tile(theta.qc, 4) * pf_err * pf_err)
            + jnp.sum(jnp.tile(theta.qf, 4) * f_err * f_err)
        ) * dt_k

    def head_eq_s(w0_t):
        w0 = w0_t * zs_b[0]
        x0 = w0[:nx]
        rows = [x0 - jnp.concatenate([theta.q_init, theta.qd_init])]
        if pcfg.kinodynamic or pcfg.init_foot_eq:
            rows.append(w0[nx : nx + 12] - theta.c_init)
        return esc_head * jnp.concatenate(rows)

    def term_cost_s(xl_t):
        xl = xl_t * zs_b[n - 1, :nx]
        err = xl - theta.x_ref[-1]
        return f_scale * jnp.sum(theta.qn * err * err)

    def term_ineq_s(xl_t):
        xl = xl_t * zs_b[n - 1, :nx]
        return gsc_t * problem._terminal_ineq(xl, theta)

    # per-knot scale bundles for v = [w_k, c_{k+1}]
    cnext_scale = jnp.concatenate([zs_b[1 : n - 1, nx : nx + 12], zs_b[n - 1 : n, nx : nx + 12]])
    v_scale = jnp.concatenate([zs_b[: n - 1], cnext_scale], axis=1)  # (n-1, nw+12)
    ns_masks = jnp.asarray(ns_masks_np, dtype)
    # scheduled variant: the per-knot mask argument is cs_k instead
    knot_m = theta.cs if pcfg.contact_scheduled else ns_masks

    eye_nd = jnp.eye(nd, dtype=dtype)

    if nsch:
        # ---- scheduled equality Jacobian coefficients (constant: the rows
        # are linear in z with per-(leg, coord) diagonal structure, so the
        # scaled Jacobians are precomputed coefficient arrays, no autodiff).
        # ground: esc * cs_k,leg * c_z[leg];  no-slip: esc * w_k,leg,d *
        # (c_{k+1} - c_k)[leg, d]  (problems/landing.py eq(), scheduled arm)
        cs = theta.cs.astype(dtype)  # (n-1, 4)
        cs_next = jnp.concatenate([cs[1:], cs[-1:]])
        ns_m3 = jnp.asarray(ns_masks_np, dtype)[:, None, None]
        w_ns = jnp.stack([cs, cs, cs * (1.0 - cs_next)], axis=-1) * ns_m3  # (n-1,4,3)
        zs_c = zs_b[:, nx : nx + 12].reshape(nb, 4, 3)  # c-column scales per block
        cz_scale = zs_c[: n - 1, :, 2]  # (n-1, 4)
        Jg_coef = esc_ground * cs * cz_scale  # dG/d(scaled cz col)
        esc_ns3 = esc_noslip.reshape(n - 1, 4, 3)
        Jns_own = (-esc_ns3 * w_ns * zs_c[: n - 1]).reshape(n - 1, 12)
        Jns_next = (esc_ns3 * w_ns * zs_c[1:]).reshape(n - 1, 12)
        # dense per-knot row blocks over w_k (for A assembly)
        legs4 = np.arange(4)
        Jg_w = jnp.zeros((n - 1, 4, nw), dtype).at[
            :, legs4, nx + 2 + 3 * legs4
        ].set(Jg_coef)
        r12 = np.arange(12)
        Jns_w = jnp.zeros((n - 1, 12, nw), dtype).at[:, r12, nx + r12].set(Jns_own)
        off_gd = nh + 12 * (n - 1)  # ground rows offset in the flat eq vector

    def newton_step(z, y, lam, sigma, mu, use_exact, r_d, r_g, rhs_z, rhs_y, delta_last):
        dtp = z.dtype
        wb = z_to_blocks(z)
        c_next = jnp.concatenate(
            [wb[1 : n - 1, nx : nx + 12], wb[n - 1 : n, nx : nx + 12]]
        )
        vk = jnp.concatenate([wb[: n - 1], c_next], axis=1)  # (n-1, nw+12)
        sig_k = sigma[: (n - 1) * mgk].reshape(n - 1, mgk)
        lam_k = lam[: (n - 1) * mgk].reshape(n - 1, mgk)
        y_dyn = y[nh : nh + 12 * (n - 1)].reshape(n - 1, 12)

        # inequality Jacobians + sigma-weighted blocks
        def knot_JM(v, vs, gs, m, sg, dt_k):
            J = jax.jacfwd(lambda vv: stage_ineq_s(vv, vs, gs, m, dt_k))(v)
            return J.T @ (sg[:, None] * J)

        M = jax.vmap(knot_JM)(vk, v_scale, gsc, knot_m, sig_k, theta.dt)

        # Lagrangian stage Hessians.  The exact Hessian (forward-over-
        # reverse through the full stage Lagrangian) is the expensive part
        # of the assembly; branch at TRACE time on hessian_mode so "gn"
        # never pays for it.  "hybrid" exploits linearity of the Hessian in
        # the multipliers: scaling (y, lam) by the use_exact flag yields
        # the GN Hessian (uf=0) or the exact one (uf=1) from a SINGLE
        # forward-over-reverse sweep — the old jnp.where(exact, gn) form
        # built both every iteration (VERDICT r3 weak #4).
        uf = use_exact.astype(dtp) if cfg.hessian_mode == "hybrid" else None

        def knot_hess(v, vs, gs, m, lm, yk, esc, x_ref_k, u_ref_k, dt_k):
            def lag_exact(vv):
                return (
                    stage_cost_s(vv[:nw], vs[:nw], x_ref_k, u_ref_k, dt_k)
                    + yk @ stage_defect_s(vv[:nw], vs[:nw], esc, dt_k)
                    - lm @ stage_ineq_s(vv, vs, gs, m, dt_k)
                )

            def lag_gn(vv):
                return stage_cost_s(vv[:nw], vs[:nw], x_ref_k, u_ref_k, dt_k)

            if cfg.hessian_mode == "gn":
                if pcfg.running_cost:
                    return jax.hessian(lag_gn)(v)
                return jnp.zeros((v.shape[0], v.shape[0]), v.dtype)
            if cfg.hessian_mode == "exact":
                return jax.hessian(lag_exact)(v)
            return jax.hessian(lag_exact)(v)  # called with uf-scaled (lm, yk)

        lam_h = uf * lam_k if uf is not None else lam_k
        y_h = uf * y_dyn if uf is not None else y_dyn

        Hk = jax.vmap(knot_hess)(
            vk, v_scale, gsc, knot_m, lam_h, y_h, esc_dyn,
            theta.x_ref[:-1], theta.u_ref, theta.dt,
        )
        HM = Hk + M

        # defect Jacobians wrt w (scaled)
        Dk = jax.vmap(
            lambda w, vs, esc, dt_k: jax.jacfwd(
                lambda ww: stage_defect_s(ww, vs, esc, dt_k)
            )(w)
        )(wb[: n - 1], zs_b[: n - 1], esc_dyn, theta.dt)

        Jh = jax.jacfwd(head_eq_s)(wb[0])  # (nh, nw)

        xl_t = wb[n - 1, :nx]
        Ht = jax.hessian(term_cost_s)(xl_t)
        if mg_term:
            Jt = jax.jacfwd(term_ineq_s)(xl_t)
            sig_t = sigma[(n - 1) * mgk :]
            Ht = Ht + Jt.T @ (sig_t[:, None] * Jt)

        # x_{k+1} coefficient of the scaled defect rows: diag(esc * zscale)
        xnext_coef = esc_dyn * zs_b[1:, :nx]  # (n-1, 12)

        # ---- assemble block-tridiagonal A, C -----------------------------
        A = jnp.zeros((nb, bs, bs), dtp)
        C = jnp.zeros((nb - 1, bs, bs), dtp)
        A = A.at[: n - 1, :nw, :nw].add(HM[:, :nw, :nw])
        A = A.at[1:n, nx : nx + 12, nx : nx + 12].add(HM[:, nw:, nw:])
        C = C.at[: n - 1, nx : nx + 12, :nw].add(HM[:, nw:, :nw])
        A = A.at[: n - 1, :nw, nw : nw + 12].add(jnp.swapaxes(Dk, 1, 2))
        A = A.at[: n - 1, nw : nw + 12, :nw].add(Dk)
        diag_coef = jax.vmap(jnp.diag)(xnext_coef)  # (n-1, 12, 12)
        C = C.at[: n - 1, :12, nw : nw + 12].add(diag_coef)
        if nsch:
            # scheduled ground/no-slip multiplier slots (block k) and the
            # no-slip c_{k+1} coupling (diagonal into block k+1's c columns)
            A = A.at[: n - 1, :nw, nw + 12 : nw + 16].add(jnp.swapaxes(Jg_w, 1, 2))
            A = A.at[: n - 1, nw + 12 : nw + 16, :nw].add(Jg_w)
            A = A.at[: n - 1, :nw, nw + 16 : nw + 28].add(jnp.swapaxes(Jns_w, 1, 2))
            A = A.at[: n - 1, nw + 16 : nw + 28, :nw].add(Jns_w)
            C = C.at[: n - 1, nx + r12, nw + 16 + r12].add(Jns_next)
        A = A.at[0, :nw, nw + 12 + nsch : nw + 12 + nsch + nh].add(Jh.T)
        A = A.at[0, nw + 12 + nsch : nw + 12 + nsch + nh, :nw].add(Jh)
        A = A.at[n - 1, :nx, :nx].add(Ht)
        if nw > nx:
            A = A.at[n - 1, nx:nw, nx:nw].add(jnp.eye(nw - nx, dtype=dtp))
        delta_c = jnp.maximum(jnp.asarray(cfg.delta_c, dtp), 1e-6 * delta_last)
        A = A.at[:, nw:, nw:].add(-delta_c * eye_nd[None])

        # ---- regularization ladder + Jacobi equilibration ----------------
        dw = jnp.diagonal(A[:, :nw, :nw], axis1=1, axis2=2)
        base = 1e-2 * jnp.mean(jnp.where(valid, dw, 0.0)) + jnp.asarray(1e-12, dtp)
        shift = jnp.abs(dw) + base
        scale_w = 1.0 / jnp.sqrt(shift)
        # multiplier-row equilibration: normalize each equality row by its
        # Jacobian norm (incl. the x_{k+1} coupling living in C) so the f32
        # Schur sweep doesn't span 1e-8 (delta_c) .. 1e4 (row scale^2)
        dyn_norm2 = jnp.sum(Dk * Dk, axis=2)  # (n-1, 12) over w cols
        dyn_norm2 = dyn_norm2 + xnext_coef * xnext_coef
        nu_scale = jnp.ones((nb, nd), dtp)
        nu_scale = nu_scale.at[: n - 1, :12].set(
            1.0 / jnp.sqrt(dyn_norm2 + 1e-6)
        )
        if nsch:
            # scheduled rows have 1 (ground) / 2 (no-slip) diagonal nonzeros
            g_norm2 = Jg_coef * Jg_coef
            ns_norm2 = Jns_own * Jns_own + Jns_next * Jns_next
            nu_scale = nu_scale.at[: n - 1, 12:16].set(1.0 / jnp.sqrt(g_norm2 + 1e-6))
            nu_scale = nu_scale.at[: n - 1, 16:28].set(1.0 / jnp.sqrt(ns_norm2 + 1e-6))
        head_norm2 = jnp.sum(Jh * Jh, axis=1)
        nu_scale = nu_scale.at[0, 12 + nsch : 12 + nsch + nh].set(
            1.0 / jnp.sqrt(head_norm2 + 1e-6)
        )
        d_block = jnp.concatenate([scale_w, nu_scale], axis=1)

        ar = jnp.arange(nw)

        def scaled_system(delta):
            As = A.at[:, ar, ar].add(delta * shift)
            As = As * d_block[:, :, None] * d_block[:, None, :]
            Cs = C * d_block[1:, :, None] * d_block[:-1, None, :]
            return As, Cs

        if cfg.kkt_backend == "cr":
            factor_fn = lambda Amat, Cmat: cr_factor(Amat, Cmat, nw, nd)
            solve_fn = lambda fc, rhs: cr_solve(fc, rhs, nw, nd)
        elif cfg.kkt_backend.startswith("cri"):
            # inverse-based cyclic reduction: block inverses via the Pallas
            # lane-batched kernel on TPU (jnp reference elsewhere); all sweep
            # ops are batched matmuls.  "cri" auto-dispatches;
            # "cri_pallas"/"cri_ref"/"cri_pallas_interpret" force a path.
            force = cfg.kkt_backend[4:] or None
            qdi = make_qd_inverse(nw, nd, force=force)
            factor_fn = lambda Amat, Cmat: cri_factor(Amat, Cmat, qdi)
            solve_fn = lambda fc, rhs: cri_solve(fc, rhs)
        else:
            factor_fn = lambda Amat, Cmat: qd_block_tridiag_factor(Amat, Cmat, nw, nd)
            solve_fn = lambda fc, rhs: qd_block_tridiag_solve(fc, rhs, nw, nd)

        deltas = jnp.stack(
            [
                jnp.asarray(cfg.delta_w, dtp) if s == 0.0 else s * delta_last
                for s in cfg.ladder_scales
            ]
        )
        facs = jax.vmap(lambda d: factor_fn(*scaled_system(d)))(deltas)
        oks = facs.ok
        pick = jnp.where(jnp.any(oks), jnp.argmax(oks), deltas.shape[0] - 1)
        fac = jax.tree_util.tree_map(lambda leaf: leaf[pick], facs)
        delta_used = deltas[pick]
        As_u, Cs_u = scaled_system(delta_used)

        def K_mul(xb):
            out = jnp.einsum("kij,kj->ki", As_u, xb)
            out = out.at[1:].add(jnp.einsum("kij,kj->ki", Cs_u, xb[:-1]))
            out = out.at[:-1].add(jnp.einsum("kji,kj->ki", Cs_u, xb[1:]))
            return out

        # ---- rhs in block layout; resolve() reuses the factorization for
        # second-order corrector re-solves (solver.ip corrector)
        def resolve(rhs_z_v, rhs_y_v):
            rz_blocks = z_to_blocks(rhs_z_v)
            b = jnp.zeros((nb, bs), dtp)
            b = b.at[:, :nw].set(rz_blocks)
            b = b.at[: n - 1, nw : nw + 12].set(
                rhs_y_v[nh : nh + 12 * (n - 1)].reshape(n - 1, 12)
            )
            if nsch:
                b = b.at[: n - 1, nw + 12 : nw + 16].set(
                    rhs_y_v[off_gd : off_gd + 4 * (n - 1)].reshape(n - 1, 4)
                )
                b = b.at[: n - 1, nw + 16 : nw + 28].set(
                    rhs_y_v[off_gd + 4 * (n - 1) :].reshape(n - 1, 12)
                )
            b = b.at[0, nw + 12 + nsch : nw + 12 + nsch + nh].set(rhs_y_v[:nh])
            b_s = b * d_block

            x_s = solve_fn(fac, b_s)
            for _ in range(cfg.refine_steps):
                # blockwise iterative refinement (f32: the block Schur
                # sweeps accumulate rounding error along the horizon)
                r = b_s - K_mul(x_s)
                x_s = x_s + solve_fn(fac, r)
            x = x_s * d_block

            dz = blocks_to_z(x[:, :nw])
            dy_parts = [
                x[0, nw + 12 + nsch : nw + 12 + nsch + nh],
                x[: n - 1, nw : nw + 12].reshape(-1),
            ]
            if nsch:
                dy_parts.append(x[: n - 1, nw + 12 : nw + 16].reshape(-1))
                dy_parts.append(x[: n - 1, nw + 16 : nw + 28].reshape(-1))
            return dz, jnp.concatenate(dy_parts)

        dz, dy = resolve(rhs_z, rhs_y)
        return dz, dy, delta_used, resolve

    return newton_step
