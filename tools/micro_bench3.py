"""Component-level timing of one structured IP iteration on TPU (dev tool).

Times, vmapped over B scenarios (srbm_lcp N=21, cri backend):
  newton_step      : full assembly + ladder factor + solve + refine
  factor+solve     : cri_factor + cri_solve only (ladder of 2)
  hessians         : per-knot Lagrangian Hessians (jax.hessian vmap)
  ineq JM          : per-knot inequality Jacobian + sigma condensation
  residuals        : eq + ineq + cost + grad + 2 vjps (one KKT evaluation)
  linesearch4      : 4 candidates x (eq + ineq + cost)

Usage: python tools/micro_bench3.py [B]
"""

import sys
import time

import numpy as np


def timeit(fn, *args, n=20, warmup=2):
    import jax

    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    import jax
    import jax.numpy as jnp
    from functools import partial

    from landing_controller_tpu.api import LandingSolver
    from landing_controller_tpu.solver import IPConfig
    from landing_controller_tpu.solver.scaling import scale_problem
    from landing_controller_tpu.solver.structured import make_structured_newton_step
    from landing_controller_tpu.warmstart.reference import initial_guess_from_reference

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    rng = np.random.default_rng(0)
    cfg = IPConfig(
        max_iter=200, hessian_mode="hybrid", mu_min=1e-5, tol=2e-4,
        sigma_max=1e5, refine_steps=1, relax_scale=1.0, delta_c=1e-6,
        kkt_backend="cri", ladder_scales=(0.0, 1.0), n_linesearch=4,
    )
    s = LandingSolver("srbm_lcp", dtype=jnp.float32, structured=True, config=cfg)
    prob = s.problem
    q0s = jnp.asarray(np.column_stack([
        np.zeros((B, 2)), np.full(B, 0.6), rng.uniform(-0.2, 0.2, (B, 3))
    ]).astype(np.float32))
    qd0s = jnp.asarray(np.column_stack([
        rng.uniform(-0.3, 0.3, (B, 5)), -rng.uniform(1, 3, B)
    ]).astype(np.float32))

    n_eq, n_ineq, n_vars = prob.n_eq, prob.n_ineq, prob.n_vars

    def make_ctx(q0, qd0):
        theta = s.build_params(q0, qd0)
        z0 = initial_guess_from_reference(prob, theta).astype(jnp.float32)
        snlp = scale_problem(
            partial(prob.cost, theta=theta), partial(prob.eq, theta=theta),
            partial(prob.ineq, theta=theta), z0,
            z_scale=s._z_scale.astype(jnp.float32),
        )
        return theta, snlp, snlp.to_scaled(z0)

    # representative duals/state
    lam = jnp.asarray(rng.uniform(0.1, 1.0, n_ineq).astype(np.float32))
    y = jnp.asarray(rng.standard_normal(n_eq).astype(np.float32) * 0.1)
    sigma = lam / 0.5
    mu = jnp.asarray(1e-2, jnp.float32)

    theta0, snlp0, _ = make_ctx(q0s[0], qd0s[0])
    step0 = make_structured_newton_step(prob, theta0, cfg, snlp0)

    def full_step(q0, qd0):
        theta, snlp, zs = make_ctx(q0, qd0)
        step = make_structured_newton_step(prob, theta, cfg, snlp)
        r_d = jnp.ones(n_vars, jnp.float32) * 0.01
        r_g = jnp.ones(n_ineq, jnp.float32) * 0.01
        return step(zs, y, lam, sigma, mu, jnp.asarray(False), r_d, r_g,
                    -r_d, -jnp.ones(n_eq, jnp.float32) * 0.01,
                    jnp.asarray(1e-6, jnp.float32))[0]

    t = timeit(jax.jit(jax.vmap(full_step)), q0s, qd0s, n=10)
    print(f"newton_step      B={B}: {t*1e3:8.2f} ms", flush=True)

    def residuals(q0, qd0):
        theta, snlp, zs = make_ctx(q0, qd0)
        E = snlp.eq(zs); g = snlp.ineq(zs); f = snlp.cost(zs)
        gf = jax.grad(snlp.cost)(zs)
        _, vjpe = jax.vjp(snlp.eq, zs)
        _, vjpg = jax.vjp(snlp.ineq, zs)
        return f + jnp.sum(E) + jnp.sum(g) + jnp.sum(gf) + jnp.sum(vjpe(y)[0]) + jnp.sum(vjpg(lam)[0])

    t = timeit(jax.jit(jax.vmap(residuals)), q0s, qd0s)
    print(f"residuals        B={B}: {t*1e3:8.2f} ms", flush=True)

    def linesearch4(q0, qd0):
        theta, snlp, zs = make_ctx(q0, qd0)
        dz = jnp.ones_like(zs) * 1e-3
        alphas = 0.5 ** jnp.arange(4, dtype=jnp.float32)
        def eval_at(a):
            zt = zs + a * dz
            return jnp.sum(jnp.abs(snlp.eq(zt))) + jnp.sum(snlp.ineq(zt)) + snlp.cost(zt)
        return jax.vmap(eval_at)(alphas)

    t = timeit(jax.jit(jax.vmap(linesearch4)), q0s, qd0s)
    print(f"linesearch4      B={B}: {t*1e3:8.2f} ms", flush=True)

    # factor+solve only, via the cri pieces on representative blocks
    from landing_controller_tpu.ops.cr_inverse import cri_factor, cri_solve
    from landing_controller_tpu.ops.pallas_blocks import make_qd_inverse
    from landing_controller_tpu.solver.structured import _layout

    L = _layout(prob)
    nb, bsz, nw, nd = L["nb"], L["bs"], L["nw"], L["nd"]
    Araw = rng.standard_normal((B, 2, nb, bsz, bsz)).astype(np.float32)
    A = np.einsum("blkij,blkmj->blkim", Araw, Araw) / bsz
    A[..., np.arange(nw), np.arange(nw)] += 2.0
    A[..., np.arange(nw, bsz), np.arange(nw, bsz)] -= 4.0
    sign = np.ones(bsz, np.float32); sign[nw:] = -1.0
    A = A * 0  # rebuild as clean QD blocks
    P = rng.standard_normal((B, 2, nb, nw, nw)).astype(np.float32)
    P = np.einsum("blkij,blkmj->blkim", P, P) / nw + 0.5 * np.eye(nw, dtype=np.float32)
    D = rng.standard_normal((B, 2, nb, nd, nd)).astype(np.float32)
    D = np.einsum("blkij,blkmj->blkim", D, D) / nd + 0.5 * np.eye(nd, dtype=np.float32)
    Bm = 0.3 * rng.standard_normal((B, 2, nb, nd, nw)).astype(np.float32)
    A = np.zeros((B, 2, nb, bsz, bsz), np.float32)
    A[..., :nw, :nw] = P
    A[..., nw:, :nw] = Bm
    A[..., :nw, nw:] = np.swapaxes(Bm, -1, -2)
    A[..., nw:, nw:] = -D
    C = 0.1 * rng.standard_normal((B, 2, nb - 1, bsz, bsz)).astype(np.float32)
    rhs = rng.standard_normal((B, nb, bsz)).astype(np.float32)
    A, C, rhs = jnp.asarray(A), jnp.asarray(C), jnp.asarray(rhs)
    qdi = make_qd_inverse(nw, nd)

    def fs(Ab, Cb, r):
        facs = jax.vmap(lambda a, c: cri_factor(a, c, qdi))(Ab, Cb)
        fac0 = jax.tree_util.tree_map(lambda leaf: leaf[0], facs)
        x = cri_solve(fac0, r)
        # one refinement solve (matches refine_steps=1)
        x = x + cri_solve(fac0, r - x)
        return x

    t = timeit(jax.jit(jax.vmap(fs)), A, C, rhs)
    print(f"factor+2solve    B={B} (ladder2): {t*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
