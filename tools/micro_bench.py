"""Microbenchmarks of the IP-solver building blocks on TPU (dev tool).

Times, for the srbm_lcp N=21 problem at batch B:
  - one full newton_step (structured, scan vs cr backends),
  - batched tiny Cholesky / cho_solve / triangular ops,
  - one line-search candidate sweep (12x eq+ineq evals),
  - one full IP iteration (by diffing max_iter=K vs 2K wall time).

Usage: python micro_bench.py [B]
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

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    rng = np.random.default_rng(0)

    # ---- batched tiny linear algebra --------------------------------------
    m = B * 4  # scenarios x ladder
    for nn in (24, 36, 60):
        A = rng.standard_normal((m, nn, nn)).astype(np.float32)
        A = A @ A.transpose(0, 2, 1) + 4 * nn * np.eye(nn, dtype=np.float32)
        A = jnp.asarray(A)
        b = jnp.asarray(rng.standard_normal((m, nn)).astype(np.float32))
        Bm = jnp.asarray(rng.standard_normal((m, nn, nn)).astype(np.float32))

        chol = jax.jit(jax.vmap(jnp.linalg.cholesky))
        t_chol = timeit(chol, A)
        L = chol(A)
        cs_vec = jax.jit(jax.vmap(lambda l, x: jax.scipy.linalg.cho_solve((l, True), x)))
        t_cs = timeit(cs_vec, L, b)
        cs_mat = jax.jit(jax.vmap(lambda l, x: jax.scipy.linalg.cho_solve((l, True), x)))
        t_csm = timeit(cs_mat, L, Bm)
        mm = jax.jit(lambda x, y: jnp.einsum("kij,kjl->kil", x, y))
        t_mm = timeit(mm, Bm, Bm)
        inv = jax.jit(jax.vmap(jnp.linalg.inv))
        t_inv = timeit(inv, A)
        print(
            f"n={nn:3d} m={m}: chol={t_chol*1e3:.3f}ms cho_solve(vec)={t_cs*1e3:.3f}ms "
            f"cho_solve(mat)={t_csm*1e3:.3f}ms matmul={t_mm*1e3:.3f}ms inv={t_inv*1e3:.3f}ms"
        )

    # ---- structured newton step + line-search pieces ----------------------
    from landing_controller_tpu.api import LandingSolver
    from landing_controller_tpu.solver import IPConfig

    for backend in ("scan", "cr"):
        cfg = IPConfig(
            max_iter=8, hessian_mode="hybrid", mu_min=1e-5, tol=2e-4,
            sigma_max=1e5, refine_steps=3, relax_scale=1.0, delta_c=1e-6,
            kkt_backend=backend,
        )
        solver = LandingSolver("srbm_lcp", dtype=jnp.float32, structured=True, config=cfg)
        q0s = jnp.asarray(np.column_stack([
            np.zeros((B, 2)), np.full(B, 0.6), rng.uniform(-0.2, 0.2, (B, 3))
        ]).astype(np.float32))
        qd0s = jnp.asarray(np.column_stack([
            rng.uniform(-0.3, 0.3, (B, 5)), -rng.uniform(1, 3, B)
        ]).astype(np.float32))

        t8 = timeit(lambda: solver.solve_batch(q0s, qd0s).z, n=5)
        cfg16 = IPConfig(**{**cfg.__dict__, "max_iter": 16})
        solver16 = LandingSolver("srbm_lcp", dtype=jnp.float32, structured=True, config=cfg16)
        t16 = timeit(lambda: solver16.solve_batch(q0s, qd0s).z, n=5)
        print(
            f"backend={backend} B={B}: 8it={t8*1e3:.1f}ms 16it={t16*1e3:.1f}ms "
            f"-> per-iter={(t16-t8)/8*1e3:.2f}ms"
        )


if __name__ == "__main__":
    main()
