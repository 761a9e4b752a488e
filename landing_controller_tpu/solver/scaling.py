"""Problem scaling for the interior-point solver.

The landing NLPs mix variables of wildly different magnitudes (foot/CoM
positions ~0.1 m, GRFs ~100 N) and constraints from 1e-3-relaxed
complementarity to 100 N force bounds.  IPOPT copes via gradient-based NLP
scaling (the reference tunes ``nlp_scaling_max_gradient=50``,
quadruped_SRBM_NLP.m:263); we reproduce that here as a pure functional
wrapper:

- static per-variable scales d (z = d * z_tilde), chosen by the problem
  (physical units), and
- gradient-based row scales for f, E, g computed once at z0:
  ``s_row = min(1, g_max / ||row grad||_inf)`` in scaled variables.

The solver then sees a well-scaled problem; results are mapped back.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class ScaledNLP(NamedTuple):
    cost: callable
    eq: callable
    ineq: callable
    z_scale: jnp.ndarray  # d: z = d * z_tilde
    f_scale: jnp.ndarray
    eq_scale: jnp.ndarray
    ineq_scale: jnp.ndarray

    def to_scaled(self, z):
        return z / self.z_scale

    def from_scaled(self, z_tilde):
        return z_tilde * self.z_scale

    # multipliers transform with the row/objective scales: stationarity of
    # L_s = s_f f + y_s'(S_e E) - lam_s'(S_g g - s) matches the unscaled
    # problem when lam = lam_s * S_g / s_f, y = y_s * S_e / s_f; slacks are
    # s = s_s / S_g.  These let warm starts survive re-scaling between solves
    # (row scales are recomputed at each solve's z0).
    def duals_from_scaled(self, lam_s, y_s):
        return lam_s * self.ineq_scale / self.f_scale, y_s * self.eq_scale / self.f_scale

    def duals_to_scaled(self, lam, y):
        return lam * self.f_scale / self.ineq_scale, y * self.f_scale / self.eq_scale

    def slacks_from_scaled(self, s_s):
        return s_s / self.ineq_scale

    def slacks_to_scaled(self, s):
        return s * self.ineq_scale


def scale_problem(cost_fn, eq_fn, ineq_fn, z0, z_scale=None, g_max: float = 50.0) -> ScaledNLP:
    """Build a scaled NLP triple (IPOPT 'gradient-based' scaling analogue).

    cost/eq/ineq: functions of z (theta already closed over).  z0: reference
    point for gradient scaling (the initial guess).  z_scale: optional static
    per-variable scale d; defaults to ones.
    """
    dtype = z0.dtype
    n = z0.shape[0]
    d = jnp.ones(n, dtype=dtype) if z_scale is None else jnp.asarray(z_scale, dtype)

    # row-wise gradient norms in scaled variables: |J diag(d)|_inf per row.
    # Computed by CHUNKED vjp rows instead of materializing the dense
    # Jacobians — jacfwd here cost ~27 MB f32 per vmapped scenario lane on
    # the CCC problem (mi ~4.6k x n ~1.5k) and capped batch size/compile
    # memory; chunked rows keep live memory at chunk x n.
    def row_inf_norms(fn, m, chunk=128):
        _, vjp = jax.vjp(fn, z0)
        n_chunks = -(-m // chunk)
        row_ids = jnp.arange(m)

        def one_chunk(c):
            idx = c * chunk + jnp.arange(chunk)
            E = (idx[:, None] == row_ids[None, :]).astype(dtype)
            rows = jax.vmap(lambda e: vjp(e)[0])(E)  # (chunk, n)
            return jnp.max(jnp.abs(rows * d[None, :]), axis=1)

        norms = jax.lax.map(one_chunk, jnp.arange(n_chunks))
        return norms.reshape(-1)[:m]

    gf = jax.grad(cost_fn)(z0) * d
    me = eq_fn(z0).shape[0]
    mi = ineq_fn(z0).shape[0]
    je_norms = row_inf_norms(eq_fn, me)
    jg_norms = row_inf_norms(ineq_fn, mi)

    f_scale = jnp.minimum(1.0, g_max / jnp.maximum(jnp.max(jnp.abs(gf)), 1e-8))
    eq_scale = jnp.minimum(1.0, g_max / jnp.maximum(je_norms, 1e-8))
    ineq_scale = jnp.minimum(1.0, g_max / jnp.maximum(jg_norms, 1e-8))

    def cost_s(zt):
        return cost_fn(zt * d) * f_scale

    def eq_s(zt):
        return eq_fn(zt * d) * eq_scale

    def ineq_s(zt):
        return ineq_fn(zt * d) * ineq_scale

    return ScaledNLP(
        cost=cost_s,
        eq=eq_s,
        ineq=ineq_s,
        z_scale=d,
        f_scale=f_scale,
        eq_scale=eq_scale,
        ineq_scale=ineq_scale,
    )


def landing_z_scale(problem) -> jnp.ndarray:
    """Static per-variable scales for the landing NLP decision layout.

    X rows: positions/orientation O(1), rates O(5); jpos O(1); U: foot
    positions O(1), GRFs O(f_max/4 ~ 50 N).
    """
    import numpy as np

    n = problem.config.n_knots
    x_row = np.array([1, 1, 1, 1, 1, 1, 5, 5, 5, 5, 5, 5], dtype=np.float64)
    parts = [np.tile(x_row, n)]
    if problem.config.kinodynamic:
        parts.append(np.ones(12 * (n - 1)))
    u_row = np.concatenate([np.ones(12), 50.0 * np.ones(12)])
    parts.append(np.tile(u_row, n - 1))
    return jnp.asarray(np.concatenate(parts))
