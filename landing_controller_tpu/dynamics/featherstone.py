"""Featherstone rigid-body algorithms over the static quad3D model.

FK, CRBA (mass matrix), and RNEA (inverse dynamics) with the model topology
unrolled at trace time (18 bodies).  These are the *derivation-path* oracles:
the hot solver path uses the closed-form leg kinematics in
:mod:`landing_controller_tpu.dynamics.legs`, which these algorithms verify
(the reference's own oracle strategy, test_scripts/test_jacobianApprox.m).

Reference: spatial_v2/dynamics/{jcalc,HandC}.m,
dynamics-utilities/{get_mass_matrix,get_forward_kin_foot}.m.
"""

from __future__ import annotations

import jax.numpy as jnp

from .rotations import rpy_to_rot_zyx, skew
from .spatial import crf, crm, jcalc, plux_inv


def _xup_all(model, q):
    """Per-body transforms-from-parent Xup_i = Xj(q_i) @ Xtree_i."""
    xups = []
    for i in range(model.nb):
        Xj, _ = jcalc(model.jtype[i], q[i])
        xups.append(Xj @ jnp.asarray(model.xtree[i], dtype=q.dtype))
    return xups


def fk_feet(model, q):
    """World foot positions for all legs; q = [base6; jpos12].

    Exact port of the propagation in get_forward_kin_foot.m:1-26:
    X0_i = Xup_i @ X0_parent, foot position from plux decomposition of
    Xfoot @ X0_{b_foot}.  Returns (4, 3).
    """
    xups = _xup_all(model, q)
    x0 = [None] * model.nb
    for i in range(model.nb):
        p = model.parent[i]
        x0[i] = xups[i] if p < 0 else xups[i] @ x0[p]
    feet = []
    for leg in range(model.nlegs):
        j = int(model.b_foot[leg])
        _, pf = plux_inv(jnp.asarray(model.xfoot[leg], dtype=q.dtype) @ x0[j])
        feet.append(pf)
    return jnp.stack(feet)


def fk_bodies(model, q):
    """World positions and world->body rotations of every body origin.

    Returns (positions (nb,3), rotations (nb,3,3)).  Used by visualization
    and tests.
    """
    xups = _xup_all(model, q)
    x0 = [None] * model.nb
    for i in range(model.nb):
        p = model.parent[i]
        x0[i] = xups[i] if p < 0 else xups[i] @ x0[p]
    Es, ps = [], []
    for i in range(model.nb):
        E, pos = plux_inv(x0[i])
        Es.append(E)
        ps.append(pos)
    return jnp.stack(ps), jnp.stack(Es)


def _floating_base_xup(model, q):
    """Xup for the lumped floating base used by the mass matrix.

    get_mass_matrix.m:6-11 treats bodies 1..5 as zero and body 6 as
    ``[R 0; -R*skew(p) R]`` with R = world->body from the legacy ZYX
    convention (rpyToRotMat(q(4:6))').
    """
    R_w2b = jnp.swapaxes(rpy_to_rot_zyx(q[3:6]), -1, -2)
    top = jnp.concatenate([R_w2b, jnp.zeros_like(R_w2b)], -1)
    bot = jnp.concatenate([-R_w2b @ skew(q[:3]), R_w2b], -1)
    return jnp.concatenate([top, bot], -2)


def mass_matrix(model, q):
    """Floating-base CRBA mass matrix H (nb x nb) and 6x6 composite inertia.

    Exact port of get_mass_matrix.m:1-54 (composite-rigid-body algorithm with
    the first 6 coordinates lumped into the floating base).  Returns (H, Ic)
    where Ic = H[:6,:6] is the whole-robot spatial inertia in the body frame.
    """
    nb = model.nb
    dtype = q.dtype
    xup = [None] * nb
    S = [None] * nb
    xup[5] = _floating_base_xup(model, q)
    for i in range(6, nb):
        Xj, S[i] = jcalc(model.jtype[i], q[i])
        xup[i] = Xj @ jnp.asarray(model.xtree[i], dtype=dtype)

    IC = [jnp.asarray(model.inertia[i], dtype=dtype) for i in range(nb)]
    for i in range(nb - 1, 5, -1):
        p = int(model.parent[i])
        IC[p] = IC[p] + xup[i].T @ IC[i] @ xup[i]

    H = jnp.zeros((nb, nb), dtype=dtype)
    H = H.at[:6, :6].set(IC[5])
    for i in range(6, nb):
        fh = IC[i] @ S[i]
        H = H.at[i, i].set(S[i] @ fh)
        fh = xup[i].T @ fh
        j = int(model.parent[i])
        while j > 5:
            H = H.at[i, j].set(S[j] @ fh)
            H = H.at[j, i].set(S[j] @ fh)
            fh = xup[j].T @ fh
            j = int(model.parent[j])
        H = H.at[:6, i].set(fh)
        H = H.at[i, :6].set(fh)
    return H, H[:6, :6]


def composite_body_inertia(model, q):
    """6x6 whole-robot spatial inertia at configuration q (body frame)."""
    _, ic = mass_matrix(model, jnp.asarray(q, dtype=jnp.float64 if hasattr(jnp, "float64") else jnp.float32))
    return ic


def rnea(model, q, qd, qdd):
    """Recursive Newton-Euler inverse dynamics tau = ID(q, qd, qdd).

    Treats all 18 coordinates as an open chain from the world (the
    floating-base pseudo-joints carry the base motion), with gravity as a
    base acceleration.  Reference: spatial_v2/dynamics/ID.m.
    Returns (nb,) generalized forces.
    """
    nb = model.nb
    dtype = q.dtype
    a_grav = jnp.concatenate(
        [jnp.zeros(3, dtype=dtype), -jnp.asarray(model.gravity, dtype=dtype)]
    )

    v = [None] * nb
    a = [None] * nb
    f = [None] * nb
    xup = [None] * nb
    S = [None] * nb
    for i in range(nb):
        Xj, S[i] = jcalc(model.jtype[i], q[i])
        xup[i] = Xj @ jnp.asarray(model.xtree[i], dtype=dtype)
        vJ = S[i] * qd[i]
        p = int(model.parent[i])
        if p < 0:
            v[i] = vJ
            a[i] = xup[i] @ a_grav + S[i] * qdd[i]
        else:
            v[i] = xup[i] @ v[p] + vJ
            a[i] = xup[i] @ a[p] + S[i] * qdd[i] + crm(v[i]) @ vJ
        Ii = jnp.asarray(model.inertia[i], dtype=dtype)
        f[i] = Ii @ a[i] + crf(v[i]) @ (Ii @ v[i])

    tau = jnp.zeros(nb, dtype=dtype)
    for i in range(nb - 1, -1, -1):
        tau = tau.at[i].set(S[i] @ f[i])
        p = int(model.parent[i])
        if p >= 0:
            f[p] = f[p] + xup[i].T @ f[i]
    return tau
