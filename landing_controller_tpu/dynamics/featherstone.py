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


def _body_frame_ext_forces(model, xup, f_ext_world, dtype):
    """Convert world-coordinate spatial forces to per-body local forces.

    ``f_body_i = Xa_i^{-T} f_world_i`` with Xa the accumulated world->body
    motion transform — the semantics of spatial_v2/dynamics/
    apply_external_forces.m:20-31.  f_ext_world: (nb, 6) spatial forces
    ([moment about world origin; linear]) in world (absolute) coordinates.
    """
    nb = model.nb
    xa = [None] * nb
    out = [None] * nb
    for i in range(nb):
        p = int(model.parent[i])
        xa[i] = xup[i] if p < 0 else xup[i] @ xa[p]
        out[i] = jnp.linalg.solve(xa[i].T, jnp.asarray(f_ext_world[i], dtype=dtype))
    return out


def foot_forces_to_spatial(model, q, grf_world):
    """World linear GRFs at the feet -> (nb, 6) world spatial forces.

    grf_world: (4, 3) linear forces applied at the world foot positions.
    A point force f at world point p is the spatial force [p x f; f]
    about the world origin, assigned to the foot's parent body.
    """
    feet = fk_feet(model, q)
    f_ext = jnp.zeros((model.nb, 6), dtype=q.dtype)
    for leg in range(model.nlegs):
        f = jnp.asarray(grf_world[leg], dtype=q.dtype)
        wrench = jnp.concatenate([jnp.cross(feet[leg], f), f])
        f_ext = f_ext.at[int(model.b_foot[leg])].add(wrench)
    return f_ext


def rnea(model, q, qd, qdd, f_ext_world=None):
    """Recursive Newton-Euler inverse dynamics tau = ID(q, qd, qdd).

    Treats all 18 coordinates as an open chain from the world (the
    floating-base pseudo-joints carry the base motion), with gravity as a
    base acceleration.  Reference: spatial_v2/dynamics/ID.m (external
    forces per apply_external_forces.m).  Returns (nb,) generalized forces.
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

    if f_ext_world is not None:
        fx = _body_frame_ext_forces(model, xup, f_ext_world, dtype)
        for i in range(nb):
            f[i] = f[i] - fx[i]

    tau = jnp.zeros(nb, dtype=dtype)
    for i in range(nb - 1, -1, -1):
        tau = tau.at[i].set(S[i] @ f[i])
        p = int(model.parent[i])
        if p >= 0:
            f[p] = f[p] + xup[i].T @ f[i]
    return tau


def crba_open(model, q):
    """CRBA mass matrix over the full 18-coordinate open chain.

    Unlike :func:`mass_matrix` (which lumps the floating base in the
    reference's get_mass_matrix.m convention), this uses the raw
    pseudo-joint coordinates so it pairs with :func:`rnea` for forward
    dynamics.  Reference: spatial_v2/dynamics/HandC.m:40-60.
    """
    nb = model.nb
    dtype = q.dtype
    xup = [None] * nb
    S = [None] * nb
    for i in range(nb):
        Xj, S[i] = jcalc(model.jtype[i], q[i])
        xup[i] = Xj @ jnp.asarray(model.xtree[i], dtype=dtype)
    IC = [jnp.asarray(model.inertia[i], dtype=dtype) for i in range(nb)]
    for i in range(nb - 1, 0, -1):
        p = int(model.parent[i])
        IC[p] = IC[p] + xup[i].T @ IC[i] @ xup[i]
    H = jnp.zeros((nb, nb), dtype=dtype)
    for i in range(nb):
        fh = IC[i] @ S[i]
        H = H.at[i, i].set(S[i] @ fh)
        j = i
        while int(model.parent[j]) >= 0:
            fh = xup[j].T @ fh
            j = int(model.parent[j])
            H = H.at[i, j].set(S[j] @ fh)
            H = H.at[j, i].set(S[j] @ fh)
    return H


def h_and_c(model, q, qd, f_ext_world=None):
    """Joint-space mass matrix H and bias force C (HandC.m analogue).

    ``H qdd + C = tau``; C includes Coriolis, gravity, and (minus) external
    forces.  Open-chain coordinates (pairs with :func:`rnea`).
    """
    H = crba_open(model, q)
    C = rnea(model, q, qd, jnp.zeros_like(q), f_ext_world=f_ext_world)
    return H, C


def fd_crb(model, q, qd, tau, f_ext_world=None):
    """Forward dynamics via CRBA + RNEA: qdd = H^{-1}(tau - C).

    Reference: spatial_v2/dynamics/FDcrb.m.  O(n^3) in the 18 coordinates
    but fully dense — XLA maps the solve onto one small Cholesky, which is
    the right trade at this size.
    """
    H, C = h_and_c(model, q, qd, f_ext_world=f_ext_world)
    return jnp.linalg.solve(H, jnp.asarray(tau, dtype=q.dtype) - C)


def fd_ab(model, q, qd, tau, f_ext_world=None):
    """Articulated-body forward dynamics (FDab.m) — O(n) in body count.

    Pass 1: velocities + velocity-product terms; pass 2: articulated-body
    inertias IA and bias forces pA swept tip-to-root; pass 3: accelerations
    root-to-tip.  Reference: spatial_v2/dynamics/FDab.m:1-60.
    """
    nb = model.nb
    dtype = q.dtype
    tau = jnp.asarray(tau, dtype=dtype)
    a_grav = jnp.concatenate(
        [jnp.zeros(3, dtype=dtype), -jnp.asarray(model.gravity, dtype=dtype)]
    )

    xup = [None] * nb
    S = [None] * nb
    v = [None] * nb
    c = [None] * nb
    IA = [None] * nb
    pA = [None] * nb
    for i in range(nb):
        Xj, S[i] = jcalc(model.jtype[i], q[i])
        xup[i] = Xj @ jnp.asarray(model.xtree[i], dtype=dtype)
        vJ = S[i] * qd[i]
        p = int(model.parent[i])
        if p < 0:
            v[i] = vJ
            c[i] = jnp.zeros(6, dtype=dtype)
        else:
            v[i] = xup[i] @ v[p] + vJ
            c[i] = crm(v[i]) @ vJ
        IA[i] = jnp.asarray(model.inertia[i], dtype=dtype)
        pA[i] = crf(v[i]) @ (IA[i] @ v[i])

    if f_ext_world is not None:
        fx = _body_frame_ext_forces(model, xup, f_ext_world, dtype)
        for i in range(nb):
            pA[i] = pA[i] - fx[i]

    U = [None] * nb
    d = [None] * nb
    u = [None] * nb
    for i in range(nb - 1, -1, -1):
        U[i] = IA[i] @ S[i]
        d[i] = S[i] @ U[i]
        u[i] = tau[i] - S[i] @ pA[i]
        p = int(model.parent[i])
        if p >= 0:
            Ia = IA[i] - jnp.outer(U[i], U[i]) / d[i]
            pa = pA[i] + Ia @ c[i] + U[i] * (u[i] / d[i])
            IA[p] = IA[p] + xup[i].T @ Ia @ xup[i]
            pA[p] = pA[p] + xup[i].T @ pa

    qdd = jnp.zeros(nb, dtype=dtype)
    a = [None] * nb
    for i in range(nb):
        p = int(model.parent[i])
        a_p = a_grav if p < 0 else a[p]
        ai = xup[i] @ a_p + c[i]
        qdd_i = (u[i] - U[i] @ ai) / d[i]
        a[i] = ai + S[i] * qdd_i
        qdd = qdd.at[i].set(qdd_i)
    return qdd


def energy_momentum(model, q, qd):
    """Kinetic/potential energy + world-frame spatial momentum (EnerMo.m).

    Returns a dict: ``ke``, ``pe`` (zero at z=0 plane), ``mass``, ``com``
    (world CoM), ``htot`` (6-vector spatial momentum about the world
    origin, [angular; linear]).  Reference: spatial_v2/dynamics/EnerMo.m.
    """
    nb = model.nb
    dtype = q.dtype
    xup = [None] * nb
    xa = [None] * nb
    v = [None] * nb
    ke = jnp.zeros((), dtype=dtype)
    htot = jnp.zeros(6, dtype=dtype)
    m_tot = jnp.zeros((), dtype=dtype)
    m_com = jnp.zeros(3, dtype=dtype)
    for i in range(nb):
        Xj, S = jcalc(model.jtype[i], q[i])
        xup[i] = Xj @ jnp.asarray(model.xtree[i], dtype=dtype)
        p = int(model.parent[i])
        vJ = S * qd[i]
        if p < 0:
            v[i] = vJ
            xa[i] = xup[i]
        else:
            v[i] = xup[i] @ v[p] + vJ
            xa[i] = xup[i] @ xa[p]
        Ii = jnp.asarray(model.inertia[i], dtype=dtype)
        hi = Ii @ v[i]
        ke = ke + 0.5 * (v[i] @ hi)
        # momentum transforms like force: h_world = Xa^T h_body
        htot = htot + xa[i].T @ hi
        mi = Ii[5, 5]
        E, r = plux_inv(xa[i])
        com_body = jnp.stack([Ii[2, 4], Ii[0, 5], Ii[1, 3]]) / jnp.where(mi > 0, mi, 1.0)
        com_world = r + E.T @ com_body
        m_tot = m_tot + mi
        m_com = m_com + mi * com_world
    com = m_com / m_tot
    g = jnp.asarray(model.gravity, dtype=dtype)
    pe = -m_tot * (g @ com)
    return {"ke": ke, "pe": pe, "mass": m_tot, "com": com, "htot": htot}


def joint_pd_sim(
    model,
    q0,
    qd0,
    jpos_des,
    jvel_des,
    kp,
    kd,
    dt,
    n_steps: int,
    ground_k: float = 5e3,
    ground_d: float = 50.0,
    mu: float = 0.7,
    tau_limit=None,
):
    """Full-model joint-PD simulation with spring-damper ground contact.

    The analogue of dynamics-utilities/dynamicSim.m (joint-PD full-model
    sim): per step, tau = PD on the 12 joints toward (jpos_des, jvel_des),
    clipped to tau_limit; ground reaction at each foot from a penalty
    contact (normal spring-damper, Coulomb-clipped tangential damping);
    forward dynamics via :func:`fd_ab`; semi-implicit Euler integration.
    Runs under ``lax.scan`` so it jits once for any n_steps.

    jpos_des/jvel_des: (n_steps, 12) or (12,) broadcastable joint targets.
    Returns (qs (n_steps+1, 18), qds (n_steps+1, 18), grfs (n_steps, 4, 3)).
    """
    import jax
    from jax import lax

    dtype = q0.dtype
    jpos_des = jnp.broadcast_to(jnp.asarray(jpos_des, dtype=dtype), (n_steps, 12))
    jvel_des = jnp.broadcast_to(jnp.asarray(jvel_des, dtype=dtype), (n_steps, 12))
    kp = jnp.asarray(kp, dtype=dtype)
    kd = jnp.asarray(kd, dtype=dtype)

    foot_vel_fn = jax.jacobian(fk_feet, argnums=1)

    def contact_forces(q, qd):
        feet = fk_feet(model, q)  # (4, 3)
        Jf = foot_vel_fn(model, q)  # (4, 3, 18)
        vf = jnp.einsum("lij,j->li", Jf, qd)
        pen = jnp.maximum(-feet[:, 2], 0.0)
        active = feet[:, 2] < 0.0
        fz = jnp.where(active, ground_k * pen - ground_d * vf[:, 2], 0.0)
        fz = jnp.maximum(fz, 0.0)
        ft = jnp.where(active[:, None], -ground_d * vf[:, :2], 0.0)
        ft_norm = jnp.linalg.norm(ft, axis=-1, keepdims=True)
        scale = jnp.minimum(1.0, mu * fz[:, None] / jnp.maximum(ft_norm, 1e-9))
        grf = jnp.concatenate([ft * scale, fz[:, None]], axis=-1)
        return grf

    def step(carry, inp):
        q, qd = carry
        jp_d, jv_d = inp
        tau_j = kp * (jp_d - q[6:]) + kd * (jv_d - qd[6:])
        if tau_limit is not None:
            lim = jnp.asarray(tau_limit, dtype=dtype)
            tau_j = jnp.clip(tau_j, -lim, lim)
        tau = jnp.concatenate([jnp.zeros(6, dtype=dtype), tau_j])
        grf = contact_forces(q, qd)
        f_ext = foot_forces_to_spatial(model, q, grf)
        qdd = fd_ab(model, q, qd, tau, f_ext_world=f_ext)
        qd_new = qd + dt * qdd
        q_new = q + dt * qd_new
        return (q_new, qd_new), (q_new, qd_new, grf)

    (_, _), (qs, qds, grfs) = lax.scan(step, (q0, qd0), (jpos_des, jvel_des))
    qs = jnp.concatenate([q0[None], qs])
    qds = jnp.concatenate([qd0[None], qds])
    return qs, qds, grfs
