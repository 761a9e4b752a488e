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


# ----------------------------------------------------------------------
# rotor (actuator) reflection — dynamics_one_step.m / add_rotors.m
# ----------------------------------------------------------------------

class RotorModel:
    """Geared-rotor set for reflected actuator dynamics.

    Mirrors the reference's rotor_model struct (get_rotor_model.m): rotor k
    is rigidly attached to body ``mu[k]`` (the geared joint's parent) at
    transform ``x_mu[k]`` and spins at ``gr[k]`` times joint ``gamma[k]``'s
    rate about that joint's axis.  ``inertia[k]`` is the 6x6 spatial
    inertia of the rotor (mass + rotational).
    """

    def __init__(self, gamma, gr, inertia, x_mu):
        import numpy as _np

        self.nr = len(gamma)
        self.gamma = _np.asarray(gamma, _np.int64)
        self.gr = _np.asarray(gr, _np.float64)
        self.inertia = _np.asarray(inertia, _np.float64)  # (nr, 6, 6)
        self.x_mu = _np.asarray(x_mu, _np.float64)  # (nr, 6, 6)


def quad3d_rotor_model(model, robot_params, rotor_inertia_axial, rotor_mass=0.0):
    """One rotor per actuated joint of the quad3D tree (12 rotors).

    The reference builds rotor models only for its planar robots
    (get_rotor_model.m uses the 7-body 'c3' topology); this is the same
    construction applied to the 18-body quad3D tree: each actuated joint's
    rotor sits at the joint origin on the parent body (X_mu = 1), spins
    about the joint axis with the joint's gear ratio
    (get_robot_params.m mc3D gear ratios 6/6/9.33), and carries an axial
    rotational inertia of ``rotor_inertia_axial`` (the reference publishes
    rotor inertia only for 'c3'; pass the actuator's datasheet value).
    """
    from .spatial import spatial_inertia as _spatial_inertia
    import numpy as _np

    gears = [
        robot_params.abad_gear_ratio,
        robot_params.hip_gear_ratio,
        robot_params.knee_gear_ratio,
    ]
    # actuated joints are bodies 6..17 (4 legs x abad/hip/knee)
    gamma, gr, inertias, x_mu = [], [], [], []
    for leg in range(4):
        for j in range(3):
            i = 6 + 3 * leg + j
            gamma.append(i)
            gr.append(gears[j])
            # axial inertia about the joint axis: jcalc's S picks the axis,
            # so a diagonal rotational inertia with the axial value on all
            # axes reflected ONLY through S' I S stays exact for the
            # diagonal term; use the axial value on the spin axis and zero
            # elsewhere via the joint's S at q=0
            I3 = _np.eye(3) * rotor_inertia_axial
            inertias.append(
                _np.asarray(_spatial_inertia(rotor_mass, _np.zeros(3), I3))
            )
            x_mu.append(_np.eye(6))
    return RotorModel(gamma, gr, inertias, x_mu)


def h_and_c_rotors(model, rotors: RotorModel, q, qd):
    """Mass matrix H and bias C with geared-rotor reflection.

    Port of the reference's rotor-augmented CRBA/RNEA
    (dynamics_one_step.m:14-100): per rotor k geared to joint i = gamma[k]
    on parent p,

    - ``H[i,i] += gr^2 S_i' I_r S_i`` (reflected inertia),
    - off-diagonal ``H[i,j] += S_j' (prop. gr I_r S_i)`` for ancestors j
      (the rotor reaction torque path),
    - ``C[i]  += gr S_i' f_k`` with f_k the rotor's velocity-product +
      gravity spatial force, and f_k also pushed onto the parent body,
    - the rotor inertia joins the parent's composite inertia.

    All loops unroll at trace time (fixed topology) like the rest of this
    module; jit/vmap/grad-safe.
    """
    nb = model.nb
    dtype = q.dtype
    a_grav = jnp.concatenate(
        [jnp.zeros(3, dtype=dtype), -jnp.asarray(model.gravity, dtype=dtype)]
    )

    # forward pass (velocities + zero-qdd accelerations, as rnea(qdd=0))
    v = [None] * nb
    avp = [None] * nb
    fvp = [None] * nb
    xup = [None] * nb
    S = [None] * nb
    for i in range(nb):
        Xj, S[i] = jcalc(model.jtype[i], q[i])
        xup[i] = Xj @ jnp.asarray(model.xtree[i], dtype=dtype)
        vJ = S[i] * qd[i]
        p = int(model.parent[i])
        if p < 0:
            v[i] = vJ
            avp[i] = xup[i] @ a_grav
        else:
            v[i] = xup[i] @ v[p] + vJ
            avp[i] = xup[i] @ avp[p] + crm(v[i]) @ vJ
        Ii = jnp.asarray(model.inertia[i], dtype=dtype)
        fvp[i] = Ii @ avp[i] + crf(v[i]) @ (Ii @ v[i])

    IC = [jnp.asarray(model.inertia[i], dtype=dtype) for i in range(nb)]
    H = jnp.zeros((nb, nb), dtype=dtype)
    C = jnp.zeros(nb, dtype=dtype)
    b_rot = [jnp.zeros(6, dtype=dtype) for _ in range(nb)]

    # rotor pass (dynamics_one_step.m LOOP 2)
    for k in range(rotors.nr):
        i = int(rotors.gamma[k])
        p = int(model.parent[i])
        grk = jnp.asarray(float(rotors.gr[k]), dtype)
        Irk = jnp.asarray(rotors.inertia[k], dtype)
        Xj, _ = jcalc(model.jtype[i], q[i])
        xup_r = Xj @ jnp.asarray(rotors.x_mu[k], dtype)
        # Deliberate deviation from dynamics_one_step.m: its LOOP 4
        # overwrites H(i,i) = S'*Ic*S, silently DROPPING this LOOP-2 gr^2
        # reflected-inertia term; add_rotors.m's dH section confirms += is
        # the physical intent, so we keep it (cross-validating against the
        # reference's numeric H will show diagonal mismatches on actuated
        # joints — the reference's bug, not ours; tests/test_rotors.py
        # checks the += semantics against an independent oracle).
        H = H.at[i, i].add(grk * grk * S[i] @ (Irk @ S[i]))
        b_rot[i] = b_rot[i] + grk * (Irk @ S[i])
        vJ = grk * S[i] * qd[i]
        if p < 0:
            fk = jnp.zeros(6, dtype=dtype)
        else:
            vk = xup_r @ v[p]
            ak = xup_r @ avp[p] + crm(vk) @ vJ
            fk = Irk @ ak + crf(vk) @ (Irk @ vJ)
            fvp[p] = fvp[p] + xup_r.T @ fk
            IC[p] = IC[p] + xup_r.T @ Irk @ xup_r
        C = C.at[i].add(grk * S[i] @ fk)

    # backward pass: bias torques + composite inertias (LOOP 3)
    for i in range(nb - 1, -1, -1):
        C = C.at[i].add(S[i] @ fvp[i])
        p = int(model.parent[i])
        if p >= 0:
            fvp[p] = fvp[p] + xup[i].T @ fvp[i]
            IC[p] = IC[p] + xup[i].T @ IC[i] @ xup[i]

    # CRBA with the rotor off-diagonal reaction path (LOOP 4)
    for i in range(nb):
        fh = IC[i] @ S[i]
        H = H.at[i, i].add(S[i] @ fh)
        br = b_rot[i]
        j = i
        while int(model.parent[j]) >= 0:
            fh = xup[j].T @ fh
            br = xup[j].T @ br
            j = int(model.parent[j])
            hij = S[j] @ (fh + br)
            H = H.at[i, j].add(hij)
            H = H.at[j, i].add(hij)
    return H, C


# ----------------------------------------------------------------------
# hybrid dynamics + floating-base helpers — spatial_v2 HD.m / IDfb.m /
# fbkin.m analogues
# ----------------------------------------------------------------------

def hybrid_dynamics(model, fd, q, qd, qdd, tau, f_ext_world=None):
    """Articulated-body HYBRID dynamics (spatial_v2/dynamics/HD.m).

    ``fd`` is a static tuple of booleans: fd[i]=True marks joint i as a
    forward-dynamics joint (tau[i] given, qdd computed); fd[i]=False marks
    it prescribed (qdd[i] given, tau computed).  Returns fully-populated
    (qdd_out, tau_out).  The mask is resolved at TRACE time — each fd
    pattern is its own compiled program, like every other static-topology
    choice in this module.
    """
    nb = model.nb
    dtype = q.dtype
    fd = tuple(bool(b) for b in fd)
    assert len(fd) == nb
    a_grav = jnp.concatenate(
        [jnp.zeros(3, dtype=dtype), -jnp.asarray(model.gravity, dtype=dtype)]
    )

    v = [None] * nb
    c = [None] * nb
    xup = [None] * nb
    S = [None] * nb
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
        if not fd[i]:
            c[i] = c[i] + S[i] * qdd[i]
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
        p = int(model.parent[i])
        if not fd[i]:
            if p >= 0:
                pa = pA[i] + IA[i] @ c[i]
                IA[p] = IA[p] + xup[i].T @ IA[i] @ xup[i]
                pA[p] = pA[p] + xup[i].T @ pa
        else:
            U[i] = IA[i] @ S[i]
            d[i] = S[i] @ U[i]
            u[i] = tau[i] - S[i] @ pA[i]
            if p >= 0:
                Ia = IA[i] - jnp.outer(U[i], U[i]) / d[i]
                pa = pA[i] + Ia @ c[i] + U[i] * (u[i] / d[i])
                IA[p] = IA[p] + xup[i].T @ Ia @ xup[i]
                pA[p] = pA[p] + xup[i].T @ pa

    qdd_out = jnp.zeros(nb, dtype=dtype)
    tau_out = jnp.zeros(nb, dtype=dtype)
    a = [None] * nb
    for i in range(nb):
        p = int(model.parent[i])
        if p < 0:
            a[i] = xup[i] @ a_grav + c[i]
        else:
            a[i] = xup[i] @ a[p] + c[i]
        if not fd[i]:
            qdd_out = qdd_out.at[i].set(qdd[i])
            tau_out = tau_out.at[i].set(S[i] @ (IA[i] @ a[i] + pA[i]))
        else:
            qdd_i = (u[i] - U[i] @ a[i]) / d[i]
            qdd_out = qdd_out.at[i].set(qdd_i)
            tau_out = tau_out.at[i].set(tau[i])
            a[i] = a[i] + S[i] * qdd_i
    return qdd_out, tau_out


def id_floating_base(model, q, qd, qdd_joints, f_ext_world=None):
    """Floating-base inverse dynamics (spatial_v2/dynamics/IDfb.m).

    Given joint accelerations for the 12 actuated joints, computes the
    joint torques AND the resulting free-base acceleration — "really a
    special case of hybrid dynamics" (IDfb.m:3-6): the 6 floating-base
    pseudo-joints are forward-dynamics joints with zero force, the
    actuated joints are prescribed.  The reference parameterizes the base
    with its 13-element quaternion state for MATLAB integration; here the
    base lives in the model's own 6 pseudo-joint coordinates and
    :func:`fbkin_fwd`/:func:`fbkin_inv` provide the singularity-free
    conversions.  Returns (qdd_base (6,), tau_joints (12,)).
    """
    nb = model.nb
    dtype = q.dtype
    fd = (True,) * 6 + (False,) * (nb - 6)
    qdd = jnp.concatenate([jnp.zeros(6, dtype=dtype), jnp.asarray(qdd_joints, dtype)])
    tau = jnp.zeros(nb, dtype=dtype)
    qdd_out, tau_out = hybrid_dynamics(
        model, fd, q, qd, qdd, tau, f_ext_world=f_ext_world
    )
    return qdd_out[:6], tau_out[6:]


def fbkin_fwd(q6, qd6=None):
    """Floating-base coordinates -> singularity-free state (fbkin.m fwdkin).

    q6 = [x, y, z, rx, ry, rz] (this model's 6 floating pseudo-joint
    coordinates: 3 prismatic + Rx/Ry/Rz revolute, get_robot_model.m
    quad3D).  Returns p = [quat(4); r(3)], or x = [quat; r; v_spatial(6)]
    with qd6 given, where v_spatial is the base's spatial velocity in
    fixed-base (world-aligned, origin at world origin) coordinates —
    exactly fbkin.m's x layout."""
    from .quaternion import rot_to_quat

    c4, s4 = jnp.cos(q6[3]), jnp.sin(q6[3])
    c5, s5 = jnp.cos(q6[4]), jnp.sin(q6[4])
    c6, s6 = jnp.cos(q6[5]), jnp.sin(q6[5])
    E = jnp.stack(
        [
            jnp.stack([c5 * c6, c4 * s6 + s4 * s5 * c6, s4 * s6 - c4 * s5 * c6]),
            jnp.stack([-c5 * s6, c4 * c6 - s4 * s5 * s6, s4 * c6 + c4 * s5 * s6]),
            jnp.stack([s5, -s4 * c5, c4 * c5]),
        ]
    )
    qn = rot_to_quat(E)
    r = q6[0:3]
    p = jnp.concatenate([qn, r])
    if qd6 is None:
        return p
    # Euler-rate -> world angular velocity map (fbkin.m:67-70)
    Smat = jnp.stack(
        [
            jnp.stack([jnp.ones_like(c4), jnp.zeros_like(c4), s5]),
            jnp.stack([jnp.zeros_like(c4), c4, -s4 * c5]),
            jnp.stack([jnp.zeros_like(c4), s4, c4 * c5]),
        ]
    )
    omega = Smat @ qd6[3:6]
    rd = qd6[0:3]
    v = jnp.concatenate([omega, rd + jnp.cross(r, omega)])
    return jnp.concatenate([p, v])


def fbkin_inv(x):
    """Singularity-free state -> floating-base coordinates (fbkin.m invkin).

    Accepts p (7,) or x (13,); returns q6, or (q6, qd6) for the 13-element
    input.  q6[4] is normalized to [-pi/2, pi/2] and q6[3], q6[5] to
    [-pi, pi] (fbkin.m:20-22).  Angle extraction follows fbkin.m invkin's
    robust formulation: near the gimbal lock q6[4] = +-pi/2 only the sum
    (resp. difference) q4+q6 (q4-q6) is determined, and the naive
    atan2(-E[2,1], E[2,2]) / atan2(-E[1,0], E[0,0]) pair degenerates to
    atan2(0, 0); instead q4 is recovered from the well-conditioned
    combined-angle atan2 (identities: E[1,2]+E[0,1] = (1+s5)sin(q4+q6),
    E[1,1]-E[0,2] = (1+s5)cos(q4+q6), and the (1-s5) difference pair)
    minus/plus q6, wrapped to [-pi, pi] — accurate in and near both
    singularities, like the reference.  The RATE calculation is still
    singular at q6[4] = +-pi/2 (the Euler-rate map loses rank there), like
    the reference."""
    from .quaternion import quat_to_rot

    qn = x[0:4]
    r = x[4:7]
    E = quat_to_rot(qn)
    # E = rz' pattern above: recover angles (fbkin.m invkin)
    q5 = jnp.arctan2(E[2, 0], jnp.sqrt(E[0, 0] ** 2 + E[1, 0] ** 2))
    q6 = jnp.arctan2(-E[1, 0], E[0, 0])
    sum46 = jnp.arctan2(E[1, 2] + E[0, 1], E[1, 1] - E[0, 2])  # q4 + q6
    diff46 = jnp.arctan2(E[1, 2] - E[0, 1], E[1, 1] + E[0, 2])  # q4 - q6

    def _wrap(a):
        return jnp.mod(a + jnp.pi, 2 * jnp.pi) - jnp.pi

    q4 = jnp.where(E[2, 0] >= 0, _wrap(sum46 - q6), _wrap(diff46 + q6))
    q = jnp.concatenate([r, jnp.stack([q4, q5, q6])])
    if x.shape[0] == 7:
        return q
    omega = x[7:10]
    vo = x[10:13]
    rd = vo - jnp.cross(r, omega)
    c4, s4 = jnp.cos(q4), jnp.sin(q4)
    c5, s5 = jnp.cos(q5), jnp.sin(q5)
    Smat = jnp.stack(
        [
            jnp.stack([jnp.ones_like(c4), jnp.zeros_like(c4), s5]),
            jnp.stack([jnp.zeros_like(c4), c4, -s4 * c5]),
            jnp.stack([jnp.zeros_like(c4), s4, c4 * c5]),
        ]
    )
    euler_rates = jnp.linalg.solve(Smat, omega)
    qd = jnp.concatenate([rd, euler_rates])
    return q, qd
