"""Independent numpy oracle: faithful re-implementation of the reference's
Featherstone chain (spatial_v2) used ONLY by tests to cross-check the jnp
closed-form kinematics — the same oracle strategy as the reference's
test_jacobianApprox.m (analytic vs spatial_v2 Jacobian).
"""

import numpy as np


def rx(t):
    c, s = np.cos(t), np.sin(t)
    return np.array([[1, 0, 0], [0, c, s], [0, -s, c]])


def ry(t):
    c, s = np.cos(t), np.sin(t)
    return np.array([[c, 0, -s], [0, 1, 0], [s, 0, c]])


def rz(t):
    c, s = np.cos(t), np.sin(t)
    return np.array([[c, s, 0], [-s, c, 0], [0, 0, 1]])


def skew(v):
    return np.array([[0, -v[2], v[1]], [v[2], 0, -v[0]], [-v[1], v[0], 0]])


def plux(E, r):
    X = np.zeros((6, 6))
    X[:3, :3] = E
    X[3:, 3:] = E
    X[3:, :3] = -E @ skew(r)
    return X


def rot6(E):
    return plux(E, np.zeros(3))


def xlt(r):
    return plux(np.eye(3), r)


def jcalc(code, q):
    if code == "Rx":
        return rot6(rx(q))
    if code == "Ry":
        return rot6(ry(q))
    if code == "Rz":
        return rot6(rz(q))
    if code == "Px":
        return xlt(np.array([q, 0, 0]))
    if code == "Py":
        return xlt(np.array([0, q, 0]))
    if code == "Pz":
        return xlt(np.array([0, 0, q]))
    raise ValueError(code)


def plux_2(X):
    E = X[:3, :3]
    A = E.T @ X[3:, :3]
    r = -0.5 * np.array([A[2, 1] - A[1, 2], A[0, 2] - A[2, 0], A[1, 0] - A[0, 1]])
    return E, r


class Quad3DChain:
    """The 18-body quad3D chain (get_robot_model.m:134-245), numpy."""

    JTYPES = ["Px", "Py", "Pz", "Rx", "Ry", "Rz"] + ["Rx", "Ry", "Ry"] * 4
    SIDE_SIGN_XYZ = np.array([[1, 1, -1, -1], [-1, 1, -1, 1], [1, 1, 1, 1]], float)

    def __init__(self, params):
        self.parent = np.array([-1, 0, 1, 2, 3, 4] + sum(([5, 6 + 3 * l, 7 + 3 * l] for l in range(4)), []))
        self.xtree = [np.eye(6) for _ in range(18)]
        self.xfoot = []
        self.b_foot = []
        nb = 5
        for leg in range(4):
            ss = self.SIDE_SIGN_XYZ[:, leg]
            nb += 1
            self.xtree[nb] = plux(np.eye(3), ss * params.abad_location)
            nb += 1
            self.xtree[nb] = plux(rz(np.pi), np.zeros(3)) @ plux(np.eye(3), ss * params.hip_location)
            nb += 1
            self.xtree[nb] = plux(np.eye(3), ss * params.knee_location)
            self.xfoot.append(plux(np.eye(3), ss * params.foot_location))
            self.b_foot.append(nb)

    def fk_feet(self, q):
        X0 = [None] * 18
        for i in range(18):
            Xup = jcalc(self.JTYPES[i], q[i]) @ self.xtree[i]
            X0[i] = Xup if self.parent[i] < 0 else Xup @ X0[self.parent[i]]
        return np.array([plux_2(self.xfoot[l] @ X0[self.b_foot[l]])[1] for l in range(4)])
