"""Independent NumPy float64 oracle of the reference CHOMP math.

A from-the-formulas mini-implementation of the algorithms in
src/libcd/chomp.c, src/libcd/grid.c and the sphere cost callbacks of
src/orcdchomp_mod.cpp, written in sequential scalar-loop style so that
it shares no code with the vectorized JAX build.  Used purely as a test
oracle for golden parity tests (the reference's own binaries need
OpenRAVE and cannot run here; SURVEY.md §4).
"""

from __future__ import annotations

import numpy as np

TAU = 2.0 * np.pi


# ---------------------------------------------------------------------------
# pose helpers (sequential style)
# ---------------------------------------------------------------------------

def q_mul(a, b):
    ax, ay, az, aw = a
    bx, by, bz, bw = b
    return np.array([
        aw * bx + ax * bw + ay * bz - az * by,
        aw * by - ax * bz + ay * bw + az * bx,
        aw * bz + ax * by - ay * bx + az * bw,
        aw * bw - ax * bx - ay * by - az * bz])


def q_rot(q, v):
    # rotate via R matrix
    return q_to_R(q) @ np.asarray(v, dtype=float)


def q_to_R(q):
    x, y, z, w = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
        [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
        [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)]])


def p_mul(pa, pb):
    q = q_mul(pa[3:], pb[3:])
    return np.concatenate([q_rot(pa[3:], pb[:3]) + pa[:3], q])


def p_inv(p):
    qi = np.array([-p[3], -p[4], -p[5], p[6]])
    return np.concatenate([-q_rot(qi, p[:3]), qi])


def p_apply(p, v):
    return q_rot(p[3:], v) + p[:3]


# ---------------------------------------------------------------------------
# grid: lookup / interp / grad  (grid.c:191-454 semantics)
# ---------------------------------------------------------------------------

def grid_interp(data, lengths, p):
    """Returns value or None when out of bounds."""
    sizes = data.shape
    subs = []
    for ni in range(3):
        x = p[ni] / lengths[ni]
        if x < 0.0 or x > 1.0:
            return None
        s = int(np.floor(x * sizes[ni]))
        if s == sizes[ni]:
            s -= 1
        subs.append(s)
    v0 = data[tuple(subs)]
    if np.isinf(v0):
        return np.inf
    value = v0
    for ni in range(3):
        s = subs[ni]
        center = (0.5 + s) / sizes[ni] * lengths[ni]
        if s == 0:
            use_next = True
        elif s == sizes[ni] - 1:
            use_next = False
        else:
            use_next = not (p[ni] < center)
        nb = list(subs)
        nb[ni] = s + (1 if use_next else -1)
        # grid.c:428-443: diff always uses the *grid* values at the
        # original index and its neighbor (value_after - value_before),
        # never the running accumulated value; HUGE_VAL propagates.
        if np.isinf(data[tuple(nb)]):
            return np.inf
        diff = (data[tuple(nb)] - v0) if use_next else (v0 - data[tuple(nb)])
        grad = diff * sizes[ni] / lengths[ni]
        value += grad * (p[ni] - center)
    return value


def grid_grad(data, lengths, p):
    sizes = data.shape
    subs = []
    for ni in range(3):
        x = p[ni] / lengths[ni]
        if x < 0.0 or x > 1.0:
            return None
        s = int(np.floor(x * sizes[ni]))
        if s == sizes[ni]:
            s -= 1
        subs.append(s)
    out = np.zeros(3)
    for ni in range(3):
        s = subs[ni]
        center = (0.5 + s) / sizes[ni] * lengths[ni]
        if s == 0:
            use_next = True
        elif s == sizes[ni] - 1:
            use_next = False
        else:
            use_next = not (p[ni] < center)
        nb = list(subs)
        nb[ni] = s + (1 if use_next else -1)
        v0 = data[tuple(subs)]
        if np.isinf(v0) or np.isinf(data[tuple(nb)]):
            return np.zeros(3)   # HUGE_VAL query: zero grad (grid.c:405-439)
        diff = (data[tuple(nb)] - v0) if use_next else (v0 - data[tuple(nb)])
        out[ni] = diff * sizes[ni] / lengths[ni]
    return out


# ---------------------------------------------------------------------------
# EDT: Felzenszwalb lower envelope (grid.c:269-329), per-axis driver
# ---------------------------------------------------------------------------

def sedt_1d(f):
    n = len(f)
    out = np.full(n, np.inf)
    v = np.zeros(n, dtype=int)
    z = np.zeros(n + 1)
    np_ = 0
    for q in range(n):
        if f[q] == np.inf:
            continue
        if np_ == 0:
            np_ = 1
            v[0] = q
            z[0] = -np.inf
            z[1] = np.inf
            continue
        while True:
            s = (f[q] + q * q - (f[v[np_ - 1]] + v[np_ - 1] ** 2)) / \
                (2.0 * (q - v[np_ - 1]))
            if s <= z[np_ - 1]:
                np_ -= 1
            else:
                break
        np_ += 1
        v[np_ - 1] = q
        z[np_ - 1] = s
        z[np_] = np.inf
    if np_ == 0:
        return out
    k = 0
    for q in range(n):
        while z[k + 1] < q:
            k += 1
        out[q] = (q - v[k]) ** 2 + f[v[k]]
    return out


def sedt_3d(func, lengths):
    g = func.astype(float).copy()
    for axis in range(3):
        n = g.shape[axis]
        res2 = (lengths[axis] / n) ** 2
        moved = np.moveaxis(g, axis, -1)
        flat = moved.reshape(-1, n)
        for i in range(flat.shape[0]):
            line = flat[i] / res2
            flat[i] = sedt_1d(line) * res2
        g = np.moveaxis(flat.reshape(moved.shape), -1, axis)
    return g


def signed_sdf(occupied, lengths):
    f_obs = np.where(occupied, 0.0, np.inf)
    f_free = np.where(occupied, np.inf, 0.0)
    return np.sqrt(sedt_3d(f_obs, lengths)) - np.sqrt(sedt_3d(f_free, lengths))


# ---------------------------------------------------------------------------
# spatial / xyzypr helpers (spatial.c:295-375, 72-101; kin.c:616-712)
# ---------------------------------------------------------------------------

def pose_jac(pose):
    """6x7 pose-velocity Jacobian (spatial.c:295-337)."""
    x, y, z = pose[:3]
    qx2, qy2, qz2, qw2 = 2.0 * pose[3:]
    J = np.zeros((6, 7))
    J[3, 0] = J[4, 1] = J[5, 2] = 1.0
    J[0, 3:] = [qw2, -qz2, qy2, -qx2]
    J[1, 3:] = [qz2, qw2, -qx2, -qy2]
    J[2, 3:] = [-qy2, qx2, qw2, -qz2]
    J[3, 3:] = [-z * qz2 - y * qy2, -z * qw2 + y * qx2,
                z * qx2 + y * qw2, z * qy2 - y * qz2]
    J[4, 3:] = [z * qw2 + x * qy2, -z * qz2 - x * qx2,
                z * qy2 - x * qw2, -z * qx2 + x * qz2]
    J[5, 3:] = [-y * qw2 + x * qz2, y * qz2 + x * qw2,
                -y * qy2 - x * qx2, y * qx2 - x * qy2]
    return J


def pose_jac_inverse(pose):
    """7x6 inverse pose-velocity Jacobian (spatial.c:339-375)."""
    x, y, z = pose[:3]
    qxd, qyd, qzd, qwd = 0.5 * pose[3:]
    J = np.zeros((7, 6))
    J[0, 1], J[0, 2] = z, -y
    J[1, 0], J[1, 2] = -z, x
    J[2, 0], J[2, 1] = y, -x
    J[0, 3] = J[1, 4] = J[2, 5] = 1.0
    J[3, :3] = [qwd, qzd, -qyd]
    J[4, :3] = [-qzd, qwd, qxd]
    J[5, :3] = [qyd, -qxd, qwd]
    J[6, :3] = [-qxd, -qyd, -qzd]
    return J


def xm_from_pose(pose):
    """6x6 motion transform from a pose (spatial.c:104-135)."""
    R = q_to_R(pose[3:])
    x, y, z = pose[:3]
    rx = np.array([[0.0, -z, y], [z, 0.0, -x], [-y, x, 0.0]])
    X = np.zeros((6, 6))
    X[:3, :3] = R
    X[3:, 3:] = R
    X[3:, :3] = rx @ R
    return X


def pose_to_xyzypr(pose):
    """(kin.c:616-647; no gimbal-lock branches hit in tests)."""
    qx, qy, qz, qw = pose[3:]
    out = np.zeros(6)
    out[:3] = pose[:3]
    sinp2 = qw * qy - qz * qx
    if sinp2 > 0.49999:
        out[3] = -2.0 * np.arctan2(qx, qw)
        out[4] = 0.25 * TAU
        out[5] = 0.0
    elif sinp2 < -0.49999:
        out[3] = 2.0 * np.arctan2(qx, qw)
        out[4] = -0.25 * TAU
        out[5] = 0.0
    else:
        out[3] = np.arctan2(2.0 * (qw * qz + qx * qy),
                            1.0 - 2.0 * (qy * qy + qz * qz))
        out[4] = np.arcsin(2.0 * sinp2)
        out[5] = np.arctan2(2.0 * (qw * qx + qy * qz),
                            1.0 - 2.0 * (qx * qx + qy * qy))
    return out


def pose_to_xyzypr_J(pose):
    """6x7 xyzypr Jacobian (kin.c:683-712)."""
    qx, qy, qz, qw = pose[3:]
    J = np.zeros((6, 7))
    J[0, 0] = J[1, 1] = J[2, 2] = 1.0
    nu = 2.0 * (qw * qz + qx * qy)
    de = 1.0 - 2.0 * (qy * qy + qz * qz)
    dd = de * de + nu * nu
    J[3, 3] = de / dd * (2.0 * qy)
    J[3, 4] = de / dd * (2.0 * qx) - nu / dd * (-4.0 * qy)
    J[3, 5] = de / dd * (2.0 * qw) - nu / dd * (-4.0 * qz)
    J[3, 6] = de / dd * (2.0 * qz)
    a = 2.0 * (qw * qy - qz * qx)
    s = 1.0 / np.sqrt(1.0 - a * a)
    J[4, 3:] = [s * 2.0 * (-qz), s * 2.0 * qw, s * 2.0 * (-qx), s * 2.0 * qy]
    nu = 2.0 * (qw * qx + qy * qz)
    de = 1.0 - 2.0 * (qx * qx + qy * qy)
    dd = de * de + nu * nu
    J[5, 3] = de / dd * (2.0 * qw) - nu / dd * (-4.0 * qx)
    J[5, 4] = de / dd * (2.0 * qz) - nu / dd * (-4.0 * qy)
    J[5, 5] = de / dd * (2.0 * qy)
    J[5, 6] = de / dd * (2.0 * qx)
    return J


def p_normalize(pose):
    q = pose[3:]
    return np.concatenate([pose[:3], q / np.linalg.norm(q)])


# ---------------------------------------------------------------------------
# metric (chomp.c:239-428)
# ---------------------------------------------------------------------------

def build_KEs(m, n, dt, D, inits, finals):
    """inits/finals: lists of per-order vectors or None."""
    num_derivs = [m]
    Ks, Es = [], []
    for d in range(D):
        nd = num_derivs[-1] - 1 + (inits[d] is not None) + \
            (finals[d] is not None)
        diff = np.zeros((nd, num_derivs[-1]))
        E = np.zeros((nd, n))
        row = 0
        if inits[d] is not None:
            diff[0, 0] = 1.0 / dt
            E[0] += -np.asarray(inits[d]) / dt
            row = 1
        for i in range(num_derivs[-1] - 1):
            diff[row + i, i] = -1.0 / dt
            diff[row + i, i + 1] = 1.0 / dt
        if finals[d] is not None:
            diff[nd - 1, num_derivs[-1] - 1] = -1.0 / dt
            E[nd - 1] += np.asarray(finals[d]) / dt
        K = diff.copy() if d == 0 else diff @ Ks[d - 1]
        if d > 0:
            E = E + diff @ Es[d - 1]
        Ks.append(K)
        Es.append(E)
        num_derivs.append(nd)
    wds = [0.0] * (D - 1) + [1.0]
    A = np.zeros((m, m))
    B = np.zeros((m, n))
    trC = 0.0
    for d in range(D):
        s = wds[d] / num_derivs[d + 1]
        A += s * Ks[d].T @ Ks[d]
        B += s * Ks[d].T @ Es[d]
        trC += 0.5 * s * np.trace(Es[d].T @ Es[d])
    return A, B, trC, Ks, Es


def build_Kvels(m, n, dt, init0, final0):
    K = np.zeros((m, m))
    E = np.zeros((m, n))
    for i in range(m):
        if i == 0:
            if init0 is not None:
                K[0, 1] = 0.5 / dt
                E[0] = -0.5 / dt * np.asarray(init0)
            else:
                K[0, 1] = 1.0 / dt
                K[0, 0] = -1.0 / dt
        elif i < m - 1:
            K[i, i + 1] = 0.5 / dt
            K[i, i - 1] = -0.5 / dt
        else:
            if final0 is not None:
                E[i] = 0.5 / dt * np.asarray(final0)
                K[i, i - 1] = -0.5 / dt
            else:
                K[i, i] = 1.0 / dt
                K[i, i - 1] = -1.0 / dt
    return K, E


# ---------------------------------------------------------------------------
# robot FK (independent sequential implementation over RobotModel arrays)
# ---------------------------------------------------------------------------

def fk_link_poses(model, q, base_pose=None):
    """Sequential FK.  model: RobotModel (numpy fields); q: (n_dof,)."""
    L = len(model.link_names)
    poses = np.zeros((L, 7))
    poses[0] = base_pose if base_pose is not None else \
        np.array([0, 0, 0, 0, 0, 0, 1.0])
    anchors = np.zeros((model.n_dof, 7))
    for i in range(1, L):
        anchor = p_mul(poses[model.parent[i]], model.origin[i])
        d = int(model.dof_index[i])
        jt = int(model.jtype[i])
        if jt == 0 or (d < 0 and jt != 0):
            val = float(model.q_frozen[i])
        else:
            val = float(q[d])
        if jt == 1:  # revolute
            a2 = 0.5 * val
            mq = np.concatenate([np.sin(a2) * model.axis[i], [np.cos(a2)]])
            motion = np.concatenate([np.zeros(3), mq])
        elif jt == 2:
            motion = np.concatenate([model.axis[i] * val, [0, 0, 0, 1.0]])
        else:
            motion = np.array([0, 0, 0, 0, 0, 0, 1.0])
        if d >= 0:
            anchors[d] = anchor
        poses[i] = p_mul(anchor, motion)
    return poses, anchors


def sphere_positions(model, poses, order=None):
    order = np.arange(len(model.sphere_link)) if order is None else order
    out = np.zeros((len(order), 3))
    for k, si in enumerate(order):
        out[k] = p_apply(poses[model.sphere_link[si]], model.sphere_pos[si])
    return out


def sphere_jacobian(model, anchors, x, link_index):
    """3×n_dof position Jacobian of point x on link link_index."""
    J = np.zeros((3, model.n_dof))
    # which dofs affect the link: walk ancestors
    mask = np.zeros(model.n_dof, dtype=bool)
    j = link_index
    while j > 0:
        d = int(model.dof_index[j])
        if d >= 0:
            mask[d] = True
        j = int(model.parent[j])
    for d in range(model.n_dof):
        if not mask[d]:
            continue
        # link of this dof
        li = [i for i in range(len(model.link_names))
              if model.dof_index[i] == d][0]
        axis_w = q_rot(anchors[d][3:], model.axis[li])
        if model.jtype[li] == 1:
            J[:, d] = np.cross(axis_w, x - anchors[d][:3])
        else:
            J[:, d] = axis_w
    return J


# ---------------------------------------------------------------------------
# the full iteration (chomp.c:430-683 + sphere cost callbacks)
# ---------------------------------------------------------------------------

class OracleChomp:
    """Sequential implementation of one full CHOMP problem.

    Feature coverage mirrors the reference iteration surface:
    floating base (orcdchomp_mod.cpp:991-1086, 2805-2808), momentum and
    injected-noise HMC (chomp.c:533-548, orcdchomp_mod.cpp:2754-2768),
    TSR constraint projection (con_tsr orcdchomp_mod.cpp:1330-1497,
    chomp.c:553-600), start_tsr (m = n_points-1, shifted windows,
    orcdchomp_mod.cpp:2569-2572, 1040-1046, 1099-1127), multi-SDF
    min-select and inactive spheres.
    """

    def __init__(self, model, robot_pose, traj, lambda_, epsilon,
                 epsilon_self, obs_factor, obs_factor_self,
                 sdfs, jlimit_lower, jlimit_upper, D=1,
                 floating_base=False, use_momentum=False,
                 constraints=(), start_tsr=False, ee_origin=None):
        """sdfs: list of (data, lengths, pose_world_gsdf).
        constraints: list of (moving_point_idx, enabled6, T0w, Twe)."""
        self.model = model
        self.robot_pose = np.asarray(robot_pose, dtype=float)
        self.traj = np.asarray(traj, dtype=float).copy()
        self.n_points, self.n = self.traj.shape
        self.floating_base = bool(floating_base)
        self.start_tsr = bool(start_tsr)
        self.m = self.n_points - (1 if start_tsr else 2)
        self.mov_lo = 0 if start_tsr else 1
        self.n_adof = model.n_dof
        self.dt = 1.0 / (self.n_points - 1)
        self.lambda_ = lambda_
        self.epsilon = epsilon
        self.epsilon_self = epsilon_self
        self.obs_factor = obs_factor
        self.obs_factor_self = obs_factor_self
        self.sdfs = [(np.asarray(d, dtype=float), np.asarray(l, dtype=float),
                      np.asarray(p, dtype=float)) for d, l, p in sdfs]
        self.lo = np.asarray(jlimit_lower, dtype=float)
        self.hi = np.asarray(jlimit_upper, dtype=float)
        self.use_momentum = bool(use_momentum)
        self.AG = np.zeros((self.m, self.n))
        self.leapfrog_first = True
        self.constraints = [
            (int(i), tuple(bool(b) for b in en),
             np.asarray(t0w, dtype=float), np.asarray(twe, dtype=float))
            for i, en, t0w, twe in constraints]
        self.ee_origin = (np.asarray(ee_origin, dtype=float)
                          if ee_origin is not None
                          else (model.ee_origin if model.ee_origin is not None
                                else np.array([0, 0, 0, 0, 0, 0, 1.0])))

        if floating_base:
            act = np.ones(len(model.sphere_link), dtype=bool)
        else:
            act = model.sphere_active_mask()
        self.order = np.concatenate([np.where(act)[0], np.where(~act)[0]])
        self.n_act = int(act.sum())
        self.radii = model.sphere_radius[self.order]
        self.links = model.sphere_link[self.order]

        A, B, trC, _, _ = build_KEs(
            self.m, self.n, self.dt, D,
            [None if start_tsr else self.traj[0]]
            + [np.zeros(self.n)] * (D - 1),
            [self.traj[-1]] + [np.zeros(self.n)] * (D - 1))
        self.A = A
        self.B = B
        self.trC = trC
        self.Ainv = np.linalg.inv(A)

        # fixed inactive sphere positions at the trajectory start config
        q0 = self.traj[0, 7:] if floating_base else self.traj[0]
        base0 = self.traj[0, :7] if floating_base else self.robot_pose
        poses, _ = fk_link_poses(model, q0, base0)
        self.inactive_pos = sphere_positions(
            model, poses, self.order[self.n_act:])

    # -- helpers --

    def _config(self, row):
        """(q_active, base_pose) of one trajectory row."""
        if self.floating_base:
            return row[7:], row[:7]
        return row, self.robot_pose

    def _full_jac(self, row, anchors, x, link_index):
        """3×n point Jacobian incl. the damped floating-base block
        (orcdchomp_mod.cpp:1047-1086)."""
        Ja = sphere_jacobian(self.model, anchors, x, link_index)
        if not self.floating_base:
            return Ja
        Jsp = pose_jac(row[:7])
        rx = np.array([[0.0, x[2], -x[1]],
                       [-x[2], 0.0, x[0]],
                       [x[1], -x[0], 0.0]])   # cross-matrix of −x
        base = 0.01 * (rx @ Jsp[:3] + Jsp[3:])
        return np.concatenate([base, Ja], axis=1)

    # -- cost_pre (orcdchomp_mod.cpp:968-1132) --

    def _kinematics(self):
        np_, S = self.n_points, self.n_act
        x_all = np.zeros((np_, S, 3))
        jacs = np.zeros((self.m, S, 3, self.n))
        for ti in range(np_):
            q, base = self._config(self.traj[ti])
            poses, anchors = fk_link_poses(self.model, q, base)
            x_all[ti] = sphere_positions(self.model, poses,
                                         self.order[:S])
            ti_mov = ti if self.start_tsr else ti - 1
            if 0 <= ti_mov < self.m:
                for s in range(S):
                    jacs[ti_mov, s] = self._full_jac(
                        self.traj[ti], anchors, x_all[ti, s],
                        int(self.links[s]))
        internal_vel = (x_all[2:] - x_all[:-2]) / (2 * self.dt)
        internal_acc = (x_all[:-2] - 2 * x_all[1:-1] + x_all[2:]) \
            / self.dt ** 2
        if self.start_tsr:
            # start point moves: one-sided start vel, copied start acc
            # (orcdchomp_mod.cpp:1099-1127)
            v0 = (x_all[1:2] - x_all[0:1]) / self.dt
            vel = np.concatenate([v0, internal_vel], axis=0)
            acc = np.concatenate([internal_acc[0:1], internal_acc], axis=0)
        else:
            vel = internal_vel
            acc = internal_acc
        return x_all, vel, acc, jacs

    # -- TSR constraint evaluation (con_tsr, orcdchomp_mod.cpp:1330-1497) --

    def _con_eval(self, ci, point):
        pt_idx, enabled, T0w, Twe = self.constraints[ci]
        q, base = self._config(point)
        poses, anchors = fk_link_poses(self.model, q, base)
        ee_pose = p_mul(poses[self.model.ee_link], self.ee_origin)
        pose_obj = p_mul(ee_pose, p_inv(Twe))
        pose_table_world = p_inv(T0w)
        pto = p_mul(pose_table_world, pose_obj)
        xyzypr = pose_to_xyzypr(pto)
        rows = [tsri if tsri < 3 else 8 - tsri
                for tsri in range(6) if enabled[tsri]]
        val = np.array([xyzypr[rr] for rr in rows])

        # spatial jacobian of the ee link about the world origin
        spa = np.zeros((6, self.n))
        off = 0
        if self.floating_base:
            spa[:, :7] = pose_jac(point[:7])
            off = 7
        # ancestor mask of the ee link
        mask = np.zeros(self.n_adof, dtype=bool)
        j = self.model.ee_link
        while j > 0:
            d = int(self.model.dof_index[j])
            if d >= 0:
                mask[d] = True
            j = int(self.model.parent[j])
        for d in range(self.n_adof):
            if not mask[d]:
                continue
            li = [i for i in range(len(self.model.link_names))
                  if self.model.dof_index[i] == d][0]
            axis_w = q_rot(anchors[d][3:], self.model.axis[li])
            if self.model.jtype[li] == 1:     # revolute
                spa[:3, off + d] = axis_w
                spa[3:, off + d] = np.cross(axis_w, -anchors[d][:3])
            else:                              # prismatic
                spa[3:, off + d] = axis_w
        full = pose_to_xyzypr_J(pto) @ pose_jac_inverse(pto) \
            @ xm_from_pose(pose_table_world) @ spa
        J = np.stack([full[rr] for rr in rows])
        return val, J

    # -- sphere_cost (orcdchomp_mod.cpp:1134-1327) --

    def _point_cost(self, ti, x_all, vel, acc, jacs, want_grad):
        S = self.n_act
        cost = 0.0
        grad = np.zeros(self.n)
        x_mov = x_all[ti + self.mov_lo]
        for s in range(S):
            cost_sphere = 0.0
            v = vel[ti, s]
            vn = np.linalg.norm(v)
            # best field
            best, best_dist = -1, np.inf
            for fi, (data, lengths, pw) in enumerate(self.sdfs):
                gp = p_apply(p_inv(pw), x_mov[s])
                val = grid_interp(data, lengths, gp)
                if val is None:
                    continue
                if val < best_dist:
                    best_dist, best = val, fi
            if best >= 0:
                data, lengths, pw = self.sdfs[best]
                gp = p_apply(p_inv(pw), x_mov[s])
                dist = grid_interp(data, lengths, gp) - self.radii[s]
                if dist < 0:
                    cost_sphere += vn * self.obs_factor * \
                        (0.5 * self.epsilon - dist)
                elif dist < self.epsilon:
                    cost_sphere += vn * self.obs_factor * \
                        (0.5 / self.epsilon) * (dist - self.epsilon) ** 2
                if want_grad:
                    g = grid_grad(data, lengths, gp)
                    g = q_rot(pw[3:], g)
                    xg = g.copy()
                    if dist < 0:
                        xg *= -1.0
                    elif dist < self.epsilon:
                        xg *= dist / self.epsilon - 1.0
                    else:
                        xg[:] = 0.0
                    xg *= vn * self.obs_factor
                    if vn > 1e-6:
                        xg -= (xg @ v) / vn ** 2 * v
                    curv = acc[ti, s].copy()
                    if vn > 1e-6:
                        curv -= (curv @ v) / vn ** 2 * v
                        curv /= vn ** 2
                        xg -= cost_sphere * curv
                    grad += vn * jacs[ti, s].T @ xg
            # self collision
            for s2 in range(len(self.order)):
                if self.links[s2] == self.links[s]:
                    continue
                if s2 < S:
                    other = x_mov[s2]
                else:
                    other = self.inactive_pos[s2 - S]
                vfo = x_mov[s] - other
                d2 = np.linalg.norm(vfo)
                if d2 > self.radii[s] + self.radii[s2] + self.epsilon_self:
                    continue
                u = vfo / d2
                dd = d2 - (self.radii[s] + self.radii[s2])
                if dd < 0:
                    cost_sphere += vn * self.obs_factor_self * \
                        (0.5 * self.epsilon_self - dd)
                else:
                    cost_sphere += vn * self.obs_factor_self * \
                        (0.5 / self.epsilon_self) * \
                        (dd - self.epsilon_self) ** 2
                if want_grad:
                    xg = u.copy()
                    if dd < 0:
                        xg *= -1.0
                    elif dd < self.epsilon_self:
                        xg *= dd / self.epsilon_self - 1.0
                    xg *= vn * self.obs_factor_self
                    if vn > 1e-6:
                        xg -= (xg @ v) / vn ** 2 * v
                    J2 = jacs[ti, s].copy()
                    if s2 < S:
                        J2 -= jacs[ti, s2]
                    grad += J2.T @ xg
            cost += cost_sphere
        return cost, grad

    def resample_momentum(self, noise):
        """HMC momentum resample with *injected* noise (the reference
        draws AG ~ N(0, 1/√α) from GSL, orcdchomp_mod.cpp:2754-2765;
        parity tests inject the identical noise into both sides)."""
        self.AG = np.asarray(noise, dtype=float).copy()
        self.leapfrog_first = True

    def iterate(self, do_iteration=True):
        """One cd_chomp_iterate; returns (total, obs, smooth)."""
        m, n = self.m, self.n
        T = self.traj[self.mov_lo:self.mov_lo + m]  # view
        x_all, vel, acc, jacs = self._kinematics()
        cost_obs = 0.0
        G = np.zeros((m, n))
        for ti in range(m):
            c, g = self._point_cost(ti, x_all, vel, acc, jacs, do_iteration)
            cost_obs += c
            G[ti] = g
        cost_obs /= m
        G /= m
        if do_iteration:
            G += self.A @ T + self.B
            if not self.use_momentum:
                AG = self.Ainv @ G
            else:
                # leapfrog half-step on first use (chomp.c:533-548)
                scale = (0.5 if self.leapfrog_first else 1.0) / self.lambda_
                self.AG = self.AG + scale * (self.Ainv @ G)
                self.leapfrog_first = False
                AG = self.AG

            # constraint projection (chomp.c:553-600)
            if self.constraints:
                hs, Js = [], []
                for ci, (pi, _, _, _) in enumerate(self.constraints):
                    h, J = self._con_eval(ci, self.traj[self.mov_lo + pi])
                    h = h - (1.0 / self.lambda_) * (J @ AG[pi])
                    hs.append(h)
                    Js.append(J)
                ks = [len(h) for h in hs]
                K = sum(ks)
                JAJT = np.zeros((K, K))
                o1 = 0
                for c1, (p1, *_r1) in enumerate(self.constraints):
                    o2 = 0
                    for c2, (p2, *_r2) in enumerate(self.constraints):
                        JAJT[o1:o1 + ks[c1], o2:o2 + ks[c2]] = \
                            self.Ainv[p1, p2] * (Js[c1] @ Js[c2].T)
                        o2 += ks[c2]
                    o1 += ks[c1]
                x = np.linalg.solve(JAJT, np.concatenate(hs))
                o1 = 0
                for c1, (p1, *_r1) in enumerate(self.constraints):
                    delta = Js[c1].T @ x[o1:o1 + ks[c1]]
                    T -= np.outer(self.Ainv[:, p1], delta)
                    o1 += ks[c1]

            T -= AG / self.lambda_
            # joint limits
            for _ in range(1000):
                Gj = np.zeros((m, n))
                largest, li = 0.0, 0
                for i in range(m):
                    for j in range(n):
                        if T[i, j] < self.lo[j]:
                            Gj[i, j] = self.lo[j] - T[i, j]
                        if T[i, j] > self.hi[j]:
                            Gj[i, j] = self.hi[j] - T[i, j]
                        if abs(Gj[i, j]) > largest:
                            largest = abs(Gj[i, j])
                            li = i * n + j
                if largest == 0.0:
                    break
                GjA = self.Ainv @ Gj
                T += 1.01 * Gj.flat[li] / GjA.flat[li] * GjA
        # smooth cost on the updated (pre-renorm) trajectory — the
        # reference computes it at the end of cd_chomp_iterate
        # (chomp.c:660-677); the quaternion renorm happens afterwards
        # in mod::iterate (orcdchomp_mod.cpp:2805-2808)
        cost_smooth = np.trace(0.5 * T.T @ self.A @ T + self.B.T @ T) \
            + self.trC
        if do_iteration and self.floating_base:
            for i in range(self.n_points):
                self.traj[i, :7] = p_normalize(self.traj[i, :7])
        return cost_obs + cost_smooth, cost_obs, cost_smooth
