"""TSR (Task Space Region) trajectory constraints + projection math.

The reference supports three kinds of hard constraints, all evaluated
as "selected xyz-ypr components of the pose of a virtual object in a
TSR frame" with an analytic Jacobian chain
(con_tsr orcdchomp_mod.cpp:1330-1497, con_everyn_tsr 1500-1657,
con_start_tsr 1659-1784):

    value = select(xyzypr( T0w⁻¹ ∘ pose_ee ∘ Twe⁻¹ ))
    J     = select( xyzypr_J · pose_jac⁻¹ · Xm(T0w⁻¹) · J_spatial )

A constrained dimension is one whose Bw bounds are both exactly zero
(orcdchomp_mod.cpp:2466-2518).  The per-iteration projection is the
goal-set CHOMP update (chomp.c:553-600): solve the dense
(J A⁻¹ Jᵀ)-weighted system over all constraint rows and push the
correction back through A⁻¹ columns.

TPU design: every constraint evaluates its full 6-dim value/Jacobian
(uniform shapes, vmappable); the *static* enabled-dimension masks then
gather the exact active rows into one concatenated system, so the
linear solve has a fixed size known at trace time.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from or_cdchomp_tpu.chomp.problem import ChompProblem, ChompSpec

import os as _os

# scan unroll factor for the quasiseparable projection solve: each of
# the two C-length scans carries tiny (n, n)/(k,) state, so the wall is
# per-iteration loop overhead, not compute.  Measured on the config-4
# step (C=49, batch 256): unroll 1 → 683 µs, 4 → 627, 7 → 633,
# full → 552 (+24% solves/s) — partial unrolls keep most of the loop
# overhead, so AUTO (0) fully unrolls up to _SSS_UNROLL_MAX points and
# falls back to 8 beyond (compile time grows with the unroll).
_SSS_UNROLL = int(_os.environ.get("CDX_SSS_UNROLL", "0"))
_SSS_UNROLL_MAX = 128


def _sss_unroll(C):
    if _SSS_UNROLL > 0:
        return min(_SSS_UNROLL, C)
    return C if C <= _SSS_UNROLL_MAX else 8
from or_cdchomp_tpu.ops import quat as qt
from or_cdchomp_tpu.ops import spatial as sp

# Bw-row order is (x y z roll pitch yaw); xyzypr order is
# (x y z yaw pitch roll): dims 3..5 flip via 8-i (orcdchomp_mod.cpp:1413)
_DIM_MAP = np.array([0, 1, 2, 5, 4, 3])


def _spd_solve(M, b):
    """Solve M x = b for symmetric positive-definite M via Cholesky.

    JAJᵀ = J·A⁻¹·Jᵀ is SPD (A is SPD; J has full row rank whenever the
    constraint system the reference's dgesv solves is non-singular,
    chomp.c:579-581), so Cholesky computes the same solution — and a
    batched (256, 100, 100) LU measured 9.4 ms/iter on TPU vs 3.8 ms
    for Cholesky (benchmarks/ablate4b.py): LU's pivoted panel
    factorization serializes badly on the MXU."""
    L = jnp.linalg.cholesky(M)
    y = jax.scipy.linalg.solve_triangular(L, b[..., None], lower=True)
    return jax.scipy.linalg.solve_triangular(L, y, lower=True,
                                             trans=1)[..., 0]


def _chol_unrolled(S, k):
    """Cholesky of a (k, k) block as k² unrolled scalar ops (k is
    static and ≤6; jnp.linalg.cholesky on tiny matrices lowers to a
    serialized blocked loop that cannot fuse into the scan body)."""
    L = [[None] * k for _ in range(k)]
    for i in range(k):
        for j in range(i + 1):
            acc = S[..., i, j]
            for t in range(j):
                acc = acc - L[i][t] * L[j][t]
            L[i][j] = jnp.sqrt(acc) if i == j else acc / L[j][j]
    return L


def _fwd_sub(L, b, k):
    """y = L⁻¹ b, unrolled; b is a list of k scalars."""
    y = [None] * k
    for i in range(k):
        acc = b[i]
        for t in range(i):
            acc = acc - L[i][t] * y[t]
        y[i] = acc / L[i][i]
    return y


def _bwd_sub(L, b, k):
    """x = L⁻ᵀ b, unrolled."""
    x = [None] * k
    for i in reversed(range(k)):
        acc = b[i]
        for t in range(i + 1, k):
            acc = acc - L[t][i] * x[t]
        x[i] = acc / L[i][i]
    return x


def _sss_solve(J, h, alpha, beta):
    """Exact O(C) solve of (Ainv ∘ JJᵀ) x = h for the D=1 metric.

    The default metric's inverse is semiseparable:
    Ainv[a, b] = α_min(a,b) · β_max(a,b) with α_p = dt²(p+1),
    β_p = m − p (metric.sep_ainv_entries).  The projection system's
    blocks therefore factor as M_ab = (α_a J_a)(β_b J_b)ᵀ for a ≤ b —
    a symmetric block-quasiseparable matrix of generator rank n.  Its
    Cholesky factor inherits the structure: G_ab = V_a Z_bᵀ (a > b)
    with V_a = β_a J_a and per-block (k, k) diagonal factors, so the
    factorization + both triangular solves run as two lax.scans over
    the C constraint points carrying only an (n, n) accumulator — no
    (C·k)² matrix is ever built and no dense factorization runs.  This
    replaced a batched (256, 100, 100) Cholesky measured at 3.8 ms/iter
    (LU: 9.4) on the everyn-TSR bench.  Exact same math as the
    reference's dgesv solve (chomp.c:579-581), reorganized.

    J: (C, k, n); h: (C, k); alpha, beta: (C,).  Returns x (C, k).
    """
    C, k, n = J.shape

    def fwd(carry, inp):
        P, s = carry                             # (n, n), (n,)
        Jb, hb, al, be = inp
        Vb = be * Jb                             # (k, n)
        # all contractions are broadcast-sum over n (tiny-K batched
        # dots lower to underfilled MXU passes)
        PV = jnp.sum(P[:, None, :] * Vb[None, :, :], axis=-1)   # (n, k)
        JJ = jnp.sum(Jb[:, None, :] * Jb[None, :, :], axis=-1)  # (k, k)
        VPV = jnp.sum(Vb[:, None, :] * PV.T[None, :, :], axis=-1)
        S = al * be * JJ - VPV                   # (k, k) Schur block
        L = _chol_unrolled(S, k)
        # Zᵀ = (Ubᵀ − P Vbᵀ) L⁻ᵀ, column-unrolled   (n, k)
        W = al * Jb.T - PV                       # Ubᵀ − P Vbᵀ  (n, k)
        Zcols = [None] * k
        for j in range(k):
            acc = W[:, j]
            for t in range(j):
                acc = acc - L[j][t] * Zcols[t]
            Zcols[j] = acc / L[j][j]
        ZT = jnp.stack(Zcols, axis=-1)           # (n, k)
        fb = hb - jnp.sum(Vb * s[None, :], axis=-1)
        y = _fwd_sub(L, [fb[i] for i in range(k)], k)
        yv = jnp.stack(y, axis=-1)               # (k,)
        s2 = s + jnp.sum(ZT * yv[None, :], axis=-1)
        P2 = P + jnp.sum(ZT[:, None, :] * ZT[None, :, :], axis=-1)
        Lr = jnp.stack([jnp.stack([L[i][j] if j <= i else
                                   jnp.zeros_like(L[i][i])
                                   for j in range(k)]) for i in range(k)])
        return (P2, s2), (Lr, ZT, Vb, yv)

    P0 = jnp.zeros((n, n), J.dtype)
    s0 = jnp.zeros((n,), J.dtype)
    _, (Ls, ZTs, Vs, ys) = jax.lax.scan(
        fwd, (P0, s0), (J, h, alpha.astype(J.dtype), beta.astype(J.dtype)),
        unroll=_sss_unroll(C))

    def bwd(t, inp):
        Lr, ZT, Vb, yv = inp
        L = [[Lr[i, j] for j in range(k)] for i in range(k)]
        g = yv - jnp.sum(ZT * t[:, None], axis=0)          # (k,)
        x = _bwd_sub(L, [g[i] for i in range(k)], k)
        xv = jnp.stack(x, axis=-1)
        t2 = t + jnp.sum(Vb * xv[:, None], axis=0)         # (n,)
        return t2, xv

    t0 = jnp.zeros((n,), J.dtype)
    _, xs = jax.lax.scan(bwd, t0, (Ls, ZTs, Vs, ys), reverse=True,
                         unroll=_sss_unroll(C))
    return xs                                              # (C, k)


class TSRConstraintSet(NamedTuple):
    """Static layout of all active TSR constraints.

    A problem's dynamic TSR frames live in ChompProblem
    (tsr_T0w_inv / tsr_Twe_inv, shape (C, 7)); this object carries the
    static structure: which moving point each constraint pins, and
    which of its 6 rows are enabled.
    """

    point_idx: tuple          # (C,) moving-point index per constraint
    enabled: tuple            # (C,) tuple of 6 bools each
    rows: tuple               # K static (constraint, dim) pairs

    @property
    def n_constraints(self):
        return len(self.point_idx)

    @property
    def k_total(self):
        return len(self.rows)

    @classmethod
    def build(cls, entries: Sequence):
        """entries: sequence of (point_idx, enabled6)."""
        point_idx = tuple(int(e[0]) for e in entries)
        enabled = tuple(tuple(bool(b) for b in e[1]) for e in entries)
        rows = tuple(
            (c, d) for c in range(len(entries)) for d in range(6)
            if enabled[c][d])
        return cls(point_idx=point_idx, enabled=enabled, rows=rows)


def tsr_enabled_from_bw(bw) -> tuple:
    """Enabled mask from a 6×2 Bw bound array: dim constrained iff both
    bounds are 0.0 (orcdchomp_mod.cpp:2466-2518)."""
    bw = np.asarray(bw, dtype=float).reshape(6, 2)
    return tuple(bool(bw[i, 0] == 0.0 and bw[i, 1] == 0.0) for i in range(6))


def eval_tsr_all(spec: ChompSpec, fk, prob: ChompProblem, T_full,
                 cons: TSRConstraintSet, kin):
    """Evaluate value + Jacobian of every constraint.

    kin: TrajKinematics (link poses/anchors already computed for all
    trajectory points by the cost pass).

    Returns (val (C, 6), jac (C, 6, n)).
    """
    # constraint points index *moving* points; map to full-trajectory
    # rows.  point_idx is STATIC: when contiguous (everyn, or any single
    # point) gather rows with a static slice — a fancy-index gather
    # batched over problems serializes per element on TPU and dominated
    # the config-4 step (~9 of 10 ms) before this
    off = 0 if spec.start_tsr else 1
    idx_t = tuple(cons.point_idx)
    lo = idx_t[0] + off
    if idx_t == tuple(range(idx_t[0], idx_t[0] + len(idx_t))):
        def take_rows(arr):
            return jax.lax.slice_in_dim(arr, lo, lo + len(idx_t), axis=0)
    else:
        full_idx = jnp.asarray(idx_t) + off

        def take_rows(arr):
            return arr[full_idx]

    ee_link_pose = fk.link_pose_red(take_rows(kin.red_poses),
                                    fk.model.ee_link)           # (C, 7)
    ee_origin = jnp.asarray(fk.model.ee_origin if fk.model.ee_origin
                            is not None else np.array([0, 0, 0, 0, 0, 0, 1.0]),
                            dtype=ee_link_pose.dtype)
    pose_ee = qt.pose_compose(ee_link_pose, ee_origin)

    pose_obj = qt.pose_compose(pose_ee, prob.tsr_Twe_inv)
    pose_table_obj = qt.pose_compose(prob.tsr_T0w_inv, pose_obj)
    xyzypr = qt.pose_to_xyzypr(pose_table_obj)                  # (C, 6)
    val = xyzypr[:, _DIM_MAP]                                   # Bw row order

    # --- spatial Jacobian of the ee *link* about the world origin ---
    anchors = take_rows(kin.anchors)                            # (C, n_dof, 7)
    axis_local = jnp.stack(
        [fk._axis[fk._dof_link[d]] for d in range(fk.n_dof)]) \
        if fk.n_dof else jnp.zeros((0, 3), ee_link_pose.dtype)
    axis_w = qt.quat_rotate(anchors[..., 3:], axis_local)       # (C, D, 3)
    origin_w = anchors[..., :3]
    ee_mask = jnp.asarray(
        fk.model.ancestor_dof_mask()[fk.model.ee_link])         # (D,)
    rev = jnp.asarray(fk._jtype_per_dof == 1)
    ang_cols = jnp.where((ee_mask & rev)[None, :, None], axis_w, 0.0)
    # linear part of a point at the world origin: axis × (0 − o)
    lin_rev = jnp.cross(axis_w, -origin_w)
    lin_cols = jnp.where(ee_mask[None, :, None],
                         jnp.where(rev[None, :, None], lin_rev, axis_w), 0.0)
    arm_spajac = jnp.concatenate(
        [jnp.swapaxes(ang_cols, -1, -2), jnp.swapaxes(lin_cols, -1, -2)],
        axis=-2)                                                # (C, 6, n_dof)

    if spec.floating_base:
        base_cols = sp.pose_jac(take_rows(T_full)[:, :7])       # (C, 6, 7)
        spajac = jnp.concatenate([base_cols, arm_spajac], axis=-1)
    else:
        spajac = arm_spajac                                     # (C, 6, n)

    # chain: xyzypr_J · pose_jac_inverse · Xm(table←world) · spajac
    # (orcdchomp_mod.cpp:1466-1481).  Contractions are broadcast-sum,
    # not batched @: (C,6,7)@(C,7,6)-style K≈6 batched dots lower to
    # thousands of underfilled MXU passes under the problem vmap.
    xm_tw = sp.xm_from_pose(prob.tsr_T0w_inv)                   # (C, 6, 6)
    jac_inv = sp.pose_jac_inverse(pose_table_obj)               # (C, 7, 6)
    to_ypr = qt.pose_to_xyzypr_J(pose_table_obj)                # (C, 6, 7)

    def bmm(a, b):
        return jnp.sum(a[..., :, :, None] * b[..., None, :, :], axis=-2)

    full = bmm(bmm(bmm(to_ypr, jac_inv), xm_tw), spajac)        # (C, 6, n)
    jac = full[:, _DIM_MAP, :]
    return val, jac


def project_constraints(spec: ChompSpec, cons: TSRConstraintSet, engine,
                        lambda_, AG, T_mov, val, jac):
    """Goal-set CHOMP constraint projection (chomp.c:553-600).

    ``engine`` supplies the metric-inverse entries (dense Ainv indexing
    or the analytic semiseparable form — see ChompEngine.ainv_block).
    Returns the T correction (m, n) to *add* to the trajectory.
    """
    if cons.k_total == 0:
        return jnp.zeros_like(T_mov)
    pts_t = tuple(cons.point_idx)
    C = cons.n_constraints
    contiguous = pts_t == tuple(range(pts_t[0], pts_t[0] + C))
    uniform = len(set(cons.enabled)) == 1

    if uniform:
        # gather-free fast path (covers everyn/start/single-TSR runs —
        # every constraint enables the same dims): constraint rows stay
        # in (C, k) blocks, point rows come from a static slice, and
        # the static row/column index sets on the constant A⁻¹ fold at
        # compile time.  Batched fancy-index gathers here serialized
        # per element on TPU (most of the round-2 config-4 step).
        dims = [d for d in range(6) if cons.enabled[0][d]]
        k = len(dims)
        h0 = val[:, dims]                         # (C, k) — static slices
        J = jac[:, dims, :]                       # (C, k, n)
        if contiguous:
            AGp = jax.lax.slice_in_dim(AG, pts_t[0], pts_t[0] + C, axis=0)
        else:
            AGp = AG[jnp.asarray(pts_t)]
        # h += −(1/λ) J · AG[pt]  (chomp.c:563-565)
        h = h0 - (1.0 / lambda_) * jnp.sum(J * AGp[:, None, :], axis=-1)

        pts_np = np.asarray(pts_t)
        from or_cdchomp_tpu.chomp import metric as metric_mod
        sss_ok = (metric_mod.sep_eligible(spec.D, not spec.start_tsr)
                  and C >= 4 and np.all(np.diff(pts_np) >= 0))
        if sss_ok:
            # semiseparable Ainv ⇒ block-quasiseparable system: exact
            # O(C) scan solve, never building the (C·k)² matrix
            alpha = jnp.asarray((spec.dt * spec.dt) * (pts_np + 1.0))
            beta = jnp.asarray(float(spec.m) - pts_np)
            x = _sss_solve(J, h, alpha, beta).reshape(C * k)
        else:
            # JAJT[(a,i),(b,j)] = Ainv[pt_a, pt_b] · (J_ai · J_bj)
            # (chomp.c:568-575) — broadcast-sum over n, not a batched dot
            JJt = jnp.sum(J[:, :, None, None, :] * J[None, None, :, :, :],
                          axis=-1)                # (C, k, C, k)
            Acc = engine.ainv_block(pts_np)       # (C, C), constant-folded
            JAJT = (JJt * Acc[:, None, :, None]).reshape(C * k, C * k)
            x = _spd_solve(JAJT, h.reshape(C * k))   # (chomp.c:579-581)

        # T −= Σ_c Ainv[:, pt_c] ⊗ (J_cᵀ x_c)  (chomp.c:593-599)
        delta = jnp.sum(J * x.reshape(C, k)[:, :, None], axis=1)  # (C, n)
        cols = engine.ainv_cols(pts_np)           # (m, C), constant-folded
        correction = -jnp.sum(cols[:, :, None] * delta[None, :, :], axis=1)
        return correction

    # general path: per-row gathers (mixed enabled masks)
    rows_c = jnp.asarray([r[0] for r in cons.rows])
    rows_d = jnp.asarray([r[1] for r in cons.rows])
    idx = jnp.asarray(cons.point_idx)

    h = val[rows_c, rows_d]                       # (K,)
    J = jac[rows_c, rows_d, :]                    # (K, n)
    row_pt = idx[rows_c]                          # (K,) moving-point index

    # h += −(1/λ) J · AG[pt]  (chomp.c:563-565)
    h = h - (1.0 / lambda_) * jnp.sum(J * AG[row_pt], axis=-1)

    # JAJT[a,b] = Ainv[pt_a, pt_b] · (J_a · J_b)  (chomp.c:568-575);
    # K×K over a small n contraction — broadcast-sum, not a batched dot
    JJt = jnp.sum(J[:, None, :] * J[None, :, :], axis=-1)
    JAJT = JJt * engine.ainv_block(np.asarray([pts_t[int(c)]
                                               for c, _ in cons.rows]))

    x = _spd_solve(JAJT, h)                       # (chomp.c:579-581 dgesv)

    # T −= Σ_k Ainv[:, pt_k] ⊗ (J_k x_k)  (chomp.c:593-599)
    cols = engine.ainv_cols(np.asarray([pts_t[int(c)]
                                        for c, _ in cons.rows]))
    correction = -jnp.einsum("mk,k,kn->mn", cols, x, J)
    return correction
