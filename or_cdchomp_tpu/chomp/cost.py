"""Batched obstacle + self-collision cost and functional gradient.

This is the TPU replacement for the reference's per-iteration callback
pair:

 - ``sphere_cost_pre`` (orcdchomp_mod.cpp:968-1132): FK + Jacobians for
   every trajectory point, finite-difference workspace velocities and
   accelerations of every robot sphere.
 - ``sphere_cost`` (orcdchomp_mod.cpp:1134-1327): per (point, sphere)
   multi-SDF min-select lookup, velocity-scaled hinge obstacle cost,
   the CHOMP workspace functional gradient (orthogonal projection +
   curvature correction), and all-pairs self-collision cost/gradient.

Instead of m sequential FK calls crossing into an external engine, the
whole thing is one pure function over the full trajectory, vectorized
over (points × spheres × fields) and vmappable over problems.  The
self-collision gradient is reorganized so the (S×S) pair Jacobian
difference J−J₂ (orcdchomp_mod.cpp:1308-1315) is never materialized:
pair workspace gradients are reduced over partners first and mapped
through each sphere's own Jacobian once.

Numerical-robustness deviation: the reference divides the curvature
term by ‖ẋ‖² unconditionally (orcdchomp_mod.cpp:1237) which produces
inf/NaN for exactly stationary spheres; here the velocity-dependent
projection/curvature terms are gated on ‖ẋ‖ > 1e-6 (the same threshold
the reference uses for its projection guard).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from or_cdchomp_tpu.chomp.problem import ChompProblem, ChompSpec
from or_cdchomp_tpu.ops import quat as qt
from or_cdchomp_tpu.ops import spatial as sp
from or_cdchomp_tpu.ops.grid import multigrid_interp_grad

_VEL_EPS = 1e-6   # ‖ẋ‖ guard, orcdchomp_mod.cpp:1226/1285
_BASE_JAC_DAMP = 0.01  # floating-base Jacobian damping, orcdchomp_mod.cpp:1075-1080


class FieldStack(NamedTuple):
    """Padded stack of registered SDF grids (engine-level constant)."""

    data: jnp.ndarray     # (F, mx, my, mz)
    sizes: jnp.ndarray    # (F, 3) int32
    lengths: jnp.ndarray  # (F, 3)


class TrajKinematics(NamedTuple):
    """Cached per-iteration kinematic quantities (the sphere_cost_pre
    outputs, orcdchomp_mod.cpp:930-935)."""

    x_all: jnp.ndarray    # (n_points, S_act, 3) sphere world positions
    x_mov: jnp.ndarray    # (m, S_act, 3) at moving points
    vel: jnp.ndarray      # (m, S_act, 3) workspace velocities
    acc: jnp.ndarray      # (m, S_act, 3) workspace accelerations
    jac: jnp.ndarray      # (m, S_act, 3, n) sphere position Jacobians
    link_poses: jnp.ndarray  # (n_points, L, 7)
    anchors: jnp.ndarray     # (n_points, n_dof, 7)


def _base_point_jacobian(base_pose, x):
    """Floating-base 3×7 point Jacobian with the reference's damping.

    base_pose: (..., 7); x: (..., 3) world point.
    rows = Xm(−x)[3:6] @ pose_jac(base) · 0.01
    (orcdchomp_mod.cpp:1050-1086)
    """
    Jsp = sp.pose_jac(base_pose)            # (..., 6, 7)
    rx = sp.cross_mat(-x)                   # (..., 3, 3)
    lin = rx @ Jsp[..., 0:3, :] + Jsp[..., 3:6, :]
    return _BASE_JAC_DAMP * lin


def trajectory_kinematics(spec: ChompSpec, fk, T_full,
                          robot_pose=None) -> TrajKinematics:
    """FK + finite-difference workspace vel/acc over the trajectory.

    fk: CompiledFK for the (possibly frozen) robot.
    T_full: (n_points, n); robot_pose: (7,) fixed base placement for
    non-floating robots (the robot's world transform).
    """
    dt = spec.dt
    if spec.floating_base:
        base = T_full[:, :7]
        q = T_full[:, 7:]
        link_poses, anchors = fk.link_poses(q, base_pose=base)
    else:
        base = jnp.broadcast_to(robot_pose, (T_full.shape[0], 7))
        link_poses, anchors = fk.link_poses(T_full, base_pose=base)
    x_all = fk.sphere_positions(link_poses)      # (n_points, S, 3)

    arm_jac = fk.sphere_jacobians(anchors, x_all)  # (n_points, S, 3, n_adof)
    if spec.floating_base:
        base_jac = _base_point_jacobian(
            T_full[:, None, :7], x_all)            # (n_points, S, 3, 7)
        jac_all = jnp.concatenate([base_jac, arm_jac], axis=-1)
    else:
        jac_all = arm_jac

    # moving-point windows (orcdchomp_mod.cpp:1040-1046: ti_mov offset)
    if spec.start_tsr:
        x_mov = x_all[:-1]
        jac = jac_all[:-1]
    else:
        x_mov = x_all[1:-1]
        jac = jac_all[1:-1]

    # central-difference velocities/accelerations over *all* points
    # (orcdchomp_mod.cpp:1099-1127)
    internal_vel = (x_all[2:] - x_all[:-2]) / (2.0 * dt)       # (n_points-2, S, 3)
    internal_acc = (x_all[:-2] - 2.0 * x_all[1:-1] + x_all[2:]) / (dt * dt)
    if spec.start_tsr:
        v0 = (x_all[1:2] - x_all[0:1]) / dt
        vel = jnp.concatenate([v0, internal_vel], axis=0)
        acc = jnp.concatenate([internal_acc[0:1], internal_acc], axis=0)
    else:
        vel = internal_vel
        acc = internal_acc

    return TrajKinematics(
        x_all=x_all, x_mov=x_mov, vel=vel, acc=acc, jac=jac,
        link_poses=link_poses, anchors=anchors)


def obstacle_cost_grad(spec: ChompSpec, fields: FieldStack, radii,
                       prob: ChompProblem, kin: TrajKinematics,
                       want_grad: bool):
    """SDF obstacle cost + config-space gradient.

    radii: (S_act,) active sphere radii.
    Returns (cost (), wgrad (m, S, 3) or None, cost_per_sphere (m, S)).
    ``wgrad`` is the per-sphere *workspace* gradient with the ‖ẋ‖ scale
    already applied; the caller maps it through Jᵀ once, jointly with
    the self-collision workspace gradient, so the (m,S,3,n) Jacobian is
    contracted a single time (orcdchomp_mod.cpp:1243-1245 semantics).
    cost_per_sphere carries the obstacle-only per-sphere cost used by
    the curvature correction (orcdchomp_mod.cpp:1241 scales by the
    sphere cost accumulated *before* self-collision terms).
    """
    x = kin.x_mov                                # (m, S, 3)
    vel = kin.vel
    vnorm = jnp.linalg.norm(vel, axis=-1)        # (m, S)
    eps = prob.epsilon

    # per-field grid-frame query points (orcdchomp_mod.cpp:1169-1196)
    g_point = qt.pose_apply(prob.pose_gsdf_world, x[:, :, None, :])  # (m,S,F,3)
    dist_f, grad_f, _ = multigrid_interp_grad(
        fields.data, fields.sizes, fields.lengths, g_point)
    inf = jnp.asarray(jnp.inf, dist_f.dtype)
    dist_f = jnp.where(prob.field_enabled, dist_f, inf)

    # min-select across fields without gathers (TPU: reductions and an
    # iota==argmin one-hot stay on the VPU; take_along_axis would lower
    # to a serialized gather)
    best = jnp.argmin(dist_f, axis=-1)                          # (m, S)
    onehot_f = (best[..., None] ==
                jnp.arange(dist_f.shape[-1])).astype(x.dtype)   # (m, S, F)
    dist = jnp.min(dist_f, axis=-1)
    has_field = jnp.isfinite(dist)
    dist = jnp.where(has_field, dist, 0.0)

    # distance from sphere surface (orcdchomp_mod.cpp:1198)
    d = dist - radii

    # hinge cost scaled by workspace speed (orcdchomp_mod.cpp:1201-1205)
    c_in = prob.obs_factor * (0.5 * eps - d)
    c_mid = prob.obs_factor * (0.5 / eps) * (d - eps) ** 2
    cost_sphere = vnorm * jnp.where(d < 0.0, c_in,
                                    jnp.where(d < eps, c_mid, 0.0))
    cost_sphere = jnp.where(has_field, cost_sphere, 0.0)

    if not want_grad:
        return jnp.sum(cost_sphere), None, cost_sphere

    # gradient of best field, rotated to world (orcdchomp_mod.cpp:1207-1216);
    # grad_f is finite everywhere (0 where bad) so the one-hot contraction
    # is safe, and the rotation is applied per field *before* the select
    # so no (m,S)-indexed pose gather is needed
    w_grad_f = qt.pose_rotate_vec(prob.pose_world_gsdf, grad_f)  # (m, S, F, 3)
    w_grad = jnp.einsum("msfi,msf->msi", w_grad_f, onehot_f)

    # cost-slope scaling (orcdchomp_mod.cpp:1218-1223)
    slope = jnp.where(d < 0.0, -1.0, jnp.where(d < eps, d / eps - 1.0, 0.0))
    x_grad = w_grad * (slope * vnorm * prob.obs_factor)[..., None]
    x_grad = jnp.where(has_field[..., None], x_grad, 0.0)

    # remove component along the velocity (orcdchomp_mod.cpp:1225-1230)
    v2 = jnp.sum(vel * vel, axis=-1)
    safe = vnorm > _VEL_EPS
    proj = jnp.where(safe, jnp.sum(x_grad * vel, axis=-1) /
                     jnp.where(safe, v2, 1.0), 0.0)
    x_grad = x_grad - proj[..., None] * vel

    # curvature correction κ = (I − x̂x̂ᵀ)ẍ / ‖ẋ‖² (orcdchomp_mod.cpp:1232-1241)
    acc = kin.acc
    aproj = jnp.where(safe, jnp.sum(acc * vel, axis=-1) /
                      jnp.where(safe, v2, 1.0), 0.0)
    curv = (acc - aproj[..., None] * vel) * \
        jnp.where(safe, 1.0 / jnp.where(safe, v2, 1.0), 0.0)[..., None]
    x_grad = x_grad - cost_sphere[..., None] * curv

    # speed scale of the Jᵀ map (orcdchomp_mod.cpp:1243-1245), applied
    # here; the Jacobian contraction happens jointly in total_cost_grad
    return jnp.sum(cost_sphere), x_grad * vnorm[..., None], cost_sphere


def self_collision_cost_grad(spec: ChompSpec, same_link_mask, radii_act,
                             radii_all, prob: ChompProblem,
                             kin: TrajKinematics, want_grad: bool):
    """All-pairs sphere self-collision cost + gradient.

    same_link_mask: (S_act, S_all) bool — skip pairs on one link
    (orcdchomp_mod.cpp:1256).
    radii_act: (S_act,), radii_all: (S_all,) with the active block
    first, matching the reference's sphere list ordering.
    """
    x_i = kin.x_mov                                       # (m, S_act, 3)
    m = x_i.shape[0]
    if prob.inactive_pos.shape[0]:
        x_other = jnp.concatenate(
            [x_i, jnp.broadcast_to(prob.inactive_pos,
                                   (m,) + prob.inactive_pos.shape)], axis=1)
    else:
        x_other = x_i                                      # (m, S_all, 3)

    vel = kin.vel
    vnorm = jnp.linalg.norm(vel, axis=-1)                  # (m, S_act)
    eps_s = prob.epsilon_self

    v_from = x_i[:, :, None, :] - x_other[:, None, :, :]   # (m, Sa, So, 3)
    cdist = jnp.linalg.norm(v_from, axis=-1)               # (m, Sa, So)
    rsum = radii_act[:, None] + radii_all[None, :]         # (Sa, So)
    pair_ok = (~same_link_mask) & (cdist <= rsum + eps_s)

    d = cdist - rsum
    # hinge cost (orcdchomp_mod.cpp:1281-1288); the else branch has no
    # upper cutoff because pairs beyond rsum+eps_self were skipped
    c = jnp.where(d < 0.0, 0.5 * eps_s - d, (0.5 / eps_s) * (d - eps_s) ** 2)
    cost_pair = jnp.where(pair_ok, c, 0.0) * \
        (prob.obs_factor_self * vnorm)[..., None]
    cost = jnp.sum(cost_pair)

    if not want_grad:
        return cost, None

    u = v_from / jnp.maximum(cdist, 1e-12)[..., None]
    slope = jnp.where(d < 0.0, -1.0, d / eps_s - 1.0)
    g = u * (slope * (prob.obs_factor_self * vnorm)[..., None])[..., None]
    g = jnp.where(pair_ok[..., None], g, 0.0)              # (m, Sa, So, 3)

    # projection off the velocity of sphere i (orcdchomp_mod.cpp:1297-1301)
    v2 = jnp.sum(vel * vel, axis=-1)
    safe = vnorm > _VEL_EPS
    gv = jnp.sum(g * vel[:, :, None, :], axis=-1)
    proj = jnp.where(safe[..., None], gv /
                     jnp.where(safe, v2, 1.0)[..., None], 0.0)
    g = g - proj[..., None] * vel[:, :, None, :]

    # J2 = J_i − J_j mapped without materializing pair Jacobians:
    #   Σ_ij (J_i − J_j)ᵀ g_ij = Σ_s J_sᵀ (Σ_j g_sj − Σ_i g_is[active]);
    # returned as a workspace gradient for the caller's joint Jᵀ map
    s_act = x_i.shape[1]
    net = jnp.sum(g, axis=2) - jnp.sum(g[:, :, :s_act, :], axis=1)
    return cost, net, cost_pair


def total_cost_grad(spec: ChompSpec, fk, fields: FieldStack,
                    same_link_mask, radii_act, radii_all,
                    prob: ChompProblem, want_grad: bool = True):
    """Full obstacle+self cost and gradient for one problem.

    Returns (cost_obs (), G (m, n) or None, kin).  Cost and gradient
    are averaged over moving points (chomp.c:489-492).
    """
    kin = trajectory_kinematics(spec, fk, prob.traj, prob.robot_pose)
    c_obs, w_obs, _ = obstacle_cost_grad(
        spec, fields, radii_act, prob, kin, want_grad)
    out_self = self_collision_cost_grad(
        spec, same_link_mask, radii_act, radii_all, prob, kin, want_grad)
    c_self, w_self = out_self[0], out_self[1]
    cost = (c_obs + c_self) / spec.m
    if not want_grad:
        return cost, None, kin
    # single joint Jᵀ map for both workspace gradients — the (m,S,3,n)
    # Jacobian is the largest per-iteration tensor; contract it once
    G = jnp.einsum("msi,msin->mn", w_obs + w_self, kin.jac) / spec.m
    return cost, G, kin
