"""Batched spatial (6-D motion/force) vector algebra.

Parity with libcd's cd_spatial layer where the reference uses it for
floating-base sphere Jacobians and TSR constraint chains:
 - motion transform from pose        (spatial.c:71-102, xm_from_pose)
 - pose-velocity Jacobian            (spatial.c:295-337, pose_jac)
 - its pseudo-inverse                (spatial.c:339-375, pose_jac_inverse)

Spatial vectors are ordered [angular(3); linear(3)], matching the
reference's convention (rows 0-2 angular, 3-5 linear).
All functions broadcast over leading batch axes.
"""

from __future__ import annotations

import jax.numpy as jnp

from or_cdchomp_tpu.ops.quat import quat_to_R


def cross_mat(v):
    """Skew-symmetric matrix [v]x, (..., 3, 3). (spatial.c:610-637)"""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    m = jnp.stack([zero, -z, y, z, zero, -x, -y, x, zero], axis=-1)
    return m.reshape(m.shape[:-1] + (3, 3))


def xm_from_pose(pose):
    """Spatial motion transform (..., 6, 6) from pose.

    Layout (spatial.c:71-102)::

        [ R      0 ]
        [ [r]x R R ]
    """
    R = quat_to_R(pose[..., 3:])
    rx = cross_mat(pose[..., :3])
    zero = jnp.zeros_like(R)
    top = jnp.concatenate([R, zero], axis=-1)
    bottom = jnp.concatenate([rx @ R, R], axis=-1)
    return jnp.concatenate([top, bottom], axis=-2)


def pose_jac(pose):
    """Jacobian mapping pose7 derivatives to world spatial velocity.

    (..., 6, 7); rows 0-2 angular, 3-5 linear. (spatial.c:295-337)
    """
    x, y, z = pose[..., 0], pose[..., 1], pose[..., 2]
    qxt2 = 2.0 * pose[..., 3]
    qyt2 = 2.0 * pose[..., 4]
    qzt2 = 2.0 * pose[..., 5]
    qwt2 = 2.0 * pose[..., 6]
    zero = jnp.zeros_like(x)
    one = jnp.ones_like(x)
    rows = [
        # angular rows: d(omega)/d(x y z qx qy qz qw)
        [zero, zero, zero, qwt2, -qzt2, qyt2, -qxt2],
        [zero, zero, zero, qzt2, qwt2, -qxt2, -qyt2],
        [zero, zero, zero, -qyt2, qxt2, qwt2, -qzt2],
        # linear rows
        [one, zero, zero, -z * qzt2 - y * qyt2, -z * qwt2 + y * qxt2,
         z * qxt2 + y * qwt2, z * qyt2 - y * qzt2],
        [zero, one, zero, z * qwt2 + x * qyt2, -z * qzt2 - x * qxt2,
         z * qyt2 - x * qwt2, -z * qxt2 + x * qzt2],
        [zero, zero, one, -y * qwt2 + x * qzt2, y * qzt2 + x * qwt2,
         -y * qyt2 - x * qxt2, y * qxt2 - x * qyt2],
    ]
    J = jnp.stack([jnp.stack(r, axis=-1) for r in rows], axis=-2)
    return J


def pose_jac_inverse(pose):
    """Pseudo-inverse Jacobian: world spatial velocity → pose7 rates.

    (..., 7, 6). (spatial.c:339-375)
    """
    x, y, z = pose[..., 0], pose[..., 1], pose[..., 2]
    qxd2 = 0.5 * pose[..., 3]
    qyd2 = 0.5 * pose[..., 4]
    qzd2 = 0.5 * pose[..., 5]
    qwd2 = 0.5 * pose[..., 6]
    zero = jnp.zeros_like(x)
    one = jnp.ones_like(x)
    rows = [
        [zero, z, -y, one, zero, zero],
        [-z, zero, x, zero, one, zero],
        [y, -x, zero, zero, zero, one],
        [qwd2, qzd2, -qyd2, zero, zero, zero],
        [-qzd2, qwd2, qxd2, zero, zero, zero],
        [qyd2, -qxd2, qwd2, zero, zero, zero],
        [-qxd2, -qyd2, -qzd2, zero, zero, zero],
    ]
    return jnp.stack([jnp.stack(r, axis=-1) for r in rows], axis=-2)
