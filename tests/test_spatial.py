"""Spatial-algebra tests: pose_jac vs finite differences, inverse."""

import numpy as np
import jax.numpy as jnp

from or_cdchomp_tpu.ops import quat as qt
from or_cdchomp_tpu.ops import spatial as sp

RNG = np.random.default_rng(1)


def rand_pose():
    q = RNG.normal(size=4)
    q /= np.linalg.norm(q)
    return np.concatenate([RNG.normal(size=3), q])


def test_pose_jac_inverse_is_right_inverse():
    """pose_jac (6×7) ∘ pose_jac_inverse (7×6) = I₆ for unit-quat poses
    (spatial.c:295-375)."""
    for _ in range(5):
        p = jnp.asarray(rand_pose())
        J = np.asarray(sp.pose_jac(p))
        Jinv = np.asarray(sp.pose_jac_inverse(p))
        np.testing.assert_allclose(J @ Jinv, np.eye(6), atol=1e-9)


def test_pose_jac_semantics():
    """Angular rows: ω = 2·q̇·q⁻¹ (vector part).  Linear rows:
    v = ṗ − ω×p — spatial velocity of the body-fixed point at the
    world origin (spatial.c:295-337)."""
    p = rand_pose()
    J = np.asarray(sp.pose_jac(jnp.asarray(p[None])))[0]
    q = p[3:]
    # angular columns: per quat component k, ω_k = 2 · (e_k ⊗ q⁻¹)_vec
    for k in range(4):
        dq = np.zeros(4)
        dq[k] = 1.0
        om = 2.0 * np.asarray(qt.quat_compose(
            jnp.asarray(dq[None]), qt.quat_invert(jnp.asarray(q[None]))))[0, :3]
        np.testing.assert_allclose(J[:3, 3 + k], om, atol=1e-12)
    np.testing.assert_allclose(J[:3, :3], 0, atol=1e-12)
    # linear block: identity for position, −ω×p for quat columns
    np.testing.assert_allclose(J[3:, :3], np.eye(3), atol=1e-12)
    pred = -np.cross(J[:3, 3:].T, p[:3]).T
    np.testing.assert_allclose(J[3:, 3:], pred, atol=1e-12)


def test_xm_from_pose_blocks():
    p = jnp.asarray(rand_pose())
    X = np.asarray(sp.xm_from_pose(p))
    R = np.asarray(qt.quat_to_R(p[3:]))
    np.testing.assert_allclose(X[:3, :3], R, atol=1e-12)
    np.testing.assert_allclose(X[3:, 3:], R, atol=1e-12)
    np.testing.assert_allclose(X[:3, 3:], 0, atol=1e-12)
    rx = np.asarray(sp.cross_mat(p[:3]))
    np.testing.assert_allclose(X[3:, :3], rx @ R, atol=1e-12)
