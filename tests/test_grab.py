"""Grabbed-body handling: spheres re-root to the grabbing link and the
body stops being a world obstacle (orcdchomp_mod.cpp:2200-2208)."""

import numpy as np
import jax.numpy as jnp

import or_cdchomp_tpu as oc
from or_cdchomp_tpu.api import KinBody, Robot
from or_cdchomp_tpu.models.robot import CompiledFK


def _setup():
    mod = oc.CHOMPModule()
    mod.add_kinbody(KinBody("table", oc.Scene.build(
        boxes=[((0.5, 0.0, 0.6, 0, 0, 0, 1), (0.25, 0.35, 0.03))])))
    r = Robot("wam", oc.wam7(),
              q_active=np.array([2.5, -1.8, 0.0, 2.0, 0.0, 0.2, 0.0]))
    mod.add_robot(r)
    return mod, r


def test_grab_appends_spheres_and_moves_with_link():
    mod, r = _setup()
    n0 = len(r.model.sphere_radius)
    mug = KinBody("mug", oc.Scene.build(spheres=[((0.0, 0.0, 0.05), 0.04)]))
    # place the mug exactly at the last link's current world origin
    fk = CompiledFK(r.model)
    lp, _ = fk.link_poses(jnp.asarray(r.q_active, dtype=fk.dtype),
                          base_pose=jnp.asarray(r.pose, dtype=fk.dtype))
    ee = np.asarray(lp)[-1].astype(np.float64)
    mug.pose = ee.copy()
    mod.add_kinbody(mug)

    last_link = r.model.link_names[-1]
    r.grab(mug, last_link)
    assert len(r.model.sphere_radius) == n0 + 1
    assert mug.grabbed_by == "wam"
    # its sphere now tracks the link
    x, rad = r.sphere_world()
    np.testing.assert_allclose(rad[-1], 0.04, atol=1e-6)
    # move the joints; the grabbed sphere must move too
    x_before = x[-1].copy()
    r.q_active = r.q_active + 0.3
    x2, _ = r.sphere_world()
    assert np.linalg.norm(x2[-1] - x_before) > 1e-3

    # grabbed body is excluded from the obstacle world
    scenes, poses = mod._world_occupancy_scene("table")
    # only the robot's own sphere scene remains (mug excluded)
    assert len(scenes) == 1

    r.release(mug)
    assert len(r.model.sphere_radius) == n0
    assert mug.grabbed_by is None


def test_grab_twice_raises():
    mod, r = _setup()
    mug = KinBody("mug", oc.Scene.build(spheres=[((0, 0, 0), 0.03)]))
    mod.add_kinbody(mug)
    r.grab(mug, r.model.link_names[-1])
    try:
        r.grab(mug, r.model.link_names[-1])
        assert False, "expected RuntimeError"
    except RuntimeError:
        pass


def test_bounding_spheres_cover_primitives():
    sc = oc.Scene.build(
        boxes=[((1.0, 0, 0, 0, 0, 0, 1), (0.1, 0.2, 0.3))],
        spheres=[((0, 1.0, 0), 0.5)],
        cylinders=[((0, 0, 2.0, 0, 0, 0, 1), 0.2, 0.4)])
    centers, radii = sc.bounding_spheres()
    assert centers.shape == (3, 3)
    np.testing.assert_allclose(radii[0], 0.5)                      # sphere
    np.testing.assert_allclose(radii[1], np.linalg.norm([0.1, 0.2, 0.3]))
    np.testing.assert_allclose(radii[2], np.hypot(0.2, 0.4))
