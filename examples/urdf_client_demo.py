"""Migration demo: URDF robot + orcdchomp sphere XML + string transport.

Shows the full reference-style workflow against the TPU build:

 1. load a robot from URDF (replacing OpenRAVE robot XML / COLLADA),
 2. attach a sphere collision model from the reference's
    ``<orcdchomp><spheres>`` XML format (orcdchomp_kdata parity),
 3. drive everything through SendCommand strings with the bound python
    client (orcdchomp.py parity) — the exact calling style of
    scripts/test_wam7.py, minus OpenRAVE.

Run:  python examples/urdf_client_demo.py
"""

from __future__ import annotations

import json

import numpy as np

URDF = """
<robot name="planar3">
  <link name="base"/>
  <link name="l1"/> <link name="l2"/> <link name="l3"/>
  <joint name="j1" type="continuous">
    <parent link="base"/> <child link="l1"/>
    <origin xyz="0 0 0.1"/> <axis xyz="0 0 1"/>
    <limit velocity="2.0"/>
  </joint>
  <joint name="j2" type="revolute">
    <parent link="l1"/> <child link="l2"/>
    <origin xyz="0.4 0 0"/> <axis xyz="0 0 1"/>
    <limit lower="-2.8" upper="2.8" velocity="2.0"/>
  </joint>
  <joint name="j3" type="revolute">
    <parent link="l2"/> <child link="l3"/>
    <origin xyz="0.35 0 0"/> <axis xyz="0 0 1"/>
    <limit lower="-2.8" upper="2.8" velocity="2.0"/>
  </joint>
</robot>
"""

# the reference's kinbody sphere annotation format
# (scripts/barrettwam_withspheres.robot.xml:22-46 style)
SPHERES_XML = """
<orcdchomp>
  <spheres>
    <sphere link="l1" pos="0.0 0.0 0.0" radius="0.08"/>
    <sphere link="l1" pos="0.2 0.0 0.0" radius="0.08"/>
    <sphere link="l2" pos="0.0 0.0 0.0" radius="0.07"/>
    <sphere link="l2" pos="0.18 0.0 0.0" radius="0.07"/>
    <sphere link="l3" pos="0.0 0.0 0.0" radius="0.06"/>
    <sphere link="l3" pos="0.15 0.0 0.0" radius="0.05"/>
  </spheres>
</orcdchomp>
"""


def main():
    import or_cdchomp_tpu as oc
    from or_cdchomp_tpu import client
    from or_cdchomp_tpu.api import KinBody, Robot
    from or_cdchomp_tpu.models.kdata import parse_spheres_xml
    from or_cdchomp_tpu.models.urdf import parse_urdf

    model = parse_urdf(URDF, use_collision_spheres=False)
    model = model.with_spheres(parse_spheres_xml(SPHERES_XML))

    world = oc.CHOMPModule()
    # the straight-line sweep grazes this pillar by ~2 cm; CHOMP bends
    # the arm's elbow to clear it
    world.add_kinbody(KinBody("pillar", oc.Scene.build(
        cylinders=[((0.95, -0.15, 0.1, 0, 0, 0, 1), 0.06, 0.12)])))
    world.add_robot(Robot("planar3", model,
                          q_active=np.array([0.4, 0.3, -0.2])))

    # reference-style client: everything below is command strings
    mod = client.SendCommandModule(world)
    client.bind(mod)

    world.robots["planar3"].enabled = False
    mod.computedistancefield(kinbody="pillar", cube_extent=0.04)
    world.robots["planar3"].enabled = True

    print("spheres:", [(n, np.round(c, 3).tolist(), r)
                       for n, c, r in world.viewspheres(robot="planar3")][:3],
          "…")

    raw = mod.runchomp(robot="planar3", adofgoal=[-0.8, 0.5, 0.4],
                       n_iter=150, lambda_=50.0, obs_factor=500.0,
                       n_points=61)  # collision check raises on failure
    traj = json.loads(raw)
    qs = np.asarray(traj["positions"])
    print(f"planned {qs.shape[0]} collision-free waypoints over "
          f"{traj['times'][-1]:.2f}s; "
          f"start {np.round(qs[0], 3).tolist()} → "
          f"goal {np.round(qs[-1], 3).tolist()}")


if __name__ == "__main__":
    main()
