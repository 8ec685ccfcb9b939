"""or_cdchomp_tpu: a TPU-native CHOMP motion-planning engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
personalrobotics/or_cdchomp (OpenRAVE plugin around libcd's cd_chomp):
covariant trajectory optimization with signed-distance-field obstacle
costs, self-collision costs, TSR constraints, joint limits, HMC
restarts, and batched solves sharded over TPU device meshes.

Reference parity targets are cited throughout as ``file:line`` into the
reference tree (e.g. ``chomp.c:430-683``).
"""

__version__ = "0.1.0"

from or_cdchomp_tpu.api import CHOMPModule, KinBody, Robot  # noqa: E402,F401
from or_cdchomp_tpu.models.orxml import parse_robot_xml  # noqa: E402,F401
from or_cdchomp_tpu.models.urdf import load_urdf, parse_urdf  # noqa: E402,F401
from or_cdchomp_tpu.models.wam7 import wam7  # noqa: E402,F401
from or_cdchomp_tpu.ops.voxelize import Scene  # noqa: E402,F401
from or_cdchomp_tpu.tsr import TSR  # noqa: E402,F401
