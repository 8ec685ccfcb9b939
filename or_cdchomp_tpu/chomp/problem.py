"""Problem state pytrees and static solver configuration.

The reference keeps one heap-allocated ``struct run`` per CHOMP problem
(orcdchomp_mod.cpp:886-966) addressed by a pointer handle.  Here a
problem is a pytree of arrays so that thousands of problems batch into
one pytree with a leading problem axis (vmap/pjit), and the static
shape/flag information lives in a hashable ``ChompSpec`` that is baked
into the compiled computation.

Per-problem quantities include everything that may vary across a batch:
start/goal-dependent metric terms (B, Evels, trC), obstacle-field
placements, cost weights, momentum/HMC state, and the trajectory
itself.  Quantities shared across the batch (A, A⁻¹, the SDF voxel
data, the robot) are engine-level constants.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp


class ChompSpec(NamedTuple):
    """Static (compile-time) problem shape and flags."""

    n_points: int          # trajectory points incl. endpoints
    n: int                 # config dimension (7 + n_adof if floating)
    m: int                 # moving points (n_points-2, +1 with start_tsr)
    D: int = 1             # smoothness derivative order
    floating_base: bool = False
    use_momentum: bool = False
    use_hmc: bool = False
    start_tsr: bool = False
    n_fields: int = 0      # registered SDF fields
    n_spheres_active: int = 0
    n_spheres_total: int = 0

    @property
    def dt(self):
        # orcdchomp_mod.cpp:2567: dt = 1/(n_points-1)
        return 1.0 / (self.n_points - 1)


class HmcState(NamedTuple):
    """Per-problem HMC/momentum bookkeeping.

    Mirrors the GSL-based resampling in mod::iterate
    (orcdchomp_mod.cpp:2754-2768) with jax.random.
    """

    key: jnp.ndarray              # PRNG key
    resample_iter: jnp.ndarray    # next iteration to resample at (int32)
    leapfrog_first: jnp.ndarray   # bool: next momentum update is a half step


class ChompProblem(NamedTuple):
    """Per-problem dynamic state (pytree; add a leading axis to batch)."""

    traj: jnp.ndarray          # (n_points, n) full trajectory incl. endpoints
    robot_pose: jnp.ndarray    # (7,) fixed base pose (ignored if floating)
    AG: jnp.ndarray            # (m, n) momentum / Ainv-spread gradient
    B: jnp.ndarray             # (m, n) metric affine term
    Evels: jnp.ndarray         # (m, n) velocity-operator affine term
    trC: jnp.ndarray           # () smoothness cost constant
    jlimit_lower: jnp.ndarray  # (n,)
    jlimit_upper: jnp.ndarray  # (n,)
    # obstacle parameters (orcdchomp_mod.cpp:1843-1847 defaults)
    epsilon: jnp.ndarray           # ()
    epsilon_self: jnp.ndarray      # ()
    obs_factor: jnp.ndarray        # ()
    obs_factor_self: jnp.ndarray   # ()
    lambda_: jnp.ndarray           # ()
    hmc_resample_lambda: jnp.ndarray  # () exponential-dist parameter
    # rooted SDF placements (orcdchomp_mod.cpp:2347-2369)
    pose_world_gsdf: jnp.ndarray   # (F, 7)
    pose_gsdf_world: jnp.ndarray   # (F, 7)
    field_enabled: jnp.ndarray     # (F,) bool — per-problem field subset
    # fixed world positions of inactive spheres (orcdchomp_mod.cpp:2334-2345)
    inactive_pos: jnp.ndarray      # (S_inact, 3)
    # TSR constraint frames, padded to the static constraint layout
    tsr_T0w_inv: jnp.ndarray       # (C, 7) pose_table_world per constraint
    tsr_Twe_inv: jnp.ndarray       # (C, 7) pose_ee_obj per constraint
    hmc: HmcState
    iteration: jnp.ndarray         # () int32 — global iteration counter
