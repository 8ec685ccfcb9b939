"""Equivalence of the Pallas self-collision kernel (pair-block
skipping) with the dense XLA SoA path, in interpreter mode on CPU.

The two backends must agree exactly on cost and net gradient for
arbitrary sphere configurations — including pairs straddling the
rsum+ε_self reach boundary, same-link exclusions, inactive spheres,
stationary spheres (‖ẋ‖=0 guard), and non-tile-aligned m/B.
"""

import numpy as np
import pytest

import jax.numpy as jnp

import or_cdchomp_tpu.chomp.cost_soa as cost_soa


def _rand_case(rng, m, Sa, SI, B, scale=0.25):
    """Random positions clustered enough that some pairs collide."""
    x = tuple(jnp.asarray(rng.normal(size=(m, Sa, B)) * scale)
              for _ in range(3))
    vel = tuple(jnp.asarray(rng.normal(size=(m, Sa, B))) for _ in range(3))
    radii_act = jnp.asarray(rng.uniform(0.03, 0.1, size=Sa))
    radii_all = jnp.concatenate(
        [radii_act, jnp.asarray(rng.uniform(0.03, 0.1, size=SI))])
    same = np.zeros((Sa, Sa + SI), dtype=bool)
    # the diagonal is always same-link (sphere vs itself), as in any
    # real model's mask; plus a couple of cross exclusions
    same[:, :Sa] |= np.eye(Sa, dtype=bool)
    same[0, 1] = same[1, 0] = True
    if SI:
        same[2, Sa] = True

    class P:
        inactive_pos = jnp.asarray(rng.normal(size=(B, SI, 3)) * scale)
        epsilon_self = jnp.asarray(rng.uniform(0.02, 0.08, size=B))
        obs_factor_self = jnp.asarray(rng.uniform(5.0, 20.0, size=B))

    return x, vel, jnp.asarray(same), radii_act, radii_all, P


@pytest.mark.parametrize("mode", ["pallas_interpret",
                                  "pallas_dense_interpret"])
@pytest.mark.parametrize("m,Sa,SI,B", [
    (16, 8, 0, 128),     # tile-aligned, no inactive
    (11, 6, 2, 64),      # ragged m, ragged B, inactive spheres
    (8, 16, 1, 128),     # WAM7-like shape
])
def test_pallas_matches_xla(m, Sa, SI, B, mode):
    rng = np.random.default_rng(m * 1000 + Sa * 10 + SI + B)
    x, vel, same, radii_act, radii_all, P = _rand_case(rng, m, Sa, SI, B)
    vnorm = jnp.sqrt(sum(c * c for c in vel))
    v2 = sum(c * c for c in vel)
    safe = vnorm > 1e-6

    c_x, net_x = cost_soa._selfcol_soa(
        None, same, radii_act, radii_all, P, x, vel, vnorm, v2, safe,
        method="xla")
    c_p, net_p = cost_soa._selfcol_soa(
        None, same, radii_act, radii_all, P, x, vel, vnorm, v2, safe,
        method="pallas_interpret")

    np.testing.assert_allclose(np.asarray(c_p), np.asarray(c_x),
                               rtol=1e-6, atol=1e-8)
    for a, b in zip(net_p, net_x):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_pallas_stationary_spheres():
    """Exactly stationary spheres (vel = 0): the ‖ẋ‖ guard zeroes both
    cost and w2 identically in both backends."""
    rng = np.random.default_rng(7)
    m, Sa, SI, B = 8, 4, 0, 128
    x, vel, same, radii_act, radii_all, P = _rand_case(rng, m, Sa, SI, B)
    vel = tuple(jnp.zeros_like(v) for v in vel)
    vnorm = jnp.zeros_like(x[0])
    v2 = jnp.zeros_like(x[0])
    safe = vnorm > 1e-6
    c_x, net_x = cost_soa._selfcol_soa(
        None, same, radii_act, radii_all, P, x, vel, vnorm, v2, safe,
        method="xla")
    c_p, net_p = cost_soa._selfcol_soa(
        None, same, radii_act, radii_all, P, x, vel, vnorm, v2, safe,
        method="pallas_interpret")
    np.testing.assert_allclose(np.asarray(c_p), np.asarray(c_x), atol=1e-9)
    for a, b in zip(net_p, net_x):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-9)


def test_pallas_far_apart_all_skipped():
    """Spheres far beyond reach: every block skips, outputs exactly 0."""
    m, Sa, SI, B = 8, 4, 0, 128
    rng = np.random.default_rng(3)
    # spread spheres kilometers apart
    x = tuple(jnp.asarray(
        rng.normal(size=(m, Sa, B)) * 0.01
        + 1000.0 * np.arange(Sa)[None, :, None] * (c == 0))
        for c in range(3))
    vel = tuple(jnp.asarray(rng.normal(size=(m, Sa, B))) for _ in range(3))
    radii_act = jnp.full(Sa, 0.05)
    radii_all = radii_act
    same = jnp.asarray(np.eye(Sa, dtype=bool))

    class P:
        inactive_pos = jnp.zeros((B, 0, 3))
        epsilon_self = jnp.full(B, 0.04)
        obs_factor_self = jnp.full(B, 10.0)

    vnorm = jnp.sqrt(sum(c * c for c in vel))
    c_p, net_p = cost_soa._selfcol_soa(
        None, same, radii_act, radii_all, P, x, vel, vnorm,
        vnorm * vnorm, vnorm > 1e-6, method="pallas_interpret")
    assert float(jnp.max(jnp.abs(c_p))) == 0.0
    for a in net_p:
        assert float(jnp.max(jnp.abs(a))) == 0.0
