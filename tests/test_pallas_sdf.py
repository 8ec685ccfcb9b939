"""Parity of the Pallas SDF lookup kernel vs the XLA paths.

The kernel runs in interpreter mode on CPU; results must match the
one-hot and gather backends of multigrid_interp_grad bit-for-bit in
float32 (all three compute the same 4-cell selection).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from or_cdchomp_tpu.ops.grid import multigrid_interp_grad, pad_stack_grids
from or_cdchomp_tpu.ops.grid import Grid3D
from or_cdchomp_tpu.ops.pallas_sdf import sdf_cell_lookup


def _mk_fields(rng):
    g1 = Grid3D(data=jnp.asarray(rng.normal(size=(6, 9, 5)),
                                 dtype=jnp.float32),
                lengths=jnp.asarray([0.6, 0.9, 0.5], dtype=jnp.float32))
    d2 = rng.normal(size=(8, 4, 7)).astype(np.float32)
    d2[2, 1, 3] = np.inf   # HUGE_VAL interior cell
    g2 = Grid3D(data=jnp.asarray(d2),
                lengths=jnp.asarray([0.8, 0.4, 0.7], dtype=jnp.float32))
    return pad_stack_grids([g1, g2])


@pytest.mark.parametrize("shape", [(11,), (3, 5)])
def test_lookup_matches_onehot_and_gather(shape):
    rng = np.random.default_rng(0)
    data, sizes, lengths = _mk_fields(rng)
    f = data.shape[0]
    # points spanning inside, near-edge, and out-of-bounds
    p = rng.uniform(-0.2, 1.1, size=shape + (f, 3)).astype(np.float32) \
        * np.asarray(lengths)
    p = jnp.asarray(p)

    v_p, g_p, b_p = multigrid_interp_grad(data, sizes, lengths, p,
                                          method="pallas_interpret")
    v_o, g_o, b_o = multigrid_interp_grad(data, sizes, lengths, p,
                                          method="onehot")
    v_g, g_g, b_g = multigrid_interp_grad(data, sizes, lengths, p,
                                          method="gather")

    np.testing.assert_array_equal(np.asarray(b_p), np.asarray(b_o))
    np.testing.assert_array_equal(np.asarray(b_p), np.asarray(b_g))
    np.testing.assert_allclose(np.asarray(v_p), np.asarray(v_o), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_o), rtol=1e-6)
    # gather path keeps true inf; values/grads agree where finite
    fin = np.isfinite(np.asarray(v_g))
    np.testing.assert_array_equal(fin, np.isfinite(np.asarray(v_p)))
    np.testing.assert_allclose(np.asarray(v_p)[fin], np.asarray(v_g)[fin],
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_g),
                               rtol=1e-5, atol=1e-5)


def test_all_occupied_field_not_contained_all_backends():
    """An all-occupied grid has an empty free-space EDT → every cell is
    −inf.  All backends must report such queries as "field does not
    contain the point" (+inf value, zero gradient) rather than leaking
    −inf (infinite obstacle cost) or +BIG (treated as far away)."""
    g = Grid3D(data=jnp.full((4, 5, 3), -jnp.inf, dtype=jnp.float32),
               lengths=jnp.asarray([0.4, 0.5, 0.3], dtype=jnp.float32))
    data, sizes, lengths = pad_stack_grids([g])
    p = jnp.asarray([[0.2, 0.25, 0.15], [0.05, 0.45, 0.29]],
                    dtype=jnp.float32)[:, None, :]
    for method in ("onehot", "gather", "pallas_interpret"):
        v, gr, inb = multigrid_interp_grad(data, sizes, lengths, p,
                                           method=method)
        assert np.asarray(inb).all(), method
        assert np.isposinf(np.asarray(v)).all(), method
        np.testing.assert_array_equal(np.asarray(gr), 0.0, err_msg=method)


def test_cell_lookup_raw():
    """sdf_cell_lookup returns exactly the addressed cells."""
    rng = np.random.default_rng(1)
    f, mx, my, mz = 2, 5, 6, 7
    data = jnp.asarray(rng.normal(size=(f, mx, my, mz)), dtype=jnp.float32)
    qn = 23
    sub = rng.integers(0, [mx, my, mz], size=(f, qn, 3)).astype(np.int32)
    dirs = rng.choice([-1, 1], size=(f, qn, 3))
    nbr = np.clip(sub + dirs, 0, np.array([mx, my, mz]) - 1).astype(np.int32)

    out = np.stack([np.asarray(v) for v in sdf_cell_lookup(
        data, jnp.asarray(sub), jnp.asarray(nbr), interpret=True)], axis=-1)
    d = np.asarray(data)
    for fi in range(f):
        for qi in range(qn):
            x, y, z = sub[fi, qi]
            xn, yn, zn = nbr[fi, qi]
            np.testing.assert_allclose(
                out[fi, qi],
                [d[fi, x, y, z], d[fi, xn, y, z],
                 d[fi, x, yn, z], d[fi, x, y, zn]], rtol=1e-6)
