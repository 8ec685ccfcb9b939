"""Pallas TPU kernel for batched multi-field SDF cell lookups.

The obstacle cost needs, per query point and field, the four grid cells
that drive libcd's one-sided interp/gradient (grid.c:331-454): the
center cell ``G[x,y,z]`` and one neighbor per axis ``G[x+dx,y,z]``,
``G[x,y+dy,z]``, ``G[x,y,z+dz]`` (``d∈{−1,+1}`` chosen per axis by the
query's position in the cell, edges forced inward).

The XLA fallback (ops/grid.py:_lookup_onehot) materializes a one-hot
over *all* cells per query and contracts it with 7 shifted copies of
the flat grid — ``Q·cells`` compares on the VPU plus an MXU dot with a
7-wide (7/128-utilized) N dimension.  This kernel factors the lookup
instead:

  1. one-hots over z only (``2·Q·mz`` compares),
  2. an MXU contraction ``(TQ,mz)@(mz,mx·my)`` pulling the two needed
     z-planes per query at full MXU width,
  3. three xy one-hots (``3·Q·mx·my`` compares) + VPU masked reductions
     selecting the four cells from the fetched planes.

Everything stays in VMEM per query tile; the field slab is resident
across the query grid dimension.  MXU work drops from ``7·Q·cells`` at
7/128 utilization to ``2·Q·cells`` at full utilization, and the VPU
compare volume drops by ``mz/3``-fold.

Layout contract (set by :func:`sdf_cell_lookup`):
  data  (F, mx, my, mz) padded field stack with +inf already replaced
        by a large finite value (grid.py:_BIG) so products stay finite.
  sub   (F, Q, 3) int32 clamped cell subscripts.
  nbr   (F, Q, 3) int32 clamped neighbor subscripts (sub ± dir).
Returns (F, Q, 4): [v0, vnx, vny, vnz].
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_TQ = 2048  # queries per tile (large: per-program MXU work must amortize
# Mosaic program overhead; 2 planes of (TQ, mx·my) f32 stay under ~6MB
# VMEM for typical field sizes)

# VMEM budget guard: the (mz × mx·my) slab plus two (TQ × mx·my) plane
# tiles must fit; above this cell count ops.grid falls back to gathers.
MAX_CELLS = 1 << 20


def _kernel(idx_ref, slab_ref, out_ref):
    """One (field, query-tile) program.

    slab_ref (1, mz, mx·my): field slab, z leading; column = x·my + y.
    idx_ref (1, TQ, 8) int32: columns [sz, nz, e0, ex, ey, …pad] — the
    center/neighbor z-subscripts and the flattened xy indices of the
    center, x-neighbor, and y-neighbor cells.  Queries ride the sublane
    axis throughout so no lane↔sublane relayout is ever emitted.
    out_ref (1, TQ, 4): [v0, vnx, vny, vnz].
    """
    slab = slab_ref[0, :, :]
    mz, mxmy = slab.shape
    idx = idx_ref[0, :, :]
    tq = idx.shape[0]
    dtype = slab.dtype

    zcol = jax.lax.broadcasted_iota(jnp.int32, (tq, mz), 1)
    ez = (idx[:, 0:1] == zcol).astype(dtype)       # (TQ, mz)
    ezn = (idx[:, 1:2] == zcol).astype(dtype)

    # two z-planes per query — full-width MXU contraction
    t0 = jnp.dot(ez, slab, preferred_element_type=dtype)   # (TQ, mx·my)
    tn = jnp.dot(ezn, slab, preferred_element_type=dtype)

    ccol = jax.lax.broadcasted_iota(jnp.int32, (tq, mxmy), 1)
    e0 = (idx[:, 2:3] == ccol).astype(dtype)
    exn = (idx[:, 3:4] == ccol).astype(dtype)
    eyn = (idx[:, 4:5] == ccol).astype(dtype)

    out_ref[0, :, :] = jnp.stack(
        [jnp.sum(t0 * e0, axis=1), jnp.sum(t0 * exn, axis=1),
         jnp.sum(t0 * eyn, axis=1), jnp.sum(tn * e0, axis=1)], axis=-1)


@functools.partial(jax.jit, static_argnames=("interpret",))
def sdf_cell_lookup(data, sub, nbr, *, interpret=False):
    """Four-cell lookup across F fields for Q queries.

    Args:
      data: (F, mx, my, mz) finite grid stack.
      sub:  (F, Q, 3) int32 clamped center subscripts.
      nbr:  (F, Q, 3) int32 clamped per-axis neighbor subscripts.
      interpret: run in interpreter mode (CPU tests).

    Returns:
      (v0, vnx, vny, vnz), each (F, Q) in ``data.dtype`` — kept as
      separate arrays so no lane↔sublane relayout is ever needed.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    f, mx, my, mz = data.shape
    q = sub.shape[1]
    dtype = data.dtype

    qpad = -q % _TQ
    if qpad:
        sub = jnp.pad(sub, ((0, 0), (0, qpad), (0, 0)))
        nbr = jnp.pad(nbr, ((0, 0), (0, qpad), (0, 0)))
    qp = q + qpad
    ntiles = qp // _TQ

    # z-leading slab: (F, mz, mx·my), column = x·my + y
    slab = jnp.transpose(data, (0, 3, 1, 2)).reshape(f, mz, mx * my)

    idx = jnp.stack([
        sub[..., 2],                        # sz
        nbr[..., 2],                        # nz
        sub[..., 0] * my + sub[..., 1],     # e0
        nbr[..., 0] * my + sub[..., 1],     # ex
        sub[..., 0] * my + nbr[..., 1],     # ey
        jnp.zeros_like(sub[..., 0]),
        jnp.zeros_like(sub[..., 0]),
        jnp.zeros_like(sub[..., 0]),
    ], axis=-1)                             # (F, Qp, 8)

    out = pl.pallas_call(
        _kernel,
        grid=(f, ntiles),
        in_specs=[
            pl.BlockSpec((1, _TQ, 8), lambda fi, qi: (fi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, mz, mx * my), lambda fi, qi: (fi, 0, 0),
                         memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, _TQ, 4), lambda fi, qi: (fi, qi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((f, qp, 4), dtype),
        interpret=interpret,
    )(idx, slab)

    out = out[:, :q]
    return out[..., 0], out[..., 1], out[..., 2], out[..., 3]
