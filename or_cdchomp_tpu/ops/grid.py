"""3-D value grids with libcd-compatible lookup / interp / gradient.

The reference grid engine (src/libcd/grid.c) stores row-major N-d cell
data over a box ``[0, lengths]`` with cell centers at
``(0.5+sub)/size*length`` and implements

 - point → cell index lookup          (grid.c:191-209)
 - per-axis one-sided finite-difference gradient (grid.c:331-384)
 - first-order Taylor "interp" from the cell center using that same
   one-sided gradient                 (grid.c:386-454)

This module reimplements those exact semantics as batched gather-based
JAX functions: each query point costs 4 gathers (center cell + one
neighbor per axis), fully vectorized over (problems × waypoints ×
spheres × fields).  The planner only ever uses 3-d grids
(orcdchomp_mod.cpp:297-722), so the TPU build is specialized to 3-d.

Grids are pytrees (`Grid3D`) so they live in HBM and flow through jit.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


class Grid3D(NamedTuple):
    """A single 3-d grid. ``data`` has shape (nx, ny, nz)."""

    data: jnp.ndarray      # (nx, ny, nz) float
    lengths: jnp.ndarray   # (3,) float, side lengths in grid frame

    @property
    def sizes(self):
        return self.data.shape

    @classmethod
    def create(cls, sizes, lengths, fill=0.0, dtype=jnp.float32):
        data = jnp.full(tuple(int(s) for s in sizes), fill, dtype=dtype)
        return cls(data=data, lengths=jnp.asarray(lengths, dtype=dtype))

    def cell_extents(self):
        """Per-axis cell side length."""
        sizes = jnp.asarray(self.data.shape, dtype=self.lengths.dtype)
        return self.lengths / sizes

    def center_of_index(self, subs):
        """Grid-frame position of cell center(s); subs (..., 3) int.

        (grid.c:160-190)
        """
        sizes = jnp.asarray(self.data.shape, dtype=self.lengths.dtype)
        return (subs.astype(self.lengths.dtype) + 0.5) / sizes * self.lengths

    def all_centers(self):
        """Grid-frame positions of every cell center, shape (nx,ny,nz,3)."""
        nx, ny, nz = self.data.shape
        ii, jj, kk = jnp.meshgrid(
            jnp.arange(nx), jnp.arange(ny), jnp.arange(nz), indexing="ij"
        )
        subs = jnp.stack([ii, jj, kk], axis=-1)
        return self.center_of_index(subs)


def _lookup_subs(sizes_f, lengths, p):
    """Point(s) → (subs, in_bounds).  Mirrors grid.c:191-228: x=p/len,
    reject outside [0,1], sub=floor(x*size) clamped to size-1."""
    x = p / lengths
    in_bounds = jnp.all((x >= 0.0) & (x <= 1.0), axis=-1)
    sub = jnp.floor(x * sizes_f).astype(jnp.int32)
    sub = jnp.clip(sub, 0, sizes_f.astype(jnp.int32) - 1)
    return sub, in_bounds


def grid_interp_grad(data, lengths, p):
    """libcd-semantics interp + gradient at grid-frame point(s) p.

    Args:
      data: (nx, ny, nz) grid values.
      lengths: (3,) grid side lengths.
      p: (..., 3) query points in the grid frame.

    Returns:
      (value, grad, in_bounds): value (...,), grad (..., 3) w.r.t. the
      grid frame, in_bounds (...,) bool.  Out-of-bounds queries return
      value=+inf, grad=0 (callers treat them as "field does not contain
      the point", orcdchomp_mod.cpp:1179-1182).

    Per axis the gradient uses the previous cell if ``p`` is left of the
    cell center (next cell otherwise), with edge cells forced inward —
    exactly grid.c:331-454.  The interp value is the cell-center value
    plus the one-sided gradient times the offset from the center.
    """
    shape = data.shape
    sizes_f = jnp.asarray(shape, dtype=p.dtype)
    sub, in_bounds = _lookup_subs(sizes_f, lengths, p)

    center = (sub.astype(p.dtype) + 0.5) / sizes_f * lengths
    # Choose neighbor direction per axis: True → use next (sub, sub+1),
    # False → use previous (sub-1, sub).  Edge handling first.
    sizes_i = jnp.asarray(shape, dtype=jnp.int32)
    use_next = p >= center
    use_next = jnp.where(sub == 0, True, use_next)
    use_next = jnp.where(sub == sizes_i - 1, False, use_next)

    flat = data.reshape(-1)
    sy, sz = shape[1], shape[2]

    def flat_idx(s):
        return (s[..., 0] * sy + s[..., 1]) * sz + s[..., 2]

    v0 = jnp.take(flat, flat_idx(sub), mode="clip")

    # neighbor index per axis (offset ±1 along that axis only)
    offs = jnp.where(use_next, 1, -1)  # (..., 3)
    grads = []
    any_inf = jnp.isinf(v0)
    for axis in range(3):
        nb = sub.at[..., axis].add(offs[..., axis])
        vn = jnp.take(flat, flat_idx(nb), mode="clip")
        any_inf = any_inf | jnp.isinf(vn)
        # diff oriented low→high: next ⇒ vn - v0 ; prev ⇒ v0 - vn
        diff = jnp.where(use_next[..., axis], vn - v0, v0 - vn)
        grads.append(diff * sizes_f[axis] / lengths[axis])
    grad = jnp.stack(grads, axis=-1)

    value = v0 + jnp.sum(grad * (p - center), axis=-1)
    inf = jnp.asarray(jnp.inf, dtype=value.dtype)
    # HUGE_VAL propagation (grid.c:405-406, 430-431, 438-439): a query
    # touching an infinite cell reports +inf — "field does not contain"
    bad = ~in_bounds | any_inf
    value = jnp.where(bad, inf, value)
    grad = jnp.where(bad[..., None], 0.0, grad)
    return value, grad, in_bounds


def grid_interp(data, lengths, p):
    """Interp only (same semantics as grid_interp_grad)."""
    value, _, in_bounds = grid_interp_grad(data, lengths, p)
    return value, in_bounds


def pad_stack_grids(grids: list[Grid3D]):
    """Stack variable-size grids into padded arrays for jit-friendly
    multi-field lookups.

    Returns (data (F, mx, my, mz), sizes (F, 3) int32, lengths (F, 3)).
    Padding cells are +inf so they can never win a min-select, and the
    true ``sizes`` keep index arithmetic exact.
    """
    f = len(grids)
    shapes = np.array([g.data.shape for g in grids], dtype=np.int32)
    mx, my, mz = shapes.max(axis=0)
    data = np.full((f, mx, my, mz), np.inf, dtype=np.float32)
    lengths = np.zeros((f, 3), dtype=np.float32)
    for i, g in enumerate(grids):
        sx, sy, sz = g.data.shape
        data[i, :sx, :sy, :sz] = np.asarray(g.data, dtype=np.float32)
        lengths[i] = np.asarray(g.lengths, dtype=np.float32)
    return jnp.asarray(data), jnp.asarray(shapes), jnp.asarray(lengths)


# Cells threshold for the one-hot-matmul lookup path: per-query work is
# O(cells), so very large grid stacks fall back to gathers.  Up to this
# size the MXU contraction is far faster than XLA's TPU gather lowering
# (which serializes element gathers; measured 6.7x on the WAM7 bench
# shape, and the gap grows with query count).
ONEHOT_MAX_CELLS = 262144

# Finite stand-in for ±inf inside the matmul path: inf would turn the
# one-hot dot into 0*inf = NaN.  Half of it is still far beyond any real
# signed distance, and BIG*1.0 survives f32 rounding exactly.  The
# substitution preserves sign: −inf cells (all-occupied grids, where
# the free-space EDT is empty) must stay detectable as infinite — every
# backend then reports such queries as "field does not contain the
# point" (+inf value, zero gradient), the HUGE_VAL convention of
# grid.c:405-439 / orcdchomp_mod.cpp:1179-1182.
# numpy, not jnp: a module-level jnp scalar would initialize the XLA
# backend at import time, breaking jax.distributed.initialize for
# multi-process users (multihost.initialize must run first)
_BIG = np.float32(1e30)


def _definite(data):
    """Replace ±inf cells by ±_BIG (sign-preserving, matmul-safe)."""
    return jnp.where(jnp.isinf(data),
                     jnp.sign(data) * _BIG.astype(data.dtype), data)


def _lookup_onehot(flat, idx, strides, dtype):
    """values[..., 7] = flat at [idx, idx±sx, idx±sy, idx±sz] via a
    one-hot × shifted-flats matmul (TPU: MXU contraction instead of a
    serialized gather; the one-hot tile is fused, never HBM-resident).

    Column order: center, x+1, x-1, y+1, y-1, z+1, z-1.
    """
    sx, sy, sz = strides
    flat = _definite(flat)
    # roll(-s)[i] = flat[i+s]; wrapped rows are never selected because
    # edge cells force the inward neighbor (use_next flips at borders)
    fmat = jnp.stack([flat,
                      jnp.roll(flat, -sx), jnp.roll(flat, sx),
                      jnp.roll(flat, -sy), jnp.roll(flat, sy),
                      jnp.roll(flat, -sz), jnp.roll(flat, sz)], axis=-1)
    shape = idx.shape
    qi = idx.reshape(-1)
    cells = flat.shape[0]
    w = (qi[:, None] == jnp.arange(cells, dtype=jnp.int32)[None, :])
    vals = jnp.dot(w.astype(dtype), fmat.astype(dtype),
                   preferred_element_type=dtype)
    return vals.reshape(shape + (7,))


def _lookup_gather(flat, idx, strides, dtype):
    """Same contract as :func:`_lookup_onehot` via plain gathers (exact
    +inf propagation; used for very large grids and on CPU)."""
    sx, sy, sz = strides
    cols = [idx, idx + sx, idx - sx, idx + sy, idx - sy, idx + sz, idx - sz]
    return jnp.stack([jnp.take(flat, c, mode="clip") for c in cols], axis=-1)


# lane width of the two-sided one-hot factorization (env override for
# A/B tuning only; 256 measured best on the bench shapes)
import os as _os

_ONEHOT2_L = int(_os.environ.get("CDX_ONEHOT2_L", "256"))
# lane width of the 4-gather qlanes form (ops measured on the config-1
# step, round 4: L=64 → 3517 solves/s vs 2991 at L=256; the 7-table
# form still prefers 256 — see BENCHMARKS.md A/B)
_ONEHOT2_L4 = int(_os.environ.get("CDX_ONEHOT2_L4", "64"))
# qlanes lookup backend A/B knob: "onehot2" (default) | "take"
_QLANES_METHOD = _os.environ.get("CDX_QLANES_METHOD", "onehot2")


def _lookup_onehot2(flat, idx, strides, dtype):
    """Two-sided one-hot lookup: same contract as :func:`_lookup_onehot`
    but factored as idx = hi·L + lo so the heavy contraction is a real
    (Q, L) @ (L, 7·H) MXU matmul followed by a cheap (Q, H)-sized
    hi-select — instead of a (Q, cells) one-hot that XLA rewrites into
    a serialized gather (measured 1.47 ms of a 2.27 ms step on the
    batch-256 WAM7 bench; this form cuts it to the MXU's matmul time).

    Selection through a one-hot is exact in any float dtype: the result
    row sums one exact table value and L−1 zeros.
    """
    sx, sy, sz = strides
    flat = _definite(flat)
    L = _ONEHOT2_L
    cells = flat.shape[0]
    H = -(-cells // L)
    pad = H * L - cells
    # shifted tables first, then pad: wrapped/padding positions are
    # never selected (edge cells force the inward neighbor)
    fmat7 = jnp.stack([flat,
                       jnp.roll(flat, -sx), jnp.roll(flat, sx),
                       jnp.roll(flat, -sy), jnp.roll(flat, sy),
                       jnp.roll(flat, -sz), jnp.roll(flat, sz)], axis=0)
    if pad:
        fmat7 = jnp.pad(fmat7, ((0, 0), (0, pad)),
                        constant_values=_BIG.astype(flat.dtype) / 2)
    # D[l, n·H + h] = table_n[h·L + l]
    D = fmat7.reshape(7, H, L).transpose(2, 0, 1).reshape(L, 7 * H)

    shape = idx.shape
    qi = idx.reshape(-1)
    hi = qi // L
    lo = qi - hi * L
    # NB: a split-bf16 two-pass variant (exact one-hots, D split into
    # bf16 value+residual) was measured 2.4x SLOWER end to end — the
    # second dot breaks XLA's fusion of the hi-select into the matmul
    # consumer and the (Q, 7H) intermediates hit HBM twice.  The single
    # dot below stays fused and exact.
    oh_lo = (lo[:, None] == jnp.arange(L, dtype=jnp.int32)[None, :]
             ).astype(dtype)
    T = jnp.dot(oh_lo, D.astype(dtype),
                preferred_element_type=dtype)            # (Q, 7·H)
    oh_hi = (hi[:, None] == jnp.arange(H, dtype=jnp.int32)[None, :]
             ).astype(dtype)
    vals = jnp.sum(T.reshape(-1, 7, H) * oh_hi[:, None, :], axis=-1)
    return vals.reshape(shape + (7,))


def _lookup_onehot2_qlanes(flat, idx, strides, dtype):
    """Transposed two-sided one-hot lookup: same values as
    :func:`_lookup_onehot2` but returned as (7, Q) with queries on the
    minor (lane) axis — the layout the SoA batch-native cost path wants,
    so no (Q, 7) → (7, Q) relayout copy ever materializes.  The heavy
    contraction is (7H, L) @ (L, Q) on the MXU; the hi-select reduces
    the H axis (non-minor) at full lane width.
    """
    sx, sy, sz = strides
    flat = _definite(flat)
    # keep the minor (batch) axis un-merged so dp sharding propagates
    # (see _onehot2_lookup_qlanes_one); query shape (mS, B) for 3-d idx
    qi0 = (idx.reshape((-1, idx.shape[-1])) if idx.ndim >= 2
           else idx.reshape(-1))
    if _QLANES_METHOD == "take":
        idx7 = jnp.stack([qi0, qi0 + sx, qi0 - sx, qi0 + sy, qi0 - sy,
                          qi0 + sz, qi0 - sz])
        return jnp.take(flat, idx7, mode="clip").astype(dtype)
    L = _ONEHOT2_L
    cells = flat.shape[0]
    H = -(-cells // L)
    pad = H * L - cells
    fmat7 = jnp.stack([flat,
                       jnp.roll(flat, -sx), jnp.roll(flat, sx),
                       jnp.roll(flat, -sy), jnp.roll(flat, sy),
                       jnp.roll(flat, -sz), jnp.roll(flat, sz)], axis=0)
    if pad:
        fmat7 = jnp.pad(fmat7, ((0, 0), (0, pad)),
                        constant_values=_BIG.astype(flat.dtype) / 2)
    # A[(j·H + h), l] = table_j[h·L + l]
    A = fmat7.reshape(7 * H, L)

    qi = qi0
    hi = qi // L
    lo = qi - hi * L
    # NB a bf16-split two-dot variant (A = bf16(A) + bf16(A − bf16(A)),
    # exact one-hots) was measured 3.3x SLOWER end to end: XLA rewrites
    # the single one-hot dot into an internal gather (~100x fewer
    # FLOPs), and the split defeats that rewrite, forcing two real
    # dense matmuls.  Keep the single dot in the compute dtype.
    lane = jnp.arange(L, dtype=jnp.int32).reshape((L,) + (1,) * qi.ndim)
    oh_lo = (lane == lo[None]).astype(dtype)                   # (L, *Q)
    T = jnp.tensordot(A.astype(dtype), oh_lo,
                      axes=([1], [0]))                         # (7H, *Q)
    row = jnp.arange(H, dtype=jnp.int32).reshape((H,) + (1,) * qi.ndim)
    oh_hi = (row == hi[None]).astype(dtype)                    # (H, *Q)
    return jnp.sum(T.reshape((7, H) + qi.shape) * oh_hi[None],
                   axis=1)                                     # (7, *Q)


# bf16 hi/lo two-dot variant of the 4-gather lookup (A/B knob): each
# selection is exact per part and f32-accumulated; the reconstruction
# error of A_hi + A_lo is ~4e-6 relative (double-bf16).  Measured
# 1375/3314/2485 solves/s at L=64/128/256 vs 4161 for the f32 single
# dot — the split defeats XLA's internal gather rewrite (same failure
# as the round-3 7-table variant).  Kept off.
_LOOKUP4_BF16 = _os.environ.get("CDX_LOOKUP4_BF16", "0") == "1"


def _onehot2_lookup_qlanes_one(flat_def, qi, dtype):
    """One gathered value per query via the two-sided one-hot form:
    (H, L) @ (L, *Q) + hi-select.  ``flat_def`` must already be padded
    to H·L and inf-replaced.

    ``qi`` may have ANY rank; the query axes are never merged.  This
    matters for sharding: the SoA caller passes (m·S, B) with the
    problem batch B sharded on the last axis — a flat reshape to (Q,)
    would merge the sharded (minor) axis and force XLA to all-gather
    the indices and run the lookup dot fully replicated on every
    device (measured: 4 per-iteration all-gathers + [36, full-Q] dots
    under a (hosts, dp) mesh, benchmarks/pod_model.py round 5).
    Returns qi.shape."""
    L = _ONEHOT2_L4
    H = flat_def.shape[0] // L
    A = flat_def.reshape(H, L)
    hi = qi // L
    lo = qi - hi * L
    lane = jnp.arange(L, dtype=jnp.int32).reshape(
        (L,) + (1,) * qi.ndim)
    if _LOOKUP4_BF16 and dtype == jnp.float32:
        A32 = A.astype(jnp.float32)
        A_hi = A32.astype(jnp.bfloat16)
        A_lo = (A32 - A_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        oh_lo = (lane == lo[None]).astype(jnp.bfloat16)
        T = (jnp.tensordot(A_hi, oh_lo, axes=([1], [0])).astype(jnp.float32)
             + jnp.tensordot(A_lo, oh_lo, axes=([1], [0])).astype(
                 jnp.float32))
    else:
        oh_lo = (lane == lo[None]).astype(dtype)               # (L, *Q)
        T = jnp.tensordot(A.astype(dtype), oh_lo,
                          axes=([1], [0]))                     # (H, *Q)
    row = jnp.arange(H, dtype=jnp.int32).reshape((H,) + (1,) * qi.ndim)
    oh_hi = (row == hi[None]).astype(dtype)                    # (H, *Q)
    return jnp.sum(T.astype(dtype) * oh_hi, axis=0)            # (*Q,)


# "stack" mode: one dot over the 4 concatenated index sets instead of
# 4 separate dots.  Measured SLOWER (617 vs 686 us step on config 1 —
# the concat/reshape relayouts cost more than the saved fusion
# launches); kept off, A/B-able via CDX_LOOKUP4_STACK=1.
_LOOKUP4_STACK = _os.environ.get("CDX_LOOKUP4_STACK", "0") == "1"


def _lookup4_qlanes(flat, idx, nbr_idx3, dtype):
    """Four-value lookup: center + the *chosen* neighbor per axis.

    The caller already knows each axis's neighbor direction (use_next,
    grid.c:331-454 one-sided rule), so only 4 of the 7 candidate cells
    are ever consumed — the 7-table form gathers both neighbors per
    axis and selects afterwards.  XLA rewrites each one-hot dot into an
    internal gather, so this cuts gathered values 7 → 4 (the lookup dot
    was 38.6% of round-3 step cycles).

    flat: (cells,); idx: (*Q,) center flat index (any rank; axes are
    never merged — see _onehot2_lookup_qlanes_one's sharding note);
    nbr_idx3: 3 arrays of (*Q,) per-axis neighbor flat indices.
    Returns (v0 (*Q,), vn (3, *Q)).
    """
    flat = _definite(flat)
    L = _ONEHOT2_L4
    cells = flat.shape[0]
    pad = -cells % L
    if pad:
        flat = jnp.pad(flat, (0, pad),
                       constant_values=_BIG.astype(flat.dtype) / 2)
    if _LOOKUP4_STACK:
        qi4 = jnp.stack([idx, *nbr_idx3])
        v4 = _onehot2_lookup_qlanes_one(flat, qi4, dtype)
        return v4[0], v4[1:]
    v0 = _onehot2_lookup_qlanes_one(flat, idx, dtype)
    vn = jnp.stack([_onehot2_lookup_qlanes_one(flat, nb, dtype)
                    for nb in nbr_idx3])
    return v0, vn


def _lookup4_qlanes_fields(flats, idx, nbr_idx3, dtype):
    """Field-batched 4-value lookup: every field's (center + 3
    neighbor) queries in ONE batched one-hot contraction.

    The per-field form issues F·4 separate dots (plus their one-hot
    iota fusions); MAC count is identical either way (the F tables are
    independent, so the contraction batches over F instead of
    concatenating tables — the concat form would be F× more MACs, the
    measured round-4 loser).  flats: (F, cells) already inf-replaced;
    idx: (F, *Q); nbr_idx3: (3, F, *Q).  Returns (v0 (F, *Q),
    vn (3, F, *Q)).
    """
    F, cells = flats.shape
    L = _ONEHOT2_L4
    pad = -cells % L
    if pad:
        flats = jnp.pad(flats, ((0, 0), (0, pad)),
                        constant_values=_BIG.astype(flats.dtype) / 2)
    H = flats.shape[1] // L
    A = flats.reshape(F, H, L)
    qi = jnp.concatenate([idx[:, None], jnp.moveaxis(nbr_idx3, 0, 1)],
                         axis=1)                           # (F, 4, *Q)
    hi = qi // L
    lo = qi - hi * L
    lane = jnp.arange(L, dtype=jnp.int32).reshape(
        (1, L) + (1,) * (qi.ndim - 1))
    oh_lo = (lane == lo[:, None]).astype(dtype)            # (F, L, 4, *Q)
    # batched over F, contracting L: one dot_general for all fields
    T = jnp.einsum("fhl,fl...->fh...", A.astype(dtype), oh_lo)
    row = jnp.arange(H, dtype=jnp.int32).reshape(
        (1, H) + (1,) * (qi.ndim - 1))
    oh_hi = (row == hi[:, None]).astype(dtype)             # (F, H, 4, *Q)
    v4 = jnp.sum(T * oh_hi, axis=1)                        # (F, 4, *Q)
    return v4[:, 0], jnp.moveaxis(v4[:, 1:], 1, 0)


def _pick_method(cells):
    """Lookup backend: the two-sided one-hot factorization (a real MXU
    matmul over the lane axis + cheap hi-select — measured 3-4x faster
    in-step than the flat one-hot, which XLA rewrites into a serialized
    gather), plain gathers for huge grids.  "onehot"/"pallas" stay
    available explicitly."""
    if cells > ONEHOT_MAX_CELLS:
        return "gather"
    return "onehot2"


def multigrid_interp_grad(data, sizes, lengths, p, method="auto"):
    """Interp + grad across F padded grids at per-field points.

    Args:
      data: (F, mx, my, mz) padded grid stack.
      sizes: (F, 3) int32 true sizes.
      lengths: (F, 3) side lengths.
      p: (..., F, 3) per-field query points (already in each grid frame).
      method: "auto" | "pallas" | "onehot" | "gather" lookup backend
        (all numerically identical up to inf-vs-_BIG representation).

    Returns (value (..., F), grad (..., F, 3), in_bounds (..., F)).
    """
    sizes_f = sizes.astype(p.dtype)
    x = p / lengths
    in_bounds = jnp.all((x >= 0.0) & (x <= 1.0), axis=-1)
    sub = jnp.clip(jnp.floor(x * sizes_f).astype(jnp.int32), 0, sizes - 1)

    center = (sub.astype(p.dtype) + 0.5) / sizes_f * lengths
    use_next = p >= center
    use_next = jnp.where(sub == 0, True, use_next)
    use_next = jnp.where(sub == sizes - 1, False, use_next)

    f, mx, my, mz = data.shape
    if method == "auto":
        method = _pick_method(f * mx * my * mz)

    big = jnp.asarray(_BIG / 2, p.dtype)
    if method in ("pallas", "pallas_interpret"):
        from or_cdchomp_tpu.ops.pallas_sdf import sdf_cell_lookup

        # (..., F, 3) → (F, Q, 3) with Q = prod(leading dims)
        lead = p.shape[:-2]
        qn = int(np.prod(lead)) if lead else 1
        mv = list(range(p.ndim))
        subq = jnp.moveaxis(sub, -2, 0).reshape(f, qn, 3)
        del mv
        nbr = sub + jnp.where(use_next, 1, -1)  # in-range: edges forced inward
        nbrq = jnp.moveaxis(nbr, -2, 0).reshape(f, qn, 3)
        fin = _definite(data)
        vals4 = sdf_cell_lookup(fin, subq, nbrq,
                                interpret=(method == "pallas_interpret"))
        # (F, Q) each → (..., F)
        v0, *vns = (jnp.moveaxis(v.reshape((f,) + lead), 0, -1)
                    for v in vals4)
        vn3 = jnp.stack(vns, axis=-1)                # (..., F, 3)
    else:
        # per-field lookups: one (query, field) row must only contract
        # against its OWN field's table — a single stacked-table one-hot
        # makes the matmul F² in the field count (every row spans every
        # field's cells), which is exactly why the multi-SDF config ran
        # 3.3x slower than single-SDF in round 2
        idx_local = (sub[..., 0] * my + sub[..., 1]) * mz + sub[..., 2]
        strides = (my * mz, mz, 1)
        lookup = {"onehot": _lookup_onehot,
                  "onehot2": _lookup_onehot2}.get(method, _lookup_gather)
        if f == 1:
            # single field: keep the trailing F axis through the lookup
            # (a post-hoc stack breaks fusion with the select below —
            # measured 1.4x slower end to end)
            vals = lookup(data.reshape(-1), idx_local, strides, p.dtype)
        else:
            per_field = [lookup(data[fi].reshape(-1), idx_local[..., fi],
                                strides, p.dtype) for fi in range(f)]
            vals = jnp.stack(per_field, axis=-2)     # (..., F, 7)
        v0 = vals[..., 0]
        nb = vals[..., 1:].reshape(vals.shape[:-1] + (3, 2))
        vn3 = jnp.where(use_next, nb[..., 0], nb[..., 1])   # (..., F, 3)

    # ±inf detection across backends: gathers keep true inf, the
    # matmul/pallas paths carry the sign-preserving ±_BIG stand-in —
    # all three axes handled in one vectorized pass
    any_inf = (jnp.abs(v0) >= big) | jnp.any(jnp.abs(vn3) >= big, axis=-1)
    sign = jnp.where(use_next, 1.0, -1.0).astype(p.dtype)
    grad = sign * (vn3 - v0[..., None]) * (sizes_f / lengths)

    value = v0 + jnp.sum(grad * (p - center), axis=-1)
    inf = jnp.asarray(jnp.inf, dtype=value.dtype)
    bad = ~in_bounds | any_inf   # HUGE_VAL propagation, grid.c:405-439
    value = jnp.where(bad, inf, value)
    grad = jnp.where(bad[..., None], 0.0, grad)
    return value, grad, in_bounds
