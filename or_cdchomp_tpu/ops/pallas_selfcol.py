"""Pallas TPU kernel: all-pairs sphere self-collision with per-pair
bounding-volume skipping.  **Measured SLOWER than the dense XLA path —
kept as an opt-in experiment (CDX_SELFCOL=pallas), not the default.**

Round-4 A/B on the config-1 step (batch 256, solves/s): XLA dense
3573-4013 vs this kernel 2363 at (TM,TB)=(8,128), 1629 at (8,256),
1297 at (16,256) — although ~84% of pair blocks skip (the sparsity is
real, measured 15.6%), each ``@pl.when`` costs ~95 cycles of scalar
test + branch overhead on this Mosaic version, more than the ~45
cycles of dense vector math it avoids, and larger tiles made the
predicated regions costlier still.  The production win came instead
from strength-reducing the dense path (rsqrt + hoisted reciprocals,
cost_soa.py).  The kernel remains correct (interpret-mode equivalence
suite, tests/test_pallas_selfcol.py) and documents the measured
negative result the round-3 verdict asked for.

The XLA self-collision path (chomp/cost_soa.py:_selfcol_soa) is
VPU-throughput-bound: ~30 vector ops over dense (m, Sa, So, B) pair
tensors.  The hinge support is tiny: the reference skips any
pair beyond rsum + ε_self (orcdchomp_mod.cpp:1270-1279), and on the
WAM7 workload only ~16% of (sphere_i, sphere_j) pairs ever come that
close.  XLA cannot skip data-dependently; this kernel can:

 - outside the kernel, XLA computes per (m-tile, sphere, B-tile)
   bounding spheres of the sphere positions (cheap dense reductions);
 - inside, each ordered pair (i, j) first runs a *scalar* test —
   center distance vs bound radii + rsum + max ε over the tile — and
   only pairs that pass run the ~45-op vector math on the (TM, TB)
   tile under ``@pl.when``, accumulating into VMEM scratch with
   static sphere indices (no scatter).

Same-link exclusions and radius sums are engine constants, so
disallowed pairs (incl. the diagonal) are skipped at trace time.

Math matches _selfcol_soa / self_collision_cost_grad exactly
(orcdchomp_mod.cpp:1249-1317): per ordered pair (i active, j any),

    w1 = slope · obs_self · ‖ẋ_i‖ / max(d, 1e-12)
    w2 = [‖ẋ_i‖>ε] · w1 · (ẋ_i·(x_i−x_j)) / ‖ẋ_i‖²
    net_i += w1·(x_i−x_j) − w2·ẋ_i
    net_j −= w1·(x_i−x_j) − w2·ẋ_i        (j active only)

Layout contract: component-stacked SoA arrays (3, m, Sa, B) with the
problem batch on lanes; inactive positions (3, SI, B) broadcast over m.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

import os as _os

# Tile shape: the per-pair scalar test costs ~constant per cond, so
# larger tiles amortize it over more vector work per pair (A/B on the
# config-1 step; see BENCHMARKS.md).
_TM = int(_os.environ.get("CDX_SELFCOL_TM", "16"))   # m-rows / program
_TB = int(_os.environ.get("CDX_SELFCOL_TB", "256"))  # problems / program


def _make_kernel(Sa, SI, TM, TB, allow, rsum, dense=False):
    """allow: (Sa, So) np bool; rsum: (Sa, So) np float — engine
    constants, folded at trace time.

    dense=True: branchless variant — no bounding test, no ``@pl.when``
    (whose ~95-cycle scalar overhead lost to the dense XLA path, round
    4); every allowed pair runs unconditionally with the same rsqrt
    strength reduction as cost_soa, in ONE pass with all accumulators
    in VMEM — the single-traversal structure XLA's fusion grouping
    refuses to emit (it re-derives the pair math per reduce group,
    measured round 5)."""
    So = Sa + SI

    def kernel(xi_ref, vel_ref, xo_ref, eps_ref, ofs_ref,
               bc_ref, br_ref, em_ref, net_ref, cost_ref,
               net_acc, cost_acc):
        """One (m-tile, B-tile) program.

        xi_ref/vel_ref: (3, TM, Sa, TB) VMEM; xo_ref: (3, max(SI,1), TB);
        eps_ref/ofs_ref: (1, TB) per-problem ε_self / obs_factor_self;
        bc_ref: (1, 1, 3, So) SMEM tile bound centers;
        br_ref: (1, 1, 1, So) SMEM tile bound radii;
        em_ref: (1, 1, 1) SMEM max ε_self over the B-tile.
        net_acc/cost_acc: VMEM scratch accumulators.
        """
        xi = xi_ref[...]
        vel = vel_ref[...]
        eps = eps_ref[0, :]                     # (TB,)
        inv_eps = 1.0 / eps                     # hoisted: no divides in
        # the pair loop (multi-cycle VPU ops × ~200 pairs)
        ofs = ofs_ref[0, :]
        em = em_ref[0, 0, 0]

        v2 = vel[0] * vel[0] + vel[1] * vel[1] + vel[2] * vel[2]
        vn = jnp.sqrt(v2)                       # (TM, Sa, TB)
        safe = vn > 1e-6
        inv_v2 = jnp.where(safe, 1.0 / jnp.where(safe, v2, 1.0), 0.0)
        ofv = ofs[None, None, :] * vn           # (TM, Sa, TB)

        net_acc[...] = jnp.zeros((3, TM, Sa, TB), xi.dtype)
        cost_acc[...] = jnp.zeros((TM, Sa, TB), xi.dtype)

        if SI:
            xo_t = xo_ref[...]                  # (3, SI, TB)

        for si in range(Sa):
            x_s = tuple(xi[c, :, si, :] for c in range(3))   # (TM, TB)
            v_s = tuple(vel[c, :, si, :] for c in range(3))
            ofv_s = ofv[:, si, :]
            safe_s = safe[:, si, :]
            iv2_s = inv_v2[:, si, :]
            for sj in range(So):
                if not allow[si, sj]:
                    continue                     # same-link: trace-time
                rs = float(rsum[si, sj])

                def body(si=si, sj=sj, rs=rs, x_s=x_s, v_s=v_s,
                         ofv_s=ofv_s, safe_s=safe_s, iv2_s=iv2_s):
                    if sj < Sa:
                        x_o = tuple(xi[c, :, sj, :] for c in range(3))
                    else:
                        x_o = tuple(
                            jnp.broadcast_to(xo_t[c, sj - Sa, :][None, :],
                                             (TM, TB)) for c in range(3))
                    diff = tuple(x_s[c] - x_o[c] for c in range(3))
                    d2 = (diff[0] * diff[0] + diff[1] * diff[1]
                          + diff[2] * diff[2])           # (TM, TB)
                    # guarded rsqrt = both 1/dist and dist, no divide/
                    # sqrt (same strength reduction as cost_soa)
                    inv_cd = jax.lax.rsqrt(jnp.maximum(d2, 1e-24))
                    cd = d2 * inv_cd
                    d = cd - rs
                    ok = d <= eps[None, :]
                    de = d - eps[None, :]
                    c_h = jnp.where(d < 0.0, 0.5 * eps[None, :] - d,
                                    0.5 * de * de * inv_eps[None, :])
                    cost_pair = jnp.where(ok, c_h, 0.0) * ofv_s
                    slope = jnp.where(d < 0.0, -1.0,
                                      d * inv_eps[None, :] - 1.0)
                    w1 = jnp.where(ok, slope * ofv_s * inv_cd, 0.0)
                    b = (v_s[0] * diff[0] + v_s[1] * diff[1]
                         + v_s[2] * diff[2])
                    w2 = jnp.where(safe_s, w1 * b * iv2_s, 0.0)
                    cost_acc[:, si, :] += cost_pair
                    for c in range(3):
                        g = w1 * diff[c] - w2 * v_s[c]
                        net_acc[c, :, si, :] += g
                        if sj < Sa:
                            net_acc[c, :, sj, :] -= g

                if dense:
                    body()
                else:
                    # scalar bounding test: tile bound centers/radii
                    dc2 = ((bc_ref[0, 0, 0, si]
                            - bc_ref[0, 0, 0, sj]) ** 2
                           + (bc_ref[0, 0, 1, si]
                              - bc_ref[0, 0, 1, sj]) ** 2
                           + (bc_ref[0, 0, 2, si]
                              - bc_ref[0, 0, 2, sj]) ** 2)
                    reach = (br_ref[0, 0, 0, si] + br_ref[0, 0, 0, sj]
                             + rs + em)
                    pl.when(dc2 <= reach * reach)(body)

        net_ref[...] = net_acc[...]
        cost_ref[...] = cost_acc[...]

    return kernel


# imported lazily so CPU-only users never touch pallas at module import
from jax.experimental import pallas as pl          # noqa: E402
from jax.experimental.pallas import tpu as pltpu   # noqa: E402


def _tile_bounds(x, TM, TB):
    """Per (m-tile, sphere, B-tile) bounding spheres of SoA positions.

    x: (3, m, S, B) (m, B already padded to tile multiples).
    Returns (centers (3, nmt, S, nbt), radii (nmt, S, nbt)).
    """
    _, m, S, B = x.shape
    xt = x.reshape(3, m // TM, TM, S, B // TB, TB)
    hi = jnp.max(xt, axis=(2, 5))
    lo = jnp.min(xt, axis=(2, 5))
    c = 0.5 * (hi + lo)
    r = 0.5 * jnp.sqrt(jnp.sum((hi - lo) ** 2, axis=0))
    return c, r


@functools.partial(
    jax.jit, static_argnames=("same_link", "rsum_t", "tm", "tb",
                              "interpret", "dense"))
def _selfcol_call(xi, vel, xo, eps_self, obs_self, *, same_link, rsum_t,
                  tm, tb, interpret=False, dense=False):
    _, m, Sa, B = xi.shape
    SI = xo.shape[1]
    So = Sa + SI
    dtype = xi.dtype
    allow = ~np.asarray(same_link, dtype=bool)
    rsum = np.asarray(rsum_t, dtype=np.float64)

    TM = tm
    TB = min(tb, max(128, -(-B // 128) * 128))   # don't over-pad small B
    mp = -m % TM
    bp = -B % TB
    if mp or bp:
        padm = ((0, 0), (0, mp), (0, 0), (0, bp))
        xi = jnp.pad(xi, padm)
        vel = jnp.pad(vel, padm)          # zero vel ⇒ zero cost/grad
        if SI:
            xo = jnp.pad(xo, ((0, 0), (0, 0), (0, bp)))
        eps_self = jnp.pad(eps_self, (0, bp), constant_values=1.0)
        obs_self = jnp.pad(obs_self, (0, bp))
    mq, bq = m + mp, B + bp
    nmt, nbt = mq // TM, bq // TB

    # bounds: active spheres per (m-tile, B-tile); inactive per B-tile.
    # SMEM layout puts the tile indices leading and the small (3, So)
    # payload trailing (Mosaic requires full trailing block dims).
    bc_a, br_a = _tile_bounds(xi, TM, TB)           # (3,nmt,Sa,nbt)
    if SI:
        # inactive positions are m-independent: bounds over B-tile only
        xot = xo.reshape(3, SI, nbt, TB)
        hi = jnp.max(xot, axis=3)
        lo = jnp.min(xot, axis=3)
        c_i = 0.5 * (hi + lo)                          # (3, SI, nbt)
        r_i = 0.5 * jnp.sqrt(jnp.sum((hi - lo) ** 2, axis=0))
        bc = jnp.concatenate(
            [bc_a, jnp.broadcast_to(c_i[:, None], (3, nmt, SI, nbt))],
            axis=2)
        br = jnp.concatenate(
            [br_a, jnp.broadcast_to(r_i[None], (nmt, SI, nbt))], axis=1)
    else:
        bc, br = bc_a, br_a
    bc = jnp.transpose(bc, (1, 3, 0, 2))               # (nmt, nbt, 3, So)
    br = jnp.transpose(br, (0, 2, 1))[:, :, None, :]   # (nmt, nbt, 1, So)

    em = jnp.max(eps_self.reshape(nbt, TB), axis=1)[:, None, None]

    kernel = _make_kernel(Sa, SI, TM, TB, allow, rsum, dense=dense)
    grid = (nmt, nbt)
    xo_in = xo if SI else jnp.zeros((3, 1, bq), dtype)

    net, cost = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((3, TM, Sa, TB), lambda mi, bi: (0, mi, 0, bi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, TM, Sa, TB), lambda mi, bi: (0, mi, 0, bi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, max(SI, 1), TB), lambda mi, bi: (0, 0, bi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TB), lambda mi, bi: (0, bi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TB), lambda mi, bi: (0, bi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 3, So), lambda mi, bi: (mi, bi, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 1, So), lambda mi, bi: (mi, bi, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 1), lambda mi, bi: (bi, 0, 0),
                         memory_space=pltpu.SMEM)],
        out_specs=[
            pl.BlockSpec((3, TM, Sa, TB), lambda mi, bi: (0, mi, 0, bi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TM, Sa, TB), lambda mi, bi: (mi, 0, bi),
                         memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((3, mq, Sa, bq), dtype),
                   jax.ShapeDtypeStruct((mq, Sa, bq), dtype)],
        scratch_shapes=[pltpu.VMEM((3, TM, Sa, TB), dtype),
                        pltpu.VMEM((TM, Sa, TB), dtype)],
        interpret=interpret,
    )(xi, vel, xo_in, eps_self[None, :].astype(dtype),
      obs_self[None, :].astype(dtype), bc.astype(dtype), br.astype(dtype),
      em.astype(dtype))

    return net[:, :m, :, :B], cost[:m, :, :B]


def selfcol_pairs(xi, vel, xo, pair_allow, rsum, eps_self, obs_self,
                  *, interpret=False, dense=False):
    """Self-collision net workspace gradient + per-sphere cost.

    Args:
      xi, vel: (3, m, Sa, B) active sphere positions / velocities.
      xo: (3, SI, B) inactive sphere positions (SI may be 0).
      pair_allow: (Sa, So) array-like, truthy where the pair
        participates (i.e. ``~same_link``) — static engine constant.
      rsum: (Sa, So) radius sums — static engine constant.
      eps_self, obs_self: (B,) per-problem ε_self / obs_factor_self.
      interpret: interpreter mode (CPU tests).

    Returns (net (3, m, Sa, B), cost (m, Sa, B)) where ``cost`` is the
    per-(point, sphere_i) sum of pair costs (scaled by
    obs_factor_self·‖ẋ_i‖) and ``net`` the summed workspace gradient.
    """
    same_link = tuple(tuple(not bool(v) for v in row)
                      for row in np.asarray(pair_allow))
    rsum_t = tuple(tuple(float(v) for v in row)
                   for row in np.asarray(rsum))
    return _selfcol_call(xi, vel, xo, eps_self, obs_self,
                         same_link=same_link, rsum_t=rsum_t,
                         tm=_TM, tb=_TB, interpret=interpret,
                         dense=dense)
