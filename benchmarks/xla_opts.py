"""Sweep XLA TPU compiler options on the flagship batched solve.

The roofline (BENCHMARKS.md) attributes the step's remaining ~2.5x
distance from sum-of-phase speed-of-light to XLA fusion *scheduling*
(sibling reduce groups recompute producers; lookup materializes conv
outputs) rather than arithmetic.  Per-executable compiler options are
the one lever that can move scheduling without rewriting the graph:

  python benchmarks/xla_opts.py [--arms base,vmem96,...]

Each arm lowers the SAME jitted 100-iteration flagship solve and
compiles it with one compiler_options dict
(jax .lower().compile(compiler_options=...) -> PJRT, forwarded to the
TPU compiler).  Unknown/rejected options are reported per-arm and the
sweep continues.  Same-process, one TPU claim, like ab.py.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--arms", default=None, help="comma list; default all")
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--n-iter", type=int, default=100)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from benchmarks import configs as C
    from or_cdchomp_tpu.parallel.batch import problem_batch_from_grid

    mod, run, goal = C.wam7_single_sdf(jnp.float32)
    eng = run.engine
    spec = eng.spec
    rng = np.random.default_rng(0)
    start = np.asarray(run.problem.traj)[0]
    goal_r = np.asarray(run.problem.traj)[-1]
    starts = np.tile(start, (args.batch, 1)) + 0.02 * rng.normal(
        size=(args.batch, spec.n))
    goals = np.tile(goal_r, (args.batch, 1)) + 0.02 * rng.normal(
        size=(args.batch, spec.n))
    probs = problem_batch_from_grid(run.problem, starts, goals, eng)
    probs = jax.device_put(probs)

    ARMS = {
        # identity: the compiled-options path itself must not change
        # the wall vs the plain jit (sanity anchor)
        "base": {},
        # scoped-vmem budget: larger fusions become legal when their
        # live temporaries fit the scoped window (default ~dozens of
        # MiB; v5e VMEM is 128 MiB total)
        "vmem48": {"xla_tpu_scoped_vmem_limit_kib": 49152},
        "vmem64": {"xla_tpu_scoped_vmem_limit_kib": 65536},
        "vmem96": {"xla_tpu_scoped_vmem_limit_kib": 98304},
        "vmem16": {"xla_tpu_scoped_vmem_limit_kib": 16384},
        "vmem8": {"xla_tpu_scoped_vmem_limit_kib": 8192},
        "vmem24": {"xla_tpu_scoped_vmem_limit_kib": 24576},
        "vmem32": {"xla_tpu_scoped_vmem_limit_kib": 32768},
        # async-copy bandwidth scaling skews the latency-hiding
        # scheduler's prefetch cost model
        "acbw05": {"xla_tpu_async_copy_bandwidth_scaling_factor": 0.5},
        "acbw2": {"xla_tpu_async_copy_bandwidth_scaling_factor": 2.0},
        # reduce+broadcast fusion toggle
        "rwb_off": {"xla_tpu_rwb_fusion": False},
        # loop-invariant code motion inflation bound: higher lets XLA
        # hoist bigger recomputed producers out of the solve scan
        "licm2": {"xla_tpu_licm_size_inflation_ratio": 2.0},
        "licm8": {"xla_tpu_licm_size_inflation_ratio": 8.0},
    }
    arms = list(ARMS) if args.arms is None else args.arms.split(",")

    lowered = jax.jit(
        lambda p: eng.iterate_batched_nojit(p, args.n_iter)).lower(probs)

    for arm in arms:
        opts = ARMS[arm]
        try:
            compiled = lowered.compile(
                compiler_options={k: v for k, v in opts.items()})
            out, _ = compiled(probs)
            jax.block_until_ready(out)
            t0 = time.perf_counter()
            for _ in range(args.reps):
                out, costs = compiled(probs)
            jax.block_until_ready(out)
            dt = (time.perf_counter() - t0) / args.reps
            print(json.dumps({
                "arm": arm, "opts": opts,
                "solves_per_s": round(args.batch / dt, 2),
                "step_us": round(dt / args.n_iter * 1e6, 1),
                "final_cost_mean": round(
                    float(jnp.mean(costs[:, -1, 0])), 4),
            }), flush=True)
        except Exception as exc:
            print(json.dumps({"arm": arm, "opts": opts,
                              "error": repr(exc)[:200]}), flush=True)


if __name__ == "__main__":
    main()
