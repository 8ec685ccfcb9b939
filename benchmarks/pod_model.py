"""Pod-scaling model: what actually crosses the mesh per iteration.

Real multi-chip hardware is not available in this environment
(BASELINE.md demands ≥80% efficiency at N≥2 hosts), so this script
produces the next-best artifact: it compiles the FULL sharded solve
over an 8-virtual-device (hosts × dp) CPU mesh and extracts every
collective operation from the optimized HLO, with byte counts — the
ground-truth communication volume XLA inserts for this program.  The
written-up efficiency model lives in BENCHMARKS.md ("Pod model").

Run: python benchmarks/pod_model.py            (CPU, no TPU claim)
"""

from __future__ import annotations

import json
import os
import re
import sys

# must precede any backend initialization (the axon sitecustomize hook
# overrides env vars; jax.config wins if applied first)
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_ITER = 10
BATCH = 16


def collective_bytes(hlo: str):
    """Every collective op in an optimized HLO module, with the bytes
    it moves (output shape size)."""
    out = []
    # shape may be a single array OR a tuple `(f32[..], f32[..])` from
    # XLA's collective-combiner passes — `\S+` alone misses the tuple's
    # internal spaces and silently drops combined collectives
    for m in re.finditer(
            r"%?(\S+) = (\([^)]*\)|\S+) (all-reduce|all-gather|"
            r"reduce-scatter|collective-permute|all-to-all)\(", hlo):
        name, shape, kind = m.groups()
        nbytes = 0
        for st in re.finditer(r"\b(f32|bf16|f64|s32|u32|pred|s8|u8)"
                              r"\[([0-9,]*)\]", shape):
            bpe = {"f32": 4, "bf16": 2, "f64": 8, "s32": 4, "u32": 4,
                   "pred": 1, "s8": 1, "u8": 1}[st.group(1)]
            n = 1
            if st.group(2):
                for d in st.group(2).split(","):
                    n *= int(d)
            nbytes += n * bpe
        out.append({"op": kind, "name": name, "bytes": nbytes,
                    "shape": shape[:60]})
    return out


def main():
    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from benchmarks import configs as C
    from or_cdchomp_tpu.parallel.batch import (
        BatchSolver, best_of_batch, problem_batch_from_grid)

    mod, run, goal = C.wam7_single_sdf(jnp.float32, n_points=12)
    eng = run.engine
    rng = np.random.default_rng(0)
    start = np.asarray(run.problem.traj)[0]
    starts = np.tile(start, (BATCH, 1)) + 0.02 * rng.normal(
        size=(BATCH, 7))
    goals = np.tile(goal, (BATCH, 1)) + 0.02 * rng.normal(
        size=(BATCH, 7))
    probs = problem_batch_from_grid(run.problem, starts, goals, eng)

    # 2-d mesh (hosts, dp): the cross-host axis is the one whose
    # collectives would ride DCN on a real pod
    devs = np.asarray(jax.devices()[:8]).reshape(2, 4)
    mesh = Mesh(devs, ("hosts", "dp"))
    solver = BatchSolver(eng, mesh=mesh, axis=("hosts", "dp"))
    probs = solver.shard(probs)

    reports = {}

    # (a) the throughput path: N_ITER sharded iterations, no reduction
    fn = jax.jit(lambda p: eng.iterate_batched_nojit(p, N_ITER))
    hlo = fn.lower(probs).compile().as_text()
    reports["iterate"] = collective_bytes(hlo)

    # (b) the convergence-checked path: masked chunk + global all()
    fn2 = jax.jit(lambda p, v, t: solver._iterate_until_impl(p, v, 8, t),
                  static_argnums=())
    hlo2 = fn2.lower(probs, 5, 0.01).compile().as_text()
    reports["iterate_until"] = collective_bytes(hlo2)

    # (c) best-of-batch HMC selection: global argmin + gather of the
    # winning trajectory
    finals = eng.final_costs_batch(probs)
    fn3 = jax.jit(lambda p, f: best_of_batch(p, jnp.stack(f, axis=-1)))
    hlo3 = fn3.lower(probs, finals).compile().as_text()
    reports["best_of_batch"] = collective_bytes(hlo3)

    for name, ops in reports.items():
        total = sum(o["bytes"] for o in ops)
        print(json.dumps({"path": name, "n_collectives": len(ops),
                          "total_bytes": total}))
        for o in ops[:10]:
            print("   ", json.dumps(o))


if __name__ == "__main__":
    main()
