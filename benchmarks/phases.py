"""Per-phase / per-fusion cycle attribution for a bench config.

Compiles the batched 1-iteration step for a config and prints the
reference-style phase breakdown (DEBUG_TIMING taxonomy,
orcdchomp_mod.cpp:2835-2847) from the TPU compiler's estimated_cycles,
plus the top fusions — the tool used to aim kernel work.

Run: timeout 900 python benchmarks/phases.py [--config 1] [--batch 256]
     [--top 30]
"""
from __future__ import annotations

import argparse
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", type=int, default=1)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--top", type=int, default=30)
    args = ap.parse_args()

    import jax
    import numpy as np

    from benchmarks import configs as C
    from or_cdchomp_tpu.parallel.batch import problem_batch_from_grid
    from or_cdchomp_tpu.utils.profiling import (
        format_phase_report, phase_cycle_report)

    import jax.numpy as jnp
    build = {1: C.wam7_single_sdf, 2: C.cluttered_multi_sdf,
             3: C.hmc_best_of, 4: C.floating_everyn_tsr}[args.config]
    mod, run, goal = build(jnp.float32)
    engine = run.engine
    spec = engine.spec
    rng = np.random.default_rng(0)
    start = np.asarray(run.problem.traj)[0]
    goal = np.asarray(run.problem.traj)[-1]
    starts = np.tile(start, (args.batch, 1)) + \
        0.02 * rng.normal(size=(args.batch, spec.n))
    goals = np.tile(goal, (args.batch, 1)) + \
        0.02 * rng.normal(size=(args.batch, spec.n))
    if spec.floating_base:
        starts[:, 3:7] = start[3:7]
        goals[:, 3:7] = goal[3:7]
    probs = problem_batch_from_grid(run.problem, starts, goals, engine)

    lowered = jax.jit(lambda p: engine.iterate_batch(p, 1)).lower(probs)
    compiled = lowered.compile()
    txt = compiled.as_text()

    print(format_phase_report(phase_cycle_report(txt)))

    rows = []
    for line in txt.splitlines():
        m = re.search(r'"estimated_cycles":"(\d+)"', line)
        if not m:
            continue
        cyc = int(m.group(1))
        nm = re.search(r'op_name="([^"]*)"', line)
        op = re.match(r"\s*(?:ROOT )?%?([\w.\-]+)\s*=\s*(\S+)", line)
        rows.append((cyc, op.group(1)[:40] if op else "?",
                     (nm.group(1) if nm else "")[:110]))
    rows.sort(reverse=True)
    total = sum(r[0] for r in rows) or 1
    print(f"\nTop {args.top} fusions of {len(rows)} "
          f"(total {total:,} est. cycles):")
    for cyc, name, scope in rows[:args.top]:
        print(f"  {cyc:>12,} ({100.0*cyc/total:4.1f}%) {name:<42s} {scope}")


if __name__ == "__main__":
    main()
