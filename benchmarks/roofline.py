"""Roofline evidence for the config-1 batched step (VERDICT r4 #2).

Compiles ONE solver step (the scan body the 100-iteration loop runs)
for the TPU backend, and reports:
  - compiler cost analysis: total FLOPs, bytes accessed
  - the largest HLO fusions by output bytes (what actually gets
    materialized in HBM between kernels — the traffic that bounds a
    fusion-limited elementwise phase)
  - per-phase FLOP/byte arithmetic vs the chip ceilings, stated in
    BENCHMARKS.md "Roofline" (this script is the evidence generator).

Run single-client on the TPU:
  PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/roofline.py
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = 256
N_ITER_PROBE = 1


def main():
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
    starts = np.tile(start, (BATCH, 1)) + 0.02 * rng.normal(
        size=(BATCH, spec.n))
    goals = np.tile(goal_r, (BATCH, 1)) + 0.02 * rng.normal(
        size=(BATCH, spec.n))
    probs = problem_batch_from_grid(run.problem, starts, goals, eng)

    fn = jax.jit(lambda p: eng.iterate_batched_nojit(p, N_ITER_PROBE))
    lowered = fn.lower(probs)
    compiled = lowered.compile()

    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    print(json.dumps({
        "flops": ca.get("flops"),
        "bytes_accessed": ca.get("bytes accessed"),
        "bytes_out": ca.get("bytes accessed output"),
        "transcendentals": ca.get("transcendentals"),
    }))

    hlo = compiled.as_text()

    def shape_bytes(shape_str):
        nbytes = 0
        for st in re.finditer(r"\b(f32|bf16|f64|f16|s32|u32|s64|u64|s8|u8|"
                              r"pred)\[([0-9,]*)\]", shape_str):
            dt, dims = st.group(1), st.group(2)
            bpe = {"f32": 4, "bf16": 2, "f64": 8, "s32": 4, "u32": 4,
                   "pred": 1, "s8": 1, "u8": 1, "f16": 2,
                   "s64": 8, "u64": 8}[dt]
            n = 1
            if dims:
                for d in dims.split(","):
                    n *= int(d)
            nbytes += n * bpe
        return nbytes

    def phase_of(line):
        mm = re.search(r'op_name="([^"]*)"', line)
        if not mm:
            return "?"
        op = mm.group(1)
        for ph in ("selfcol", "obstacle", "fk", "pre_velsaccs", "jtmap",
                   "smoothgrad", "metricsolve", "limits", "constraint",
                   "vels", "smoothcost", "update"):
            if f"/{ph}/" in op or op.endswith(ph):
                return ph
        return "other"

    # top-level HLO ops inside the while body: fusions, convolutions
    # (the MXU lookups), and standalone expensive ops — each writes its
    # result to HBM; that materialized traffic is what bounds the
    # fusion-limited phases.
    per_phase = {}
    rows = []
    for m_ in re.finditer(
            r"%(\S+) = (\([^=]*?\)|\S+) (fusion|convolution|dot|"
            r"gather|reduce|transpose|copy)\((.*)$", hlo, re.M):
        name, shape, kind, rest = m_.groups()
        nbytes = shape_bytes(shape)
        ph = phase_of(rest)
        inbody = "while/body" in rest
        if inbody:
            per_phase.setdefault(ph, [0, 0])
            per_phase[ph][0] += nbytes
            per_phase[ph][1] += 1
        rows.append((nbytes, inbody, kind, ph, name, shape[:90]))
    rows.sort(reverse=True)
    body_total = sum(r[0] for r in rows if r[1])
    print(json.dumps({
        "while_body_materialized_out_bytes": body_total,
        "per_phase_out_bytes": {k: v[0] for k, v in
                                sorted(per_phase.items())},
        "per_phase_n_ops": {k: v[1] for k, v in
                            sorted(per_phase.items())},
    }))
    print("\nlargest while-body materialized results:")
    for nbytes, inbody, kind, ph, name, shape in rows[:30]:
        if not inbody:
            continue
        print(f"{nbytes/1e6:10.2f} MB  {kind:11s} {ph:12s} {name[:40]:40s}"
              f" {shape}")

    out_path = "/tmp/step_hlo.txt"
    with open(out_path, "w") as f:
        f.write(hlo)
    print("full HLO ->", out_path)


if __name__ == "__main__":
    main()
