"""Phase-level tracing/profiling.

The reference accumulates per-phase CPU timers under DEBUG_TIMING with
a fixed taxonomy — vels / callback_pre (fk, jacobians, pre_velsaccs) /
callbacks (selfcol) / smoothgrad / smoothcost in the core
(chomp.h:95-100, orcdchomp_mod.cpp:954-958) — reported after iterate
(orcdchomp_mod.cpp:2835-2847).

On TPU the same taxonomy is expressed two ways:

 - ``phase(name)``: a jax.profiler TraceAnnotation + named_scope so the
   phases appear in XLA/perfetto traces captured with
   ``jax.profiler.trace``.
 - ``PhaseTimers``: host-side wall-clock accumulation for coarse
   phases (SDF build, create, iterate chunks) where host timing is
   meaningful, with the reference's report format.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax

# the reference phase taxonomy (chomp.h:95-100, orcdchomp_mod.h) plus
# the step sub-phases this build annotates (solver.step, cost.py)
PHASES = (
    "vels", "callback_pre", "fk", "jacobians", "pre_velsaccs",
    "callbacks", "obstacle", "selfcol", "jtmap", "smoothgrad",
    "constraint", "limits", "smoothcost",
)


@contextlib.contextmanager
def phase(name: str):
    """Annotate a trace region (shows up in jax.profiler captures)."""
    with jax.profiler.TraceAnnotation(name):
        with jax.named_scope(name):
            yield


class PhaseTimers:
    """Host wall-clock per-phase accumulator with the reference's
    report format (orcdchomp_mod.cpp:2835-2847)."""

    def __init__(self):
        self.ticks = defaultdict(float)

    @contextlib.contextmanager
    def tic(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.ticks[name] += time.perf_counter() - t0

    def report(self) -> str:
        lines = ["Time breakdown:"]
        for name in PHASES:
            if name in self.ticks:
                lines.append(f"  ticks_{name:<14s} {self.ticks[name]:.8f}")
        for name, v in self.ticks.items():
            if name not in PHASES:
                lines.append(f"  ticks_{name:<14s} {v:.8f}")
        return "\n".join(lines)


def capture_trace(dirname: str):
    """Context manager: capture a profiler trace for offline viewing.

    Usage::

        with capture_trace('/tmp/trace'):
            solver.iterate(probs, 100)
    """
    return jax.profiler.trace(dirname)


def phase_cycle_report(compiled_text: str) -> dict:
    """Aggregate the TPU compiler's per-op ``estimated_cycles`` by the
    named_scope phase embedded in each op's metadata.

    The step's phases are annotated with jax.named_scope (solver.step /
    cost.py), which XLA carries into ``op_name``; the TPU backend then
    attaches a cycle estimate to every fusion in ``backend_config``.
    Summing those per phase reproduces the reference's DEBUG_TIMING
    breakdown (chomp.h:95-100, orcdchomp_mod.cpp:2835-2847) without
    rerunning anything.

    Returns {phase_name: estimated_cycles}, with "other" collecting
    unannotated ops.
    """
    import re

    out = defaultdict(int)
    for line in compiled_text.splitlines():
        m = re.search(r'"estimated_cycles":"(\d+)"', line)
        if not m:
            continue
        cyc = int(m.group(1))
        nm = re.search(r'op_name="([^"]*)"', line)
        tag = "other"
        if nm:
            # scopes nest (callbacks/callback_pre/fk/…): attribute to
            # the deepest (last-occurring) phase in the scope path
            best = -1
            for ph in PHASES:
                pos = nm.group(1).rfind(f"{ph}/")
                if pos < 0 and nm.group(1).endswith(ph):
                    pos = len(nm.group(1))
                if pos > best:
                    best = pos
                    tag = ph
            if best < 0:
                tag = "other"
        out[tag] += cyc
    return dict(out)


def format_phase_report(cycles: dict) -> str:
    """Reference-style report (orcdchomp_mod.cpp:2835-2847) from a
    phase→cycles dict."""
    total = sum(cycles.values()) or 1
    lines = ["Per-step phase breakdown (TPU compiler cycle estimates):"]
    order = [p for p in PHASES if p in cycles] + \
        [p for p in cycles if p not in PHASES]
    for name in order:
        c = cycles[name]
        lines.append(f"  ticks_{name:<14s} {c:>12,} ({100.0 * c / total:5.1f}%)")
    return "\n".join(lines)
