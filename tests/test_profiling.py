"""Phase-taxonomy profiling (the reference's DEBUG_TIMING breakdown,
chomp.h:95-100 / orcdchomp_mod.cpp:2835-2847, reconstructed from
named_scope metadata + TPU compiler cycle estimates)."""

import jax
import numpy as np

from or_cdchomp_tpu.utils.profiling import (
    PhaseTimers, format_phase_report, phase, phase_cycle_report)

_FAKE_HLO = '''
  %f1 = f32[8]{0} fusion(%a), metadata={op_name="jit(step)/callbacks/callback_pre/fk/mul"}, backend_config={"window_config":{"estimated_cycles":"1000"}}
  %f2 = f32[8]{0} fusion(%b), metadata={op_name="jit(step)/callbacks/selfcol/add"}, backend_config={"window_config":{"estimated_cycles":"2000"}}
  %f3 = f32[8]{0} fusion(%c), metadata={op_name="jit(step)/smoothgrad/dot"}, backend_config={"window_config":{"estimated_cycles":"300"}}
  %f4 = f32[8]{0} fusion(%d), metadata={op_name="jit(step)/unrelated/mul"}, backend_config={"window_config":{"estimated_cycles":"50"}}
'''


def test_phase_cycle_report_attribution():
    rep = phase_cycle_report(_FAKE_HLO)
    # nested scopes attribute to the deepest phase
    assert rep["fk"] == 1000
    assert rep["selfcol"] == 2000
    assert rep["smoothgrad"] == 300
    assert rep["other"] == 50
    out = format_phase_report(rep)
    assert "ticks_fk" in out and "ticks_selfcol" in out
    assert "(59.7%)" in out or "59.7" in out


def test_step_carries_named_scopes():
    """The compiled step's HLO carries the phase scopes in op metadata
    (this is what attributes the TPU cycle report; on CPU there are no
    cycle estimates, but the scope names must be present)."""
    import jax.numpy as jnp

    import or_cdchomp_tpu as oc
    from or_cdchomp_tpu.api import KinBody, Robot

    mod = oc.CHOMPModule(dtype=jnp.float64)
    mod.add_kinbody(KinBody("table", oc.Scene.build(
        boxes=[((0.5, 0.0, 0.6, 0, 0, 0, 1), (0.25, 0.35, 0.03))])))
    r = Robot("wam", oc.wam7(),
              q_active=np.array([2.5, -1.8, 0.0, 2.0, 0.0, 0.2, 0.0]))
    mod.add_robot(r)
    r.enabled = False
    mod.computedistancefield(kinbody="table", cube_extent=0.15)
    r.enabled = True
    h = mod.create(robot="wam", adofgoal=np.zeros(7) + 0.3, n_points=8)
    rn = mod.runs[h]
    hlo = jax.jit(rn.engine.step).lower(rn.problem).compile().as_text()
    for ph in ("callbacks", "callback_pre", "fk", "pre_velsaccs",
               "obstacle", "selfcol", "jtmap", "smoothgrad", "limits"):
        assert f"{ph}/" in hlo, f"phase scope {ph} missing from compiled step"
    mod.destroy(run=h)


def test_phase_timers_report():
    t = PhaseTimers()
    with t.tic("fk"):
        pass
    with t.tic("custom"):
        pass
    out = t.report()
    assert "ticks_fk" in out and "ticks_custom" in out


def test_phase_context_manager():
    with phase("fk"):
        x = jax.numpy.ones(3) + 1
    assert float(x[0]) == 2.0
