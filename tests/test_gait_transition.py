"""Gait-transition engine: unit sequence + CLOSED-LOOP trot->walk->trot.

Reference semantics under test (qr_fsm_state_locomotion.cpp:271-340):
slow down (command ramp, early exit when all four feet are down), hold
full stance ~1 s with the gait clock frozen, swap the gait table, resume.
The closed-loop test runs the whole thing through rollout_segment on the
SRB sim — the wiring VERDICT r2 flagged as missing.
"""

import jax
import jax.numpy as jnp
import numpy as np

from quadruped_tpu.control.desired_state import TwistCommand
from quadruped_tpu.control.gait_transition import (TransitionPhase,
                                                   gait_transition_init,
                                                   gait_transition_step,
                                                   request_transition)
from quadruped_tpu.gait import (TROT, BOUND, ADVANCED_TROT, gait_init,
                                gait_update, stance_contact_mask)
from quadruped_tpu.gait.scheduler import _config


def test_transition_sequence():
    source, target = TROT(), BOUND()
    ts = gait_transition_init()
    gs = gait_init(source)
    cmd = TwistCommand.constant(vx=0.4)

    dt = 0.01
    t = 0.0
    phases, scales, periods, idxs = [], [], [], []
    for i in range(320):
        t = (i + 1) * dt
        if i == 10:
            ts = request_transition(ts, jnp.asarray(t))
        active, gs, cmd_out, hold, ts = gait_transition_step(
            ts, gs, source, target, cmd, jnp.asarray(t))
        gs = gait_update(active, gs, jnp.asarray(t),
                         stance_contact_mask(gs))
        phases.append(int(ts.phase))
        scales.append(float(cmd_out.linear[0]))
        periods.append(float(active.stance_duration[0]))
        idxs.append(float(ts.active_idx))

    phases = np.asarray(phases)
    scales = np.asarray(scales)
    periods = np.asarray(periods)
    # Ordered phases: NONE -> DECEL -> STAND -> NONE.
    assert phases[5] == TransitionPhase.NONE
    assert (phases == TransitionPhase.DECEL).any()
    assert (phases == TransitionPhase.STAND).any()
    assert phases[-1] == TransitionPhase.NONE
    # Command ramps to zero during the hold and returns after.
    np.testing.assert_allclose(scales[0], 0.4, atol=1e-6)
    stand_ticks = np.nonzero(phases == TransitionPhase.STAND)[0]
    np.testing.assert_allclose(scales[stand_ticks[0]], 0.0, atol=1e-6)
    np.testing.assert_allclose(scales[-1], 0.4, atol=1e-6)
    # Gait table swapped: stance duration goes 0.3 (trot) -> 0.25 (bound).
    np.testing.assert_allclose(periods[0], 0.3, atol=1e-6)
    assert abs(periods[-1] - 0.25) < 1e-6
    assert idxs[-1] == 1.0


def test_transition_round_trip_toggles():
    """A second request transitions BACK to the source gait."""
    source, target = TROT(), BOUND()
    ts = gait_transition_init()
    gs = gait_init(source)
    cmd = TwistCommand.constant(vx=0.3)
    dt = 0.01
    for i in range(700):
        t = jnp.asarray((i + 1) * dt)
        if i in (10, 350):
            ts = request_transition(ts, t)
        active, gs, cmd_out, hold, ts = gait_transition_step(
            ts, gs, source, target, cmd, t)
        gs = gait_update(active, gs, t, stance_contact_mask(gs))
    assert int(ts.phase) == TransitionPhase.NONE
    assert float(ts.active_idx) == 0.0   # back on gait A
    np.testing.assert_allclose(float(active.stance_duration[0]), 0.3,
                               atol=1e-6)


def test_closed_loop_trot_walk_trot():
    """Trot -> (slow-down, stance-hold) -> walk -> trot on the SRB sim,
    driven through TwistCommand.gait_switch, without falling. Matches
    qr_fsm_state_locomotion.cpp:161-340 wired into the closed loop."""
    from quadruped_tpu.control import mpc as mpc_mod, swing as swing_mod
    from quadruped_tpu.control.locomotion import LocomotionConfig
    from quadruped_tpu.sim.rollout import rollout_init, rollout_segment

    from quadruped_tpu.robots import a1_params

    walk4 = _config(0.45, 0.75, [0.5, 0.0, 0.75, 0.25])
    config = LocomotionConfig(
        mpc=mpc_mod.MpcConfig(horizon=5, qp_iters=24, qp_cold_iters=120),
        swing=swing_mod.SwingConfig(), gait=ADVANCED_TROT(), gait_b=walk4)
    params = a1_params()
    dt = 0.002

    seg = jax.jit(
        lambda carry, sw, steps: rollout_segment(
            config, params,
            TwistCommand.constant(vx=0.25, gait_switch=sw), carry, steps,
            dt),
        static_argnums=2)

    carry = rollout_init(config, params)
    # 1) establish the trot.
    carry, res1 = seg(carry, 0.0, 400)
    assert float(res1.alive) == 1.0
    assert int(carry.ctrl.transition.phase) == TransitionPhase.NONE

    # 2) raise the switch line: decel (early-exits on full stance) + hold.
    carry, res2 = seg(carry, 1.0, 400)
    assert float(res2.alive) == 1.0
    assert int(carry.ctrl.transition.phase) in (TransitionPhase.DECEL,
                                                TransitionPhase.STAND)
    # During the hold the robot stands: all four legs carry force at the
    # segment end.
    final_fz = np.asarray(res2.forces_trace)[-1, :, 2]
    assert (final_fz > 1.0).all(), final_fz

    # 3) hold completes, walk gait active, still alive and progressing.
    carry, res3 = seg(carry, 0.0, 1000)
    assert float(res3.alive) == 1.0
    assert int(carry.ctrl.transition.phase) == TransitionPhase.NONE
    assert float(carry.ctrl.transition.active_idx) == 1.0
    # Walk table really drives the clock: at most one leg swings at a time
    # (duty 0.75 four-beat walk) over the last full cycle.
    swing_counts = 4 - np.asarray(
        [(np.asarray(res3.forces_trace)[k, :, 2] > 0.5).sum()
         for k in range(-300, 0)])
    assert swing_counts.max() <= 2   # walk: 1 swinging (2 transiently)

    # 4) switch back to trot.
    carry, res4 = seg(carry, 1.0, 400)
    carry, res5 = seg(carry, 0.0, 900)
    assert float(res5.alive) == 1.0
    assert int(carry.ctrl.transition.phase) == TransitionPhase.NONE
    assert float(carry.ctrl.transition.active_idx) == 0.0
