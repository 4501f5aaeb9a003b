import jax
import jax.numpy as jnp
import numpy as np

from quadruped_tpu.control.desired_state import TwistCommand
from quadruped_tpu.control.gait_transition import (TransitionPhase,
                                                   gait_transition_init,
                                                   gait_transition_step,
                                                   request_transition)
from quadruped_tpu.gait import TROT, BOUND, gait_init, gait_update, stance_contact_mask


def test_transition_sequence():
    source, target = TROT(), BOUND()
    ts = gait_transition_init()
    gs = gait_init(source)
    cmd = TwistCommand.constant(vx=0.4)

    dt = 0.01
    t = 0.0
    phases, scales, periods = [], [], []
    for i in range(320):
        t = (i + 1) * dt
        if i == 10:
            ts = request_transition(ts, jnp.asarray(t))
        active, gs, cmd_out, ts = gait_transition_step(
            ts, gs, source, target, cmd, jnp.asarray(t))
        gs = gait_update(active, gs, jnp.asarray(t),
                         stance_contact_mask(gs))
        phases.append(int(ts.phase))
        scales.append(float(cmd_out.linear[0]))
        periods.append(float(active.stance_duration[0]))

    phases = np.asarray(phases)
    scales = np.asarray(scales)
    periods = np.asarray(periods)
    # Ordered phases: NONE -> DECEL -> STAND -> NONE.
    assert phases[5] == TransitionPhase.NONE
    assert (phases == TransitionPhase.DECEL).any()
    assert (phases == TransitionPhase.STAND).any()
    assert phases[-1] == TransitionPhase.NONE
    # Command ramps to zero then returns.
    np.testing.assert_allclose(scales[0], 0.4, atol=1e-6)
    np.testing.assert_allclose(scales[150], 0.0, atol=1e-6)
    np.testing.assert_allclose(scales[-1], 0.4, atol=1e-6)
    # Gait table swapped: stance duration goes 0.3 (trot) -> 0.25 (bound).
    np.testing.assert_allclose(periods[0], 0.3, atol=1e-6)
    assert abs(periods[-1] - 0.25) < 1e-6
