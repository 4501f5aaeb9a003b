"""Online gait switching: decelerate -> stand -> swap gait -> resume.

Capability parity with the reference's runtime gait transition
(qr_fsm_state_locomotion.cpp:271-340 `SwitchMode`/`StandLoop` + the
`qrSwitchModeReceiver` ROS hook): when a gait change is requested, the
commanded twist ramps to zero over ~1 s, the robot holds stance for ~1 s,
then the gait clock is re-initialized with the new gait table and the
command ramps back in.

Because gait tables are pytrees of identical structure, "swapping the gait"
is a masked select between two configs — fully batchable, so every scenario
in a batch can transition at its own time.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from quadruped_tpu.gait.scheduler import GaitConfig, GaitState, gait_init
from quadruped_tpu.control.desired_state import TwistCommand

DECEL_TIME = 1.0
STAND_TIME = 1.0


class TransitionPhase:
    NONE = 0
    DECEL = 1
    STAND = 2


@struct.dataclass
class GaitTransitionState:
    phase: jnp.ndarray        # [] int32 TransitionPhase
    phase_start: jnp.ndarray  # [] time the phase began
    use_target: jnp.ndarray   # [] 1.0 once the target gait is active


def gait_transition_init() -> GaitTransitionState:
    return GaitTransitionState(
        phase=jnp.asarray(TransitionPhase.NONE, jnp.int32),
        phase_start=jnp.zeros((), jnp.float32),
        use_target=jnp.zeros((), jnp.float32))


def request_transition(state: GaitTransitionState,
                       t: jnp.ndarray) -> GaitTransitionState:
    """Begin a transition (idempotent while one is active)."""
    idle = state.phase == TransitionPhase.NONE
    return state.replace(
        phase=jnp.where(idle, TransitionPhase.DECEL, state.phase)
        .astype(jnp.int32),
        phase_start=jnp.where(idle, t, state.phase_start))


def gait_transition_step(state: GaitTransitionState,
                         gait_state: GaitState,
                         source: GaitConfig, target: GaitConfig,
                         cmd: TwistCommand, t: jnp.ndarray):
    """One tick of the transition manager.

    Returns (active GaitConfig, possibly-reset GaitState, scaled cmd,
    new transition state). Call before `gait_update`.
    """
    elapsed = t - state.phase_start

    in_decel = state.phase == TransitionPhase.DECEL
    in_stand = state.phase == TransitionPhase.STAND

    # Command scaling: ramp to zero during DECEL, zero during STAND.
    scale = jnp.where(in_decel,
                      jnp.clip(1.0 - elapsed / DECEL_TIME, 0.0, 1.0),
                      jnp.where(in_stand, 0.0, 1.0))
    cmd_out = cmd.replace(linear=cmd.linear * scale,
                          angular_z=cmd.angular_z * scale)

    # Phase advance.
    decel_done = in_decel & (elapsed >= DECEL_TIME)
    stand_done = in_stand & (elapsed >= STAND_TIME)
    new_phase = jnp.where(decel_done, TransitionPhase.STAND, state.phase)
    new_phase = jnp.where(stand_done, TransitionPhase.NONE, new_phase)
    new_start = jnp.where(decel_done | stand_done, t, state.phase_start)
    use_target = jnp.where(stand_done, 1.0, state.use_target)

    # Active gait: masked select between configs (same pytree structure).
    pick = lambda a, b: jnp.where(use_target > 0.5, b, a)
    active = jax.tree.map(pick, source, target)

    # Reset the gait clock at the swap instant.
    fresh = gait_init(active)
    gait_out = jax.tree.map(
        lambda new, old: jnp.where(stand_done, new, old), fresh, gait_state)

    return active, gait_out, cmd_out, state.replace(
        phase=new_phase.astype(jnp.int32), phase_start=new_start,
        use_target=use_target)
