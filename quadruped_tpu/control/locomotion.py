"""Locomotion controller: one fused control tick, batched.

Capability parity with `qrLocomotionController::{Update, GetAction}`
(quadruped/src/controllers/qr_locomotion_controller.cpp:69-147): advance the
gait clocks, update swing + stance controllers, and merge the per-joint swing
commands over the stance torque map into one 12-joint hybrid command.

The reference merges with a std::map overlay (swing joints win); here the
merge is a masked select: swing joints get {q, Kp, dq, Kd, 0}, stance joints
get {0, 0, 0, Kd_damp, tau_ff} (the MPC stance command shape at
qr_mpc_stance_leg_controller.cpp:137-153).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct

from quadruped_tpu.gait.scheduler import (GaitConfig, GaitState, gait_init,
                                          gait_update, stance_contact_mask)
from quadruped_tpu.robots.params import RobotParams
from quadruped_tpu.control.types import RobotObservation, HybridCommand
from quadruped_tpu.control.desired_state import (DesiredStateCommand,
                                                 TwistCommand,
                                                 desired_state_init,
                                                 desired_state_update)
from quadruped_tpu.control import mpc as mpc_mod
from quadruped_tpu.control import swing as swing_mod

STANCE_KD = 3.0  # damping on stance joints (reference legCommand {0,0,0,3,tau})


@struct.dataclass
class LocomotionConfig:
    mpc: mpc_mod.MpcConfig
    swing: swing_mod.SwingConfig
    gait: GaitConfig


@struct.dataclass
class LocomotionState:
    gait: GaitState
    mpc: mpc_mod.MpcState
    swing: swing_mod.SwingState
    command: DesiredStateCommand


def locomotion_init(config: LocomotionConfig, params: RobotParams,
                    obs: RobotObservation) -> LocomotionState:
    return LocomotionState(
        gait=gait_init(config.gait),
        mpc=mpc_mod.mpc_init(config.mpc, float(params.body_height)),
        swing=swing_mod.swing_init(params, obs),
        command=desired_state_init(float(params.body_height)),
    )


def locomotion_step(config: LocomotionConfig, params: RobotParams,
                    state: LocomotionState, obs: RobotObservation,
                    cmd: TwistCommand, t: jnp.ndarray):
    """One 500 Hz-1 kHz control tick.

    Returns (HybridCommand, forces_world [4,3], new state).
    """
    des = desired_state_update(state.command, cmd)
    gait_state = gait_update(config.gait, state.gait, t, obs.foot_contact)

    q_sw, dq_sw, swing_mask, swing_state = swing_mod.swing_step(
        config.swing, params, config.gait, gait_state, state.swing, obs, des)

    tau_stance, forces_world, _, mpc_state = mpc_mod.mpc_step(
        config.mpc, params, config.gait, gait_state, state.mpc, obs, des)

    stance_joint_mask = jnp.repeat(stance_contact_mask(gait_state), 3)
    sw = swing_mask > 0.5
    command = HybridCommand(
        q=jnp.where(sw, q_sw, 0.0),
        kp=jnp.where(sw, params.motor_kp, 0.0),
        dq=jnp.where(sw, dq_sw, 0.0),
        kd=jnp.where(sw, params.motor_kd, STANCE_KD * stance_joint_mask),
        tau=jnp.where(sw, 0.0, tau_stance),
    )
    new_state = LocomotionState(gait=gait_state, mpc=mpc_state,
                                swing=swing_state, command=des)
    return command, forces_world, new_state
