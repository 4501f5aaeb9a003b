"""Pure-array single-rigid-body rollout simulator (speed-of-light mode).

Replaces the reference's ROS/Gazebo closed loop (simulation/qr_gazebo +
qrRobotA1Sim's 17-topic bridge, quadruped/src/robots/qr_robot_a1_sim.cpp)
with batched array stepping for the control loop's fast fidelity mode: the
trunk is the 13-state SRB integrated under the stance contact forces; swing
legs track their joint targets through a first-order servo; stance feet are
kinematically welded to their world anchor (no slip), exactly the contract
the force controllers assume.

The whole-body (18-DoF Featherstone + penalty contact + hybrid motor law)
fidelity mode lives in sim/whole_body.py; this module is the rollout
workhorse for MPC benchmarking and scenario sweeps — thousands of instances
per chip under vmap.

Sim-state frame conventions match the observation struct: quaternion
(w,x,y,z) body->world, velocities in world frame.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct

from quadruped_tpu.core import se3
from quadruped_tpu.robots import kinematics
from quadruped_tpu.robots.params import RobotParams
from quadruped_tpu.control.types import RobotObservation, HybridCommand


@struct.dataclass
class SrbSimState:
    position: jnp.ndarray      # [3] CoM world position
    quat: jnp.ndarray          # [4] body->world
    vel_world: jnp.ndarray     # [3]
    omega_world: jnp.ndarray   # [3]
    q: jnp.ndarray             # [12] joint angles
    dq: jnp.ndarray            # [12]
    foot_anchor: jnp.ndarray   # [4, 3] world positions of stance feet
    t: jnp.ndarray             # [] sim time


def srb_sim_init(params: RobotParams, body_height=None) -> SrbSimState:
    h = params.body_height if body_height is None else body_height
    q0 = params.stand_angles
    foot_base = kinematics.foot_positions_in_base_frame(params, q0)
    pos = jnp.stack([jnp.zeros(()), jnp.zeros(()), jnp.asarray(h, jnp.float32)])
    anchors = foot_base + pos  # identity orientation at start
    anchors = anchors.at[:, 2].set(0.0)
    return SrbSimState(
        position=pos,
        quat=jnp.asarray([1.0, 0, 0, 0], jnp.float32),
        vel_world=jnp.zeros(3, jnp.float32),
        omega_world=jnp.zeros(3, jnp.float32),
        q=q0, dq=jnp.zeros(12, jnp.float32),
        foot_anchor=anchors,
        t=jnp.zeros((), jnp.float32))


def observe(params: RobotParams, state: SrbSimState,
            contact: jnp.ndarray) -> RobotObservation:
    r = se3.quat_to_rotmat(state.quat)
    return RobotObservation(
        base_position=state.position,
        base_rpy=se3.quat_to_rpy(state.quat),
        base_quat=state.quat,
        base_vel_world=state.vel_world,
        base_omega_world=state.omega_world,
        base_omega_body=state.omega_world @ r,  # R^T w
        joint_angles=state.q,
        joint_velocities=state.dq,
        foot_contact=contact,
        foot_forces=contact * params.total_mass * 9.81 / 4.0,
    )


def srb_sim_step(params: RobotParams, state: SrbSimState,
                 forces_world: jnp.ndarray,      # [4, 3] stance GRFs
                 stance_mask: jnp.ndarray,       # [4]
                 q_swing_des: jnp.ndarray,       # [12] swing joint targets
                 dq_swing_des: jnp.ndarray,      # [12]
                 swing_joint_mask: jnp.ndarray,  # [12]
                 dt) -> SrbSimState:
    """One sim tick.

    Trunk: SRB under the masked stance forces (+gravity).
    Swing joints: critically-damped first-order tracking of the commanded
    targets (time constant ~20 ms, the closed-loop bandwidth the reference's
    kp=100/kd=1-2 motor law achieves on the real actuators).
    Stance joints: recomputed by IK so stance feet stay welded to their
    world anchors under the new base pose.
    """
    r = se3.quat_to_rotmat(state.quat)
    mass = params.total_mass
    f = forces_world * stance_mask[:, None]

    # --- trunk dynamics ---
    acc = jnp.sum(f, axis=0) / mass + jnp.asarray([0.0, 0.0, -9.81],
                                                  f.dtype)
    foot_base = kinematics.foot_positions_in_base_frame(params, state.q)
    r_feet_world = jnp.einsum("ij,lj->li", r, foot_base - params.com_offset)
    torque = jnp.sum(jnp.cross(r_feet_world, f) * stance_mask[:, None],
                     axis=0)
    i_world = r @ params.total_inertia @ r.T
    ang_acc = jnp.linalg.solve(i_world, torque)

    vel = state.vel_world + acc * dt
    omega = state.omega_world + ang_acc * dt
    pos = state.position + vel * dt
    omega_body = omega @ r
    quat = se3.quat_integrate(state.quat, omega_body, dt)
    r_new = se3.quat_to_rotmat(quat)

    # --- legs ---
    # Swing joints servo toward their targets.
    servo_tau = dt / 0.02
    q_swing = state.q + jnp.clip(servo_tau, 0.0, 1.0) * (q_swing_des - state.q)
    dq_swing = dq_swing_des

    # Stance feet welded: q from IK of anchor in the new base frame.
    anchor = jnp.where(stance_mask[:, None] > 0.5, state.foot_anchor,
                       jnp.einsum("ij,lj->li", r_new, foot_base) + pos)
    foot_base_new = jnp.einsum("ji,lj->li", r_new, anchor - pos)
    q_stance = kinematics.joint_angles_from_foot_positions(params,
                                                           foot_base_new)
    # Stance joint velocity: J dq = -R^T(v + w x r)  (foot fixed in world).
    foot_vel_base = -jnp.einsum(
        "ji,lj->li", r_new,
        vel[None, :] + jnp.cross(jnp.broadcast_to(omega, (4, 3)),
                                 jnp.einsum("ij,lj->li", r_new, foot_base_new)))
    jac = kinematics.all_leg_jacobians(params, q_stance)
    dq_stance = kinematics.damped_jacobian_solve(jac, foot_vel_base)

    stance_joint_mask = jnp.repeat(stance_mask, 3)
    q_new = jnp.where(stance_joint_mask > 0.5, q_stance,
                      jnp.where(swing_joint_mask > 0.5, q_swing, state.q))
    dq_new = jnp.where(stance_joint_mask > 0.5, dq_stance.reshape(12),
                       jnp.where(swing_joint_mask > 0.5, dq_swing,
                                 jnp.zeros_like(state.dq)))

    return state.replace(
        position=pos, quat=quat, vel_world=vel, omega_world=omega,
        q=q_new, dq=dq_new, foot_anchor=anchor, t=state.t + dt)
