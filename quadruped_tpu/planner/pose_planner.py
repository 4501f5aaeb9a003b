"""Walk-mode base pose planner, batched.

Capability parity with `qrPosePlanner`
(quadruped/src/planner/qr_pose_planner.cpp, header
include/quadruped/planner/qr_pose_planner.h:44-458): during the walk gait's
move-base window, plan a 6-D base pose target over the upcoming support
polygon (contact feet in CCW order; the reference optimizes the pose over
polygon projections, :72+) and serve interpolated intermediate pose/twist
setpoints to the stance controller (`GetIntermediateBasePose` :327, :345).

The TPU version plans the target as the stability-margin centroid of the
support feet (the fixed point the reference's projection optimization
converges to on flat ground) with ground-aligned orientation, and
interpolates with the velocity-continuous cubic from core/splines — one
fused computation per tick, batched over scenarios.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct

from quadruped_tpu.core import splines
from quadruped_tpu.robots.params import RobotParams


@struct.dataclass
class PosePlannerState:
    pose_start: jnp.ndarray    # [6] (xyz, rpy) at plan start, world
    pose_target: jnp.ndarray   # [6]
    planned: jnp.ndarray       # [] 1.0 once a plan is latched


def pose_planner_init() -> PosePlannerState:
    return PosePlannerState(
        pose_start=jnp.zeros(6, jnp.float32),
        pose_target=jnp.zeros(6, jnp.float32),
        planned=jnp.zeros((), jnp.float32))


def plan_target_pose(params: RobotParams,
                     base_position: jnp.ndarray,     # [3] world
                     base_rpy: jnp.ndarray,          # [3]
                     foot_positions_world: jnp.ndarray,  # [4, 3]
                     support_mask: jnp.ndarray,      # [4] legs staying in stance
                     ground_rpy: jnp.ndarray,        # [3] control-frame rpy
                     body_height) -> jnp.ndarray:
    """[6] target pose: CoM over the weighted support centroid, ground
    aligned (ResetBasePose / Update semantics)."""
    n = jnp.maximum(jnp.sum(support_mask), 1.0)
    centroid = jnp.sum(foot_positions_world * support_mask[:, None],
                       axis=0) / n
    target_xy = centroid[:2] + params.com_offset[:2]
    target_z = centroid[2] + body_height
    target_rpy = jnp.stack([ground_rpy[0], ground_rpy[1], base_rpy[2]])
    return jnp.concatenate([jnp.stack([target_xy[0], target_xy[1], target_z]),
                            target_rpy])


def pose_planner_update(state: PosePlannerState, params: RobotParams,
                        *,
                        base_position: jnp.ndarray,
                        base_rpy: jnp.ndarray,
                        foot_positions_world: jnp.ndarray,
                        support_mask: jnp.ndarray,
                        ground_rpy: jnp.ndarray,
                        body_height,
                        replan: jnp.ndarray) -> PosePlannerState:
    """Latch a new plan when `replan` fires (walk gait's stop-semaphore /
    move-base start, qr_locomotion_controller.cpp:90-105)."""
    target = plan_target_pose(params, base_position, base_rpy,
                              foot_positions_world, support_mask,
                              ground_rpy, body_height)
    current = jnp.concatenate([base_position, base_rpy])
    do = (replan > 0.5) | (state.planned < 0.5)
    return PosePlannerState(
        pose_start=jnp.where(do, current, state.pose_start),
        pose_target=jnp.where(do, target, state.pose_target),
        planned=jnp.ones((), jnp.float32))


def intermediate_base_pose(state: PosePlannerState, phase: jnp.ndarray):
    """(pose [6], twist [6]) at `phase` in [0, 1] along the planned segment
    (GetIntermediateBasePose :327-345) — cubic with zero end velocities."""
    zeros = jnp.zeros_like(state.pose_start)
    pose, vel = splines.cubic_hermite(state.pose_start, zeros,
                                      state.pose_target, zeros,
                                      phase[..., None])
    return pose, vel
