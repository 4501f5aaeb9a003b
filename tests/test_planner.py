import jax.numpy as jnp
import numpy as np

from quadruped_tpu.gait import TROT, gait_init
from quadruped_tpu.gait.scheduler import LegState
from quadruped_tpu.planner import com_adjuster, pose_planner, foot_stepper
from quadruped_tpu.robots import a1_params


FEET = jnp.asarray([[0.17, -0.13, -0.3], [0.17, 0.13, -0.3],
                    [-0.17, -0.13, -0.3], [-0.17, 0.13, -0.3]])


def test_com_adjuster_centered_when_all_stance():
    state = gait_init(TROT()).replace(
        normalized_phase=jnp.full((4,), 0.5))
    com = com_adjuster.com_position_in_base_frame(state, FEET)
    np.testing.assert_allclose(com[:2], 0.0, atol=1e-5)


def test_com_adjuster_shifts_away_from_swing_leg():
    # FR (leg 0, front-right) swinging -> CoM shifts toward the support
    # triangle (negative x, positive y).
    state = gait_init(TROT()).replace(
        leg_state=jnp.asarray([LegState.SWING, 1, 1, 1], jnp.int32),
        normalized_phase=jnp.full((4,), 0.5))
    com = com_adjuster.com_position_in_base_frame(state, FEET)
    assert float(com[0]) < -1e-3
    assert float(com[1]) > 1e-3


def test_pose_planner_targets_support_centroid():
    params = a1_params()
    state = pose_planner.pose_planner_init()
    feet_world = FEET + jnp.asarray([0.5, 0.0, 0.3])
    state = pose_planner.pose_planner_update(
        state, params,
        base_position=jnp.asarray([0.4, 0.0, 0.3]),
        base_rpy=jnp.asarray([0.0, 0.0, 0.2]),
        foot_positions_world=feet_world,
        support_mask=jnp.ones(4),
        ground_rpy=jnp.zeros(3),
        body_height=jnp.asarray(0.3),
        replan=jnp.ones(()))
    target = np.asarray(state.pose_target)
    np.testing.assert_allclose(target[0], 0.5 + float(params.com_offset[0]),
                               atol=1e-5)
    np.testing.assert_allclose(target[5], 0.2, atol=1e-6)  # keeps yaw

    pose_mid, vel_mid = pose_planner.intermediate_base_pose(
        state, jnp.asarray(0.5))
    start = np.asarray(state.pose_start)
    assert np.all((pose_mid >= np.minimum(start, target) - 1e-5)
                  & (pose_mid <= np.maximum(start, target) + 1e-5))
    p0, _ = pose_planner.intermediate_base_pose(state, jnp.asarray(0.0))
    p1, _ = pose_planner.intermediate_base_pose(state, jnp.asarray(1.0))
    np.testing.assert_allclose(p0, start, atol=1e-5)
    np.testing.assert_allclose(p1, target, atol=1e-5)


def test_foot_stepper_avoids_gaps():
    gap_centers = jnp.asarray([0.5])
    width = 0.12
    feet = jnp.asarray([[0.5, -0.13, 0.0], [0.52, 0.13, 0.0],
                        [0.15, -0.13, 0.0], [0.15, 0.13, 0.0]])
    adjusted = foot_stepper.adjust_footholds_for_gaps(feet, gap_centers,
                                                      width)
    bad = foot_stepper.gap_infeasible(adjusted[:, 0], gap_centers, width)
    assert not bool(jnp.any(bad))
    # Offset applied uniformly.
    np.testing.assert_allclose(np.asarray(adjusted[:, 0] - feet[:, 0]),
                               float(adjusted[0, 0] - feet[0, 0]), atol=1e-6)


def test_foot_stepper_keeps_feasible_nominal():
    gap_centers = jnp.asarray([5.0])
    feet = jnp.asarray([[0.5, -0.13, 0.0], [0.5, 0.13, 0.0],
                        [0.15, -0.13, 0.0], [0.15, 0.13, 0.0]])
    adjusted = foot_stepper.adjust_footholds_for_gaps(feet, gap_centers, 0.1)
    np.testing.assert_allclose(adjusted, feet, atol=1e-6)


def test_stairs_snap():
    feet = jnp.asarray([[0.8, -0.13, 0.0], [0.8, 0.13, 0.0],
                        [0.3, -0.13, 0.0], [0.3, 0.13, 0.0]])
    snapped = foot_stepper.snap_to_stairs(feet, step_length=0.25,
                                          step_height=0.06, start_x=0.5)
    # 0.8 is on tread floor((0.3)/0.25)=1 -> z = 0.06; 0.3 is before stairs.
    np.testing.assert_allclose(snapped[0, 2], 0.06, atol=1e-6)
    np.testing.assert_allclose(snapped[2, 2], 0.0, atol=1e-6)
