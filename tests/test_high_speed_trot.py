"""High-speed trot on the 18-DoF whole-body sim — the reference velocity
envelope demonstrated closed-loop.

The reference clips trot commands to vx in [-1, 2] m/s
(quadruped/src/controllers/mpc/qr_mpc_stance_leg_controller.cpp:178-179)
but never demonstrates the envelope; round 3 of this framework topped out
at 0.8 m/s ad hoc. The gating physics is the GAIT, not the controller:
with the reference's +/-0.2 m foothold clip, achievable speed is roughly
2 * clip / cycle_time — ~0.5 m/s at the 0.833 s advanced-trot cycle
(measured saturation ~0.55), ~1.2 m/s at the 0.4 s FAST_TROT cycle.
Measured sweep: benchmarks/exp_high_speed_trot.py.

These tests pin the demonstrated envelope: >= 1.0 m/s achieved forward
(5 s, no fall, bounded pitch) on FAST_TROT, and backward walking at
-0.5 m/s commanded (the reference's backward bound) on the standard trot.
"""

import jax
import jax.numpy as jnp
import numpy as np

from quadruped_tpu.control import mpc, swing
from quadruped_tpu.control.desired_state import TwistCommand
from quadruped_tpu.control.locomotion import (LocomotionConfig,
                                              locomotion_init,
                                              locomotion_step)
from quadruped_tpu.dynamics import floating_base as fb
from quadruped_tpu.gait import FAST_TROT, TROT
from quadruped_tpu.gait.scheduler import _config
from quadruped_tpu.robots import a1_params
from quadruped_tpu.sim import whole_body as wb

DT = 0.002


def run_whole_body_trot(vx_cmd, gait_cfg, seconds=5.0, swing_cfg=None,
                        mpc_kw=None):
    params = a1_params()
    config = LocomotionConfig(
        mpc=mpc.MpcConfig(horizon=5, qp_iters=24, qp_cold_iters=120,
                          **(mpc_kw or {})),
        swing=swing_cfg or swing.SwingConfig(), gait=gait_cfg)
    cmd = TwistCommand.constant(vx=float(vx_cmd), body_height=0.27)
    steps = int(seconds / DT)

    model = fb.build_model(params)
    cm = wb.ContactModel()
    sim0 = wb.whole_body_init(params)
    obs0 = wb.observe(params, model, sim0, cm)
    ctrl0 = locomotion_init(config, params, obs0)

    def step(carry, i):
        sim, ctrl = carry
        obs = wb.observe(params, model, sim, cm)
        t = (i + 1).astype(jnp.float32) * DT
        command, forces, ctrl = locomotion_step(config, params, ctrl, obs,
                                                cmd, t)
        sim, _ = wb.whole_body_step(params, model, sim, command, cm, DT)
        return (sim, ctrl), (sim.fb.position[2],
                             wb.observe(params, model, sim,
                                        cm).base_vel_world[0],
                             obs.base_rpy[1])

    _, (h, vxs, pitch) = jax.jit(lambda: jax.lax.scan(
        step, (sim0, ctrl0), jnp.arange(steps)))()
    return np.asarray(h), np.asarray(vxs), np.asarray(pitch)


def assert_alive(h, pitch):
    tail = slice(int(len(h) * 0.6), len(h))
    assert np.isfinite(h).all()
    assert (h[tail] > 0.15).all(), h[tail].min()
    assert (np.abs(pitch) < 0.5).all(), np.abs(pitch).max()


def test_trot_one_meter_per_second():
    """>= 1.0 m/s ACHIEVED (not just commanded) for the last 2 s of a 5 s
    run — the forward half of the reference envelope, demonstrated."""
    h, vxs, pitch = run_whole_body_trot(1.5, FAST_TROT())
    assert_alive(h, pitch)
    tail = slice(int(len(h) * 0.6), len(h))
    assert vxs[tail].mean() >= 1.0, vxs[tail].mean()


def test_trot_backward():
    """Backward trot at the reference's -0.5 m/s command bound
    (qr_mpc_stance_leg_controller.cpp:178 lower clip is -1.0; -0.5 is the
    demonstrated operating point): stays up, moves backward."""
    h, vxs, pitch = run_whole_body_trot(-0.5, TROT())
    assert_alive(h, pitch)
    tail = slice(int(len(h) * 0.6), len(h))
    assert vxs[tail].mean() <= -0.3, vxs[tail].mean()


def _sprint_config():
    """The round-5 sprint configuration (benchmarks/exp_high_speed_trot.py
    raibert/raibert2 sweeps): 0.3 s-cycle trot, Raibert forward placement
    gain 0.3 (the v*stance/2 symmetric-support term the reference's
    advanced law lacks but its other two planners carry), foothold clip
    0.3, MPC velocity weight 20."""
    gait = _config(0.15, 0.5, [0.5, 0.0, 0.0, 0.5])
    swing_cfg = swing.SwingConfig(
        foothold_clip=jnp.asarray(0.3, jnp.float32),
        foothold_forward_gain=jnp.asarray(0.3, jnp.float32))
    w = jnp.asarray([10, 10, 5, 40, 60, 100, 0, 0, 0.5, 20.0, 5, 1, 0.0],
                    jnp.float32)
    return gait, swing_cfg, dict(state_weights=w)


def test_trot_one_point_five_meters_per_second():
    """>= 1.5 m/s ACHIEVED — the upper half of the reference's [-1, 2]
    command envelope, demonstrated (VERDICT r4 item 4). Measured best:
    1.64 m/s at cmd 2.0 (1.70 at wv40); the gate leaves margin."""
    gait, swing_cfg, mpc_kw = _sprint_config()
    h, vxs, pitch = run_whole_body_trot(2.0, gait, swing_cfg=swing_cfg,
                                        mpc_kw=mpc_kw)
    assert_alive(h, pitch)
    tail = slice(int(len(h) * 0.6), len(h))
    assert vxs[tail].mean() >= 1.5, vxs[tail].mean()
    assert (np.abs(pitch) < 0.25).all(), np.abs(pitch).max()


def test_trot_backward_at_command_bound():
    """Backward at the reference's -1.0 m/s command bound: stable, and
    tracking well past round 4's -0.65 plateau (measured -0.84 with the
    Raibert term at gain 0.5; gate at -0.75)."""
    gait = FAST_TROT()
    swing_cfg = swing.SwingConfig(
        foothold_clip=jnp.asarray(0.3, jnp.float32),
        foothold_forward_gain=jnp.asarray(0.5, jnp.float32))
    w = jnp.asarray([10, 10, 5, 40, 60, 100, 0, 0, 0.5, 20.0, 5, 1, 0.0],
                    jnp.float32)
    h, vxs, pitch = run_whole_body_trot(-1.0, gait, swing_cfg=swing_cfg,
                                        mpc_kw=dict(state_weights=w))
    assert_alive(h, pitch)
    tail = slice(int(len(h) * 0.6), len(h))
    assert vxs[tail].mean() <= -0.75, vxs[tail].mean()


def test_trot_one_meter_per_second_estimated():
    """The >= 1 m/s trot ON ESTIMATES: noisy IMU/encoders -> estimation
    container -> controller (the reference's actual operating condition —
    every controller reads qrRobotEstimator outputs, never ground truth).
    """
    import quadruped_tpu.core.se3 as se3
    from quadruped_tpu.estimation.container import (EstimatorConfig,
                                                    RawSensors)
    from quadruped_tpu.estimation.velocity import VelocityEstimatorConfig
    from quadruped_tpu.exec import RunnerConfig, runner_init, runner_step

    params = a1_params()
    model = fb.build_model(params)
    cm = wb.ContactModel()
    config = RunnerConfig(
        locomotion=LocomotionConfig(
            mpc=mpc.MpcConfig(horizon=5, qp_iters=24, qp_cold_iters=120),
            swing=swing.SwingConfig(), gait=FAST_TROT()),
        estimator=EstimatorConfig(velocity=VelocityEstimatorConfig(
            window_size=20, acc_filter_window=5)),
        use_estimators=True)
    cmd = TwistCommand.constant(vx=1.5, body_height=0.27)
    # The FSM spends ~2.5 s in STAND_UP plus ~1.5 s of velocity-filter
    # ramp before full speed; run 7 s and score the final 1.4 s.
    steps = int(7.0 / DT)

    sim0 = wb.whole_body_init(params)
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
            acc_body=acc_world @ r + 0.3 * jax.random.normal(k1, (3,)),
            omega_body=truth.base_omega_body
            + 0.02 * jax.random.normal(k2, (3,)),
            joint_angles=truth.joint_angles
            + 0.002 * jax.random.normal(k3, (12,)),
            joint_velocities=truth.joint_velocities
            + 0.05 * jax.random.normal(k4, (12,)),
            foot_forces=truth.foot_forces)
        command, forces, st, est_obs = runner_step(config, params, st, cmd,
                                                   sensors=sensors)
        sim, _ = wb.whole_body_step(params, model, sim, command, cm, DT)
        return (sim, st, truth.base_vel_world), \
            (sim.fb.position[2], truth.base_vel_world[0],
             truth.base_rpy[1])

    keys = jax.random.split(jax.random.PRNGKey(3), steps)
    _, (h, vxs, pitch) = jax.jit(lambda: jax.lax.scan(
        step, (sim0, st0, jnp.zeros(3)), keys))()
    h, vxs, pitch = np.asarray(h), np.asarray(vxs), np.asarray(pitch)
    tail = slice(int(len(h) * 0.8), len(h))
    assert np.isfinite(h).all()
    assert (h[tail] > 0.15).all(), h[tail].min()
    assert (np.abs(pitch[len(h) // 2:]) < 0.5).all()
    # >= 0.95 m/s ground-truth speed over the final 1.4 s (estimates cost
    # a few percent of tracking vs the ground-truth-observation run).
    assert vxs[tail].mean() >= 0.95, vxs[tail].mean()
