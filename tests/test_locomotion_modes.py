"""Closed-loop checks for the non-MPC locomotion modes (force-balance
stance paths: VELOCITY and POSITION)."""

import jax
import jax.numpy as jnp
import numpy as np

from quadruped_tpu.control import mpc as mpc_mod, swing as swing_mod
from quadruped_tpu.control.desired_state import ControlMode, TwistCommand
from quadruped_tpu.control.locomotion import LocomotionConfig
from quadruped_tpu.gait import TROT
from quadruped_tpu.robots import a1_params
from quadruped_tpu.sim.rollout import rollout


def run_mode(mode, vx=0.25, steps=400):
    params = a1_params()
    config = LocomotionConfig(
        mpc=mpc_mod.MpcConfig(horizon=5, qp_iters=30),
        swing=swing_mod.SwingConfig(mode=mode),
        gait=TROT(),
        mode=mode)
    cmd = TwistCommand.constant(vx=vx, body_height=0.27)
    return jax.jit(lambda: rollout(config, params, cmd, steps=steps))()


def test_velocity_mode_trot_stable():
    res = run_mode(ControlMode.VELOCITY)
    assert float(res.alive) == 1.0
    h = np.asarray(res.base_height_trace)
    assert np.all(np.isfinite(h))
    assert 0.2 < h[-1] < 0.35
    # Moves forward under the velocity command.
    vx = np.asarray(res.vel_trace)[:, 0]
    assert vx[-50:].mean() > 0.05


def test_position_mode_runs():
    res = run_mode(ControlMode.POSITION, vx=0.1, steps=300)
    assert float(res.alive) == 1.0
    assert np.all(np.isfinite(np.asarray(res.base_height_trace)))
