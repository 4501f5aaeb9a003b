"""H=16 MPC in the closed loop — the 0.48 s-lookahead configuration
actually trots.

long_horizon_config (control/mpc.py) is solver-gated by the internal-
oracle cadence tests (tests/test_golden_parity.py::test_long_horizon_*);
this test validates the other half of the alpha=1e-4 regularizer
decision: control QUALITY. The H=16 move-blocked controller must run the
same closed-loop trot the H=10 production config runs, with comparable
height band and velocity tracking — demonstrating that the regularizer
shift (which moves individual converged forces by up to ~20% m*g among
near-cost-equivalent force schedules) does not degrade the realized
motion, which is what the force schedule exists for.
"""

import jax
import numpy as np

from quadruped_tpu.control import swing
from quadruped_tpu.control.desired_state import TwistCommand
from quadruped_tpu.control.locomotion import LocomotionConfig
from quadruped_tpu.control.mpc import MpcConfig, long_horizon_config
from quadruped_tpu.gait import ADVANCED_TROT
from quadruped_tpu.robots import a1_params
from quadruped_tpu.sim.rollout import rollout


def run(mpc_cfg, steps=2000):
    config = LocomotionConfig(mpc=mpc_cfg, swing=swing.SwingConfig(),
                              gait=ADVANCED_TROT())
    res = jax.jit(lambda: rollout(config, a1_params(),
                                  TwistCommand.constant(vx=0.3),
                                  steps=steps))()
    h = np.asarray(res.base_height_trace)
    v = np.asarray(res.vel_trace)[:, 0]
    return float(res.alive), h, v


def test_h16_trot_matches_h10():
    alive16, h16, v16 = run(long_horizon_config(qp_cold_iters=400))
    assert alive16 == 1.0
    alive10, h10, v10 = run(MpcConfig(horizon=10, qp_cold_iters=400))
    assert alive10 == 1.0

    tail = slice(1200, 2000)
    # Both configs hold the same trot: height bands overlap within 2 cm,
    # velocity tracking within 0.08 m/s of each other.
    assert np.isfinite(h16).all()
    assert abs(h16[tail].mean() - h10[tail].mean()) < 0.02, (
        h16[tail].mean(), h10[tail].mean())
    assert abs(v16[tail].mean() - v10[tail].mean()) < 0.08, (
        v16[tail].mean(), v10[tail].mean())
    assert h16[tail].min() > 0.2
