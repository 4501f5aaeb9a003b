"""Climb an 8 cm step with the walk stack and render it to a 3-D GIF.

    QTPU_CPU=1 python examples/example_stair_climb.py [out.gif] [seconds]

The statically-stable walk climbs a single 8 cm step on the 18-DoF
whole-body sim, with planner/foot_stepper.stair_foothold_adjust
coordinating the footholds (hold short of the riser, climb when the leg
pair allows) — the closed-loop capability the reference's qrFootStepper
exists for (qr_foot_stepper.cpp:339,:483), demonstrated and rendered
with the terrain wireframe. Same configuration as
tests/test_stair_climb.py; the 3-D render is the xpp/RViz analogue.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax

if os.environ.get("QTPU_CPU"):
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
import jax.numpy as jnp
import numpy as np

from quadruped_tpu.control import stance_force_balance as stance_fb
from quadruped_tpu.control.desired_state import TwistCommand
from quadruped_tpu.control.walk_locomotion import (WalkConfig, walk_init,
                                                   walk_step)
from quadruped_tpu.core import se3
from quadruped_tpu.dynamics import floating_base as fb
from quadruped_tpu.gait.scheduler import _config
from quadruped_tpu.gait.walk import SubLegState
from quadruped_tpu.planner import foot_stepper
from quadruped_tpu.robots import a1_params
from quadruped_tpu.sim import terrain, whole_body as wb
from quadruped_tpu.utils import viz3d

DT = 0.002
STEP_HEIGHT = 0.08
RISER_X = 0.25


def main(out="/tmp/stairs3d.gif", seconds="24"):
    seconds = float(seconds)
    params = a1_params()
    model = fb.build_model(params)
    cm = wb.ContactModel()
    terr = terrain.stairs(step_length=5.0, step_height=STEP_HEIGHT,
                          start_x=RISER_X - 5.0)
    stair = foot_stepper.StairParams(
        start_x=jnp.asarray(RISER_X), width=jnp.asarray(5.0),
        height=jnp.asarray(STEP_HEIGHT), count=jnp.asarray(1))

    def adjust(target, feet):
        x_adj, _ = foot_stepper.stair_foothold_adjust(
            feet[:, 0], stair, default_delta=0.1)
        return target.at[:, 0].set(x_adj)

    config = WalkConfig(
        gait=_config(3.7, 0.75, [0.5, 0.0, 0.75, 0.25], threshold=0.1),
        force_balance=stance_fb.ForceBalanceConfig(
            kp=jnp.asarray([100., 200., 100., 100., 100., 200.]),
            kd=jnp.asarray([40., 30., 10., 10., 10., 30.]),
            qp_iters=40))
    cmd = TwistCommand.constant(vx=0.03, body_height=0.27)

    sim0 = wb.whole_body_init(params)
    obs0 = wb.observe(params, model, sim0, cm, terrain_height=terr)
    st0 = walk_init(config, params, obs0)
    steps = int(seconds / DT)

    def step(carry, i):
        sim, st = carry
        obs = wb.observe(params, model, sim, cm, terrain_height=terr)
        command, forces, st = walk_step(
            config, params, st, obs, cmd,
            (i + 1).astype(jnp.float32) * DT,
            terrain_height=terr, foothold_adjust_fn=adjust)
        sim, flags = wb.whole_body_step(params, model, sim, command, cm,
                                        DT, terrain_height=terr)
        return (sim, st), (sim.fb.position, se3.quat_to_rpy(sim.fb.quat),
                           sim.fb.q, flags)

    (_, _), (pos, rpy, q, contact) = jax.jit(lambda: jax.lax.scan(
        step, (sim0, st0), jnp.arange(steps)))()
    pos = np.asarray(pos)
    print(f"climb: x {pos[0, 0]:+.2f} -> {pos[-1, 0]:+.2f} m, "
          f"z {pos[0, 2]:.3f} -> {pos[-1, 2]:.3f} m "
          f"(step {STEP_HEIGHT} m at x={RISER_X})")
    trace = viz3d.Viz3DTrace(position=pos, rpy=np.asarray(rpy),
                             joint_angles=np.asarray(q),
                             contact=np.asarray(contact))
    gif = viz3d.animate_rollout(params, trace, out, every=60, fps=10,
                                terrain=terr)
    png = viz3d.snapshot(params, trace, out.rsplit(".", 1)[0] + ".png",
                         ticks=(0, steps // 2, steps - 1), terrain=terr)
    print(f"wrote {gif} and {png}")


if __name__ == "__main__":
    main(*sys.argv[1:3])
