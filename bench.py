"""Headline benchmark: convex-MPC solves/s/chip at horizon 10 (A1 trot).

One "solve" counts the FULL MPC update as the reference defines it
(quadruped/src/controllers/mpc/qr_mpc_stance_leg_controller.cpp UpdateMPC +
SolveDenseMPC + qr_mpc_interface.cpp SolveMPC): desired-trajectory build,
SRB state-space matrices at the current yaw, ZOH discretization, horizon
condensation, friction-cone constraint build, and the QP solve — not just
the inner QP iterations (SURVEY.md §7.3 "benchmark honesty").

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "solves/s/chip", "vs_baseline": N}
vs_baseline is measured against the 100k solves/s/chip north star
(/root/repo/BASELINE.json).
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

HORIZON = 10
QP_ITERS = 40  # iteration budget the closed loop runs with (warm-started)
TARGET = 100_000.0


def build_bench(batch: int):
    from quadruped_tpu.robots import a1_params
    from quadruped_tpu.gait import ADVANCED_TROT, gait_init, gait_update, stance_contact_mask
    from quadruped_tpu.control import mpc as mpc_mod
    from quadruped_tpu.control.desired_state import (TwistCommand,
                                                     desired_state_init,
                                                     desired_state_update)
    from quadruped_tpu.sim import srb_sim

    params = a1_params()
    config = mpc_mod.MpcConfig(horizon=HORIZON, qp_iters=QP_ITERS)
    gait_config = ADVANCED_TROT()

    def init_one(vx):
        sim = srb_sim.srb_sim_init(params)
        obs = srb_sim.observe(params, sim, jnp.ones(4))
        gait_state = gait_update(gait_config, gait_init(gait_config),
                                 jnp.asarray(0.33, jnp.float32), jnp.ones(4))
        des = desired_state_update(
            desired_state_init(0.27),
            TwistCommand.constant(body_height=0.27).replace(
                linear=jnp.stack([vx, jnp.zeros_like(vx),
                                  jnp.zeros_like(vx)])))
        mpc_state = mpc_mod.mpc_init(config, 0.27)
        return obs, gait_state, des, mpc_state

    vxs = jnp.linspace(0.0, 0.8, batch)
    obs, gait_state, des, mpc_state = jax.vmap(init_one)(vxs)

    from quadruped_tpu.gait.scheduler import predicted_contact_table

    def one_solve(o, gs, d, ms):
        table = predicted_contact_table(gait_config, gs, config.dt_mpc,
                                        HORIZON)
        rpy_comp = jnp.zeros(2, jnp.float32)
        return mpc_mod.mpc_solve(config, params, ms, o, d, table, rpy_comp,
                                 d.position[2])

    @jax.jit
    def solve_batch(o, gs, d, ms):
        out = jax.vmap(one_solve)(o, gs, d, ms)
        return out.forces_world

    return solve_batch, (obs, gait_state, des, mpc_state)


def measure(batch: int, reps: int = 20) -> float:
    fn, args = build_bench(batch)
    out = fn(*args)  # compile + warm up
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    return batch / dt


def main():
    platform = jax.devices()[0].platform
    best = 0.0
    best_batch = 0
    for batch in (1024, 4096, 8192):
        try:
            rate = measure(batch)
        except Exception:
            break
        if rate > best:
            best, best_batch = rate, batch
    print(json.dumps({
        "metric": f"MPC solves/s/chip (H={HORIZON}, full build+solve, "
                  f"qp_iters={QP_ITERS}, batch={best_batch}, {platform})",
        "value": round(best, 1),
        "unit": "solves/s",
        "vs_baseline": round(best / TARGET, 4),
    }))


if __name__ == "__main__":
    main()
