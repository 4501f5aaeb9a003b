"""Secondary benchmark: end-to-end closed-loop control ticks/s/chip.

Measures the WHOLE framework in the loop — gait clocks, estimator-backed
observation, swing trajectories + IK, MPC at the reference's 15 ms
cadence (solve once per period, forces held between solves, exactly the
reference's multiplexing: qr_mpc_stance_leg_controller.cpp:342 — at the
500 Hz control_dt that is 8 ticks per solve, MpcConfig.ticks_per_solve),
hybrid command merge, and the SRB simulator step — batched over
independent scenarios. One "tick" = one 2 ms control step of one
scenario, so ticks/s/chip / 500 = simulated robot-seconds per wall
second.

    python benchmarks/bench_rollout.py   [QTPU_BENCH_BATCH=2048]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("QTPU_CACHE", "/tmp/tpu_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from quadruped_tpu.control import mpc as mpc_mod, swing as swing_mod
from quadruped_tpu.control.desired_state import TwistCommand
from quadruped_tpu.control.locomotion import LocomotionConfig
from quadruped_tpu.gait import ADVANCED_TROT
from quadruped_tpu.robots import a1_params
from quadruped_tpu.sim.rollout_cadenced import rollout_cadenced

N_PERIODS = 18


def build(batch: int):
    params = a1_params()
    config = LocomotionConfig(mpc=mpc_mod.MpcConfig(horizon=10),
                              swing=swing_mod.SwingConfig(),
                              gait=ADVANCED_TROT())
    rng = np.random.default_rng(0)
    vx = jnp.asarray(0.2 + 0.6 * rng.random(batch), jnp.float32)
    wz = jnp.asarray(rng.normal(size=batch) * 0.2, jnp.float32)

    def one(vx, wz):
        res = rollout_cadenced(config, params,
                               TwistCommand.constant(vx=vx, wz=wz),
                               n_periods=N_PERIODS)
        return res.alive, res.sim.position

    # Batch chunking (same finding as bench.py CHUNK): lax.map over
    # vmapped chunks dodges XLA's super-linear slowdown on big
    # monolithic batches. 0 = monolithic vmap.
    chunk = int(os.environ.get("QTPU_BENCH_CHUNK", "256"))
    if chunk > 0 and batch % chunk == 0 and batch > chunk:
        n_chunks = batch // chunk

        def fn(vx, wz):
            rs = lambda a: a.reshape((n_chunks, chunk) + a.shape[1:])
            out = jax.lax.map(lambda ch: jax.vmap(one)(*ch),
                              (rs(vx), rs(wz)))
            return jax.tree.map(lambda a: a.reshape((batch,) + a.shape[2:]),
                                out)

        return jax.jit(fn), (vx, wz)
    return jax.jit(jax.vmap(one)), (vx, wz)


def main():
    batch = int(os.environ.get("QTPU_BENCH_BATCH", "2048"))
    fn, args = build(batch)
    out = fn(*args)
    jax.block_until_ready(out)
    reps = 5
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    ticks = batch * N_PERIODS * mpc_mod.MpcConfig().ticks_per_solve
    alive = float(jnp.mean(out[0]))
    print(json.dumps({
        "metric": f"closed-loop control ticks/s/chip (full stack, MPC "
                  f"H=10 @ 15 ms cadence, batch={batch}, "
                  f"{jax.devices()[0].platform})",
        "value": round(ticks / dt, 1),
        "unit": "ticks/s",
        "alive_fraction": alive,
        "robot_seconds_per_wall_second": round(ticks / dt / 500.0, 1),
    }))


if __name__ == "__main__":
    main()
