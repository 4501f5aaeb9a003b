"""Headline benchmark: convex-MPC solves/s/chip at horizon 10 (A1 trot).

One "solve" counts the FULL MPC update as the reference defines it
(quadruped/src/controllers/mpc/qr_mpc_stance_leg_controller.cpp UpdateMPC +
SolveDenseMPC + qr_mpc_interface.cpp SolveMPC): desired-trajectory build,
SRB state-space matrices at the current orientation, exact-ZOH
discretization, horizon condensation, friction-cone constraint build, and
the QP solve — not just the inner QP iterations (SURVEY.md §7.3 "benchmark
honesty"). The QP runs the same 40-iteration warm-startable ADMM budget the
closed loop uses, whose solutions match the reference's qpOASES kernel in
tests/test_golden_parity.py.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "solves/s", "vs_baseline": N}
vs_baseline is against the 100k solves/s/chip north star (BASELINE.json).

Env knobs: QTPU_BENCH_BATCH (default 1024), QTPU_BENCH_FUSED=1 to route the
ADMM loop through the fused Pallas kernel (solvers/pallas_admm.py).
"""

from __future__ import annotations

import json
import os
import time

import jax

# Persistent compile cache: the TPU remote-compile of the solve graph is
# minutes; cache so repeated bench runs start warm.
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("QTPU_CACHE", "/tmp/tpu_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

HORIZON = 10
# 24 Fast-ADMM (Nesterov restart-20) iterations: matches the accuracy of
# the former 40-iteration relaxed budget on the bench and trot-switch
# ensembles (benchmarks/exp_admm_iters.py) — same budget the closed loop
# uses (MpcConfig defaults).
QP_ITERS = 24
ACCEL_RESTART = 20
TARGET = 100_000.0


def build_bench(batch: int, fused: bool):
    from quadruped_tpu.core import se3
    from quadruped_tpu.dynamics import srb
    from quadruped_tpu.robots import a1_params
    from quadruped_tpu.solvers import condense, cone_qp

    params = a1_params()
    weights = jnp.asarray([10, 10, 5, 40, 60, 100, 0, 0, 0.5, 5, 5, 1, 0.0],
                          jnp.float32)
    rng = np.random.default_rng(0)
    rpy = jnp.asarray(rng.normal(size=(batch, 3)) * 0.1, jnp.float32)
    feet = jnp.asarray(
        rng.normal(size=(batch, 4, 3)) * 0.05
        + np.array([[0.17, -0.13, -0.28], [0.17, 0.13, -0.28],
                    [-0.17, -0.13, -0.28], [-0.17, 0.13, -0.28]]),
        jnp.float32)
    x0 = jnp.asarray(
        np.concatenate([rng.normal(size=(batch, 12)) * 0.05,
                        srb.GRAVITY * np.ones((batch, 1))], 1), jnp.float32)
    # Desired trajectory: track vx = 0.4 (integrated command build).
    x_des = jnp.tile(x0[:, None, :], (1, HORIZON, 1))
    drift = jnp.zeros((13,), jnp.float32).at[3].set(0.4 * 0.03)
    k = jnp.arange(HORIZON, dtype=jnp.float32)[:, None]
    x_des = x_des + k * drift[None, :]
    contact = jnp.ones((batch, HORIZON, 4), jnp.float32)

    def full(rpy, feet, x0, x_des, contact):
        r = se3.rpy_to_rotmat(rpy)
        a, b = srb.srb_continuous(r, params.total_inertia,
                                  params.total_mass, feet)
        ad, bd = srb.srb_discretize(a, b, 0.03)
        p, q = condense.condense_cost_structured(
            a, bd, ad, x0, x_des, weights, 4e-6, HORIZON, 0.03)
        fz_hi = (contact * params.max_force).reshape(batch, HORIZON * 4)
        prob = cone_qp.ConeQP(p=p, q=q, mu=jnp.asarray(0.45, jnp.float32),
                              fz_lo=jnp.zeros_like(fz_hi), fz_hi=fz_hi)
        if fused == "full":
            return cone_qp.solve_fused_full(prob, iters=QP_ITERS,
                                            tile=16).x
        if fused == "loop":
            return cone_qp.solve_fused(prob, iters=QP_ITERS, tile=64).x
        return cone_qp.solve(prob, iters=QP_ITERS, alpha=1.0,
                             accel_restart=ACCEL_RESTART).x

    return jax.jit(full), (rpy, feet, x0, x_des, contact)


def measure(batch: int, fused: bool, reps: int = 20) -> float:
    fn, args = build_bench(batch, fused)
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    return batch / dt


def main():
    platform = jax.devices()[0].platform
    batch = int(os.environ.get("QTPU_BENCH_BATCH", "1024"))
    fused = os.environ.get("QTPU_BENCH_FUSED", "0")
    fused = {"0": False, "1": "loop", "loop": "loop",
             "full": "full"}.get(fused, False)
    rate = measure(batch, fused)
    print(json.dumps({
        "metric": f"MPC solves/s/chip (H={HORIZON}, full build+solve, "
                  f"qp_iters={QP_ITERS}, batch={batch}, "
                  f"{fused if fused else 'xla'}, {platform})",
        "value": round(rate, 1),
        "unit": "solves/s",
        "vs_baseline": round(rate / TARGET, 4),
    }))


if __name__ == "__main__":
    main()
