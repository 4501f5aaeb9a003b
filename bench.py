"""Headline benchmark: convex-MPC solves/s/chip at horizon 10 (A1 trot).

One "solve" counts the FULL MPC update as the reference defines it
(quadruped/src/controllers/mpc/qr_mpc_stance_leg_controller.cpp UpdateMPC +
SolveDenseMPC + qr_mpc_interface.cpp SolveMPC): desired-trajectory build
(integrated command drift — built INSIDE the timed jit), SRB state-space
matrices at the current orientation, exact-ZOH discretization, horizon
condensation, friction-cone constraint build, and the QP solve — not just
the inner QP iterations (SURVEY.md §7.3 "benchmark honesty").

The timed configuration is EXACTLY the production steady state that the
golden-parity suite verifies against the reference's compiled qpOASES
kernel (tests/test_golden_parity.py::test_production_cadence_parity):
qp_iters=24 Fast-ADMM iterations (restart 20, alpha 1.0), WARM-STARTED
from the solution of the previous problem in a 15 ms cadence sequence, on
a TROT contact table (diagonal pairs swapping across the horizon — half
the force triples pinned, exercising the rho-boosted pinned-row path).
The one-off cold boot solve (MpcConfig.qp_cold_iters, mpc_cold_start) runs
outside the timed region, as it does in the closed loop.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "solves/s", "vs_baseline": N}
vs_baseline is against the 100k solves/s/chip north star (BASELINE.json).

The JSON line also carries its own error bars (median + [min, max] band
over QTPU_BENCH_RUNS >= 5 independent timing runs) and the compute-side
accounting the MFU question needs: FLOPs per solve (analytic dominant-term
model + XLA's compiled cost analysis, which under-counts scans — see
analytic_flops_per_solve) and the achieved TFLOP/s at the reported rate.

Env knobs: QTPU_BENCH_BATCH (default 32768 chunked / 1024 monolithic),
QTPU_BENCH_CHUNK (default 256; 0 = monolithic graph — chunking is
scheduling only, outputs agree to reassociation roundoff),
QTPU_BENCH_FUSED=1 to route the
ADMM loop through the fused Pallas kernel (solvers/pallas_admm.py),
QTPU_BENCH_TABLE=stance for the legacy all-stance table,
QTPU_BENCH_MOVE_BLOCK="6,2" to bench the move-blocked condensed system
(solvers/condense.py move_block_groups; parity-gated in
tests/test_golden_parity.py), QTPU_BENCH_H=16 for the long-horizon
move-blocked configuration (auto-selects the H=16-tuned solver settings;
parity-gated by tests/test_golden_parity.py::test_long_horizon_*),
QTPU_BENCH_RUNS (default 5 timing runs for the variance band).
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

HORIZON = int(os.environ.get("QTPU_BENCH_H", "10"))
# Newton-Schulz precision ablation: trailing f32 polish steps out of the
# 11 NS iterations (the rest run bf16 — the production default is 1,
# load-bearing for the parity gates; 11 = all-f32 for the ablation line).
NS_F32_POLISH = int(os.environ.get("QTPU_BENCH_NS_POLISH", "1"))
# Cross-cadence M^{-1} reuse (cone_qp.InverseCarry): rescale + pinned-row
# Woodbury + short NS polish replaces the cold 11-iteration inverse on
# the warm path — parity-gated (tests/test_minv_reuse.py + the chained
# cadence gates) but DEFAULT OFF: measured on TPU the inverse is
# HBM-bound, not FLOP-bound, so the 2.4x FLOP saving does not buy time
# in XLA form (seeded 5.6 ms vs cold 4.4 ms at B=1024 — the Woodbury/
# rescale stages stream the same [B, n, n] tensors the saved NS
# iterations would have; a documented negative result, STATUS.md; the
# win requires a VMEM-resident kernel). QTPU_BENCH_MINV_REUSE=1 times
# the reuse path.
MINV_REUSE = os.environ.get("QTPU_BENCH_MINV_REUSE", "0") == "1"
# Batch chunking: run the batch as `batch/chunk` sequential lax.map
# chunks inside ONE jit. Scheduling only — the math per element is the
# same program, and measured chunked-vs-monolithic outputs agree to
# reassociation-level roundoff (<= 3e-4 N on forces, vs the ~3.8 N
# parity gates), so the golden-parity claims carry over — but
# throughput is dramatically better at large batches: XLA pipelines the
# chunks and avoids the super-linear slowdown the monolithic graph hits
# past B~1024 (measured on TPU: 180.5k solves/s at the old B=1024
# monolithic optimum -> 282.5k at B=8192/chunk=256, 285.6k at the
# B=32768 default; unchunked B=4096 is 105.5k). 0 disables (the
# monolithic graph).
CHUNK = int(os.environ.get("QTPU_BENCH_CHUNK", "256"))
DT_MPC = 0.03
CADENCE_S = 0.015   # MPC re-solves every 15 ticks at 1 kHz
TARGET = 100_000.0


def make_states(batch: int, t: float, rng):
    """Batched robot states for the cadence step at time t: the same
    random scenario ensemble advanced by the commanded motion."""
    rpy = (rng.normal(size=(batch, 3)) * 0.1
           + np.array([0.0, 0.0, 0.0])).astype(np.float32)
    feet = (rng.normal(size=(batch, 4, 3)) * 0.05
            + np.array([[0.17, -0.13, -0.28], [0.17, 0.13, -0.28],
                        [-0.17, -0.13, -0.28], [-0.17, 0.13, -0.28]])
            + 0.02 * np.sin(5 * t)).astype(np.float32)
    # 13th SRB state = the gravity constant (srb.GRAVITY) — without it
    # the QP's optimum is near-zero forces and the problem is not the
    # production one (timing is data-independent, honesty is not).
    from quadruped_tpu.dynamics import srb as _srb

    x0 = np.concatenate(
        [rng.normal(size=(batch, 12)) * 0.05,
         _srb.GRAVITY * np.ones((batch, 1))],
        1).astype(np.float32)
    x0[:, 3] += 0.4 * t        # commanded forward progress
    return rpy, feet, x0


def trot_table(batch: int, t: float, rng, horizon: int | None = None):
    """[B, H, 4] trot contact table: diagonal pairs, per-scenario phase
    offset, advancing with t — half the triples pinned (fz_hi = 0), the
    rho-boosted path the closed loop actually solves."""
    horizon = HORIZON if horizon is None else horizon
    offs = rng.uniform(size=(batch, 1))
    phase = (np.arange(horizon)[None, :] * DT_MPC / 0.6 + t / 0.6
             + offs) % 1.0
    diag_a = (phase < 0.6).astype(np.float32)
    table = np.stack([diag_a, 1 - diag_a, 1 - diag_a, diag_a], axis=2)
    table[:, 0, :] = 1.0    # current tick pinned to measured full stance
    return table.astype(np.float32)


def build_bench(batch: int, fused, table_kind: str, move_block=(),
                horizon: int | None = None, chunk: int | None = None,
                ns_f32_polish: int | None = None,
                minv_reuse: bool | None = None):
    """Build the timed production MPC update (jitted) + its warm args.

    The keyword defaults read the module-level env knobs, so bench.py's
    CLI behavior is unchanged; benchmarks/scaling_report.py passes them
    explicitly so the scaling artifact times EXACTLY this program
    (VERDICT r4: the scaling harness must not drift from the headline).
    """
    HORIZON = horizon if horizon is not None else globals()["HORIZON"]
    CHUNK = chunk if chunk is not None else globals()["CHUNK"]
    NS_F32_POLISH = (ns_f32_polish if ns_f32_polish is not None
                     else globals()["NS_F32_POLISH"])
    MINV_REUSE = (minv_reuse if minv_reuse is not None
                  else globals()["MINV_REUSE"])
    from quadruped_tpu.control.mpc import (MpcConfig, gravity_warm_start,
                                           long_horizon_config)
    from quadruped_tpu.core import se3
    from quadruped_tpu.dynamics import srb
    from quadruped_tpu.robots import a1_params
    from quadruped_tpu.solvers import condense, cone_qp

    if HORIZON >= 12:
        # The tuned long-horizon production configuration (move blocking
        # + the 1e-4 force regularizer — see control/mpc.py
        # long_horizon_config for the measured rationale).
        cfg = long_horizon_config(horizon=HORIZON,
                                  move_block=tuple(move_block))
    else:
        cfg = MpcConfig(horizon=HORIZON, move_block=tuple(move_block))
    if cfg.move_block:
        groups, n_g = condense.move_block_groups(HORIZON, *cfg.move_block)
    params = a1_params()
    weights = jnp.asarray([10, 10, 5, 40, 60, 100, 0, 0, 0.5, 5, 5, 1, 0.0],
                          jnp.float32)
    rng = np.random.default_rng(0)

    def full(rpy, feet, x0, contact, x_warm, y_warm, pin_prev, inv_carry):
        """One full MPC update: trajectory build + SRB + ZOH + condense +
        cone build + warm-started production solve, incl. the deployed
        flip-aware warm-start shift (cone_qp.shift_warm_start, unblocked
        horizons) and — when MINV_REUSE — the cross-cadence M^{-1}
        reuse (rescale + pinned-row Woodbury + short NS polish)."""
        r = se3.rpy_to_rotmat(rpy)
        # Desired trajectory: integrate the commanded twist over the
        # horizon from the current state (UpdateMPC :361-376) — inside
        # the timed jit.
        k = jnp.arange(HORIZON, dtype=jnp.float32)[:, None]
        drift = jnp.zeros((13,), jnp.float32).at[3].set(0.4 * DT_MPC)
        x_des = x0[:, None, :] + k[None] * drift[None, None, :]
        x_des = x_des.at[..., 9].set(0.4)

        a, b = srb.srb_continuous(r, params.total_inertia,
                                  params.total_mass, feet)
        ad, bd = srb.srb_discretize(a, b, DT_MPC)
        p, q = condense.condense_cost_structured(
            a, bd, ad, x0, x_des, weights, cfg.force_weight, HORIZON, DT_MPC)
        fz_hi = (contact * params.max_force).reshape(contact.shape[0], HORIZON * 4)
        if cfg.move_block:
            p, q, fz_hi = condense.reduce_move_blocking(
                p, q, fz_hi, groups, n_g, HORIZON)
        prob = cone_qp.ConeQP(p=p, q=q, mu=jnp.asarray(0.45, jnp.float32),
                              fz_lo=jnp.zeros_like(fz_hi), fz_hi=fz_hi)
        if cfg.qp_warm_shift and not cfg.move_block:
            # Flip-aware warm-start shift — OFF by default (a measured
            # worst-case/typical trade-off, see MpcConfig.qp_warm_shift).
            pin_new = (fz_hi < 1e-6).astype(jnp.float32)
            x_warm, y_warm = cone_qp.shift_warm_start(x_warm, y_warm,
                                                      pin_prev, pin_new)
        if fused == "full":
            # Production solver semantics (Fast-ADMM restart 20, alpha 1)
            # inside the VMEM-resident kernel — same scheme the XLA
            # headline path runs, so the comparison is apples-to-apples.
            sol = cone_qp.solve_fused_full(
                prob, iters=cfg.qp_iters, alpha=cfg.qp_alpha,
                accel_restart=cfg.qp_accel_restart,
                ns_f32_polish=NS_F32_POLISH,
                x0=x_warm, y0=y_warm,
                tile=int(os.environ.get("QTPU_BENCH_FUSED_TILE", "16")))
        elif fused == "loop":
            sol = cone_qp.solve_fused(
                prob, iters=cfg.qp_iters, alpha=cfg.qp_alpha,
                accel_restart=cfg.qp_accel_restart,
                ns_f32_polish=NS_F32_POLISH,
                x0=x_warm, y0=y_warm,
                tile=int(os.environ.get("QTPU_BENCH_FUSED_TILE", "64")))
        elif MINV_REUSE:
            sol, carry = cone_qp.solve(
                prob, iters=cfg.qp_iters, alpha=cfg.qp_alpha,
                accel_restart=cfg.qp_accel_restart,
                ns_f32_polish=NS_F32_POLISH,
                inv_carry=inv_carry, return_inv_carry=True,
                x0=x_warm, y0=y_warm)
            return sol.x, sol.y, carry
        else:
            # Default path: no carry in OR out — materializing the
            # unused [B, n, n] inverse as an output costs ~5% (measured).
            sol = cone_qp.solve(prob, iters=cfg.qp_iters,
                                alpha=cfg.qp_alpha,
                                accel_restart=cfg.qp_accel_restart,
                                ns_f32_polish=NS_F32_POLISH,
                                x0=x_warm, y0=y_warm)
        return sol.x, sol.y

    # Chunking applies to the fused kernels too: the pallas grid already
    # self-chunks the SOLVE, but the host-side XLA prep (equilibration,
    # M assembly, padding) would otherwise run as one monolithic graph
    # and hit the super-linear scheduling cliff past B~1024.
    if CHUNK > 0 and batch % CHUNK == 0 and batch > CHUNK:
        n_chunks = batch // CHUNK

        def fn_chunked(*args):
            rs = lambda a: a.reshape((n_chunks, CHUNK) + a.shape[1:])
            out = jax.lax.map(lambda ch: full(*ch),
                              jax.tree.map(rs, args))
            # Restore batch-major layout so consumers of the bench fn see
            # the same [batch, ...] shapes as the monolithic graph.
            return jax.tree.map(
                lambda a: a.reshape((n_chunks * CHUNK,) + a.shape[2:]), out)

        fn = jax.jit(fn_chunked)
    else:
        fn = jax.jit(full)

    # --- untimed boot: cold solve on the PREVIOUS cadence step, exactly
    # what mpc_cold_start does once per rollout.
    t_prev, t_now = 0.0, CADENCE_S
    rpy_p, feet_p, x0_p = make_states(batch, t_prev,
                                      np.random.default_rng(0))
    table_p = (trot_table(batch, t_prev, np.random.default_rng(1), HORIZON)
               if table_kind == "trot"
               else np.ones((batch, HORIZON, 4), np.float32))

    def cold(rpy, feet, x0, contact):
        r = se3.rpy_to_rotmat(rpy)
        k = jnp.arange(HORIZON, dtype=jnp.float32)[:, None]
        drift = jnp.zeros((13,), jnp.float32).at[3].set(0.4 * DT_MPC)
        x_des = (x0[:, None, :] + k[None] * drift[None, None, :])
        x_des = x_des.at[..., 9].set(0.4)
        a, b = srb.srb_continuous(r, params.total_inertia,
                                  params.total_mass, feet)
        ad, bd = srb.srb_discretize(a, b, DT_MPC)
        p, q = condense.condense_cost_structured(
            a, bd, ad, x0, x_des, weights, cfg.force_weight, HORIZON, DT_MPC)
        fz_hi = (contact * params.max_force).reshape(batch, HORIZON * 4)
        if cfg.move_block:
            p, q, fz_hi = condense.reduce_move_blocking(
                p, q, fz_hi, groups, n_g, HORIZON)
        prob = cone_qp.ConeQP(p=p, q=q, mu=jnp.asarray(0.45, jnp.float32),
                              fz_lo=jnp.zeros_like(fz_hi), fz_hi=fz_hi)
        grav_table = jnp.asarray(contact)
        if cfg.move_block:
            grav_table = (fz_hi > 0).astype(jnp.float32) \
                .reshape(batch, n_g, 4)
        sol, carry = cone_qp.solve(prob, iters=cfg.qp_cold_iters,
                                   alpha=cfg.qp_cold_alpha,
                                   return_inv_carry=True,
                                   x0=gravity_warm_start(params, grav_table))
        return sol.x, sol.y, (fz_hi < 1e-6).astype(jnp.float32), carry

    x_warm, y_warm, pin_prev, inv_carry = jax.jit(cold)(rpy_p, feet_p,
                                                        x0_p, table_p)

    # --- timed step: the NEXT cadence problem, warm-started.
    rng2 = np.random.default_rng(0)
    rpy, feet, x0 = make_states(batch, t_now, rng2)
    table = (trot_table(batch, t_now, np.random.default_rng(1), HORIZON)
             if table_kind == "trot"
             else np.ones((batch, HORIZON, 4), np.float32))
    args = (jnp.asarray(rpy), jnp.asarray(feet), jnp.asarray(x0),
            jnp.asarray(table), x_warm, y_warm, pin_prev, inv_carry)
    return fn, args, cfg


def analytic_flops_per_solve(cfg) -> float:
    """Dominant-term FLOP model of one full MPC update (f32-equivalent
    multiply+add = 2 FLOPs), for the MFU/roofline line in the output.

    XLA's compiled cost_analysis() counts each lax.scan BODY once, not
    times its trip count (measured: an 11-step matmul scan reports 1/11th
    of the unrolled flops), so it under-counts this solve ~5x — and the
    chunked default compounds that: lax.map lowers to a scan over chunks,
    so the whole per-chunk program is again counted ONCE instead of
    n_chunks times (at B=8192/chunk=256 that is another 32x, which is why
    flops_per_solve_xla can sit ~170x below the analytic count). Both
    numbers are reported, but achieved_tflops uses this analytic count.

    Terms: Newton-Schulz inverse (NS_ITERS x 2 matmuls of [n, n], the
    ~85% majority), ADMM iterations (matvec + cone applies), M assembly,
    structured condensation, equilibration passes."""
    from quadruped_tpu.solvers import cone_qp as _cq

    g = cfg.n_force_groups
    n = 12 * g
    t = 4 * g
    h = cfg.horizon
    if globals()["MINV_REUSE"]:
        # Seeded inverse: 1 residual/select step (3 matmuls incl. the
        # damped variant) + (seed_bf16-1) + polish steps (2 matmuls each)
        # + the Woodbury block (2 n^2 t + t^3) + rescale.
        ns_matmuls = 3 + 2 * (4 - 1) + 2 * 1
        ns = ns_matmuls * 2 * n ** 3 + 2 * n * n * t + t ** 3 + 2 * n * n
    else:
        ns = _cq.NS_ITERS * 2 * 2 * n ** 3
    admm = cfg.qp_iters * (2 * n * n + 2 * 2 * t * 5 * 3)
    m_assembly = 2 * n * n
    cond = 2 * 4 * h * h * 144 + 4 * 2 * 144 * 13
    equil = 3 * n * n
    return float(ns + admm + m_assembly + cond + equil)


def measure(batch: int, fused, table_kind: str, move_block=(),
            reps: int = 20, runs: int = 5, horizon: int | None = None,
            chunk: int | None = None):
    """Returns (median rate, [min, max] band, flops (xla, analytic), cfg).

    flops_xla comes from XLA's compiled cost analysis of the timed jit —
    the full MPC update (trajectory + SRB + ZOH + condensation + cone
    build + solve) — but see analytic_flops_per_solve for why it
    under-counts scanned loops; achieved TFLOP/s = rate * analytic."""
    fn, args, cfg = build_bench(batch, fused, table_kind, move_block,
                                horizon=horizon, chunk=chunk)
    compiled = fn.lower(*args).compile()
    try:
        flops_per_solve = float(compiled.cost_analysis()["flops"]) / batch
    except (KeyError, TypeError):
        flops_per_solve = float("nan")
    out = fn(*args)
    jax.block_until_ready(out)
    rates = []
    for _ in range(max(runs, 1)):
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / reps
        rates.append(batch / dt)
    rates.sort()
    return rates[len(rates) // 2], [rates[0], rates[-1]], \
        (flops_per_solve, analytic_flops_per_solve(cfg)), cfg


def main():
    platform = jax.devices()[0].platform
    # Default batch: 32768 with chunking — the measured top of the
    # chunked plateau (same-day, chunk 256: 278.5k @ 8192, 282.6k @
    # 16384, 285.6k @ 32768; 65536 exhausts HBM — the warm-start carry
    # alone is [B, 120, 120]). 1024 for the monolithic graph (ITS
    # measured optimum — larger unchunked batches hit a super-linear XLA
    # slowdown, see CHUNK).
    batch = int(os.environ.get("QTPU_BENCH_BATCH",
                               "32768" if CHUNK > 0 else "1024"))
    fused = os.environ.get("QTPU_BENCH_FUSED", "0")
    fused = {"0": False, "1": "loop", "loop": "loop",
             "full": "full"}.get(fused, False)
    table_kind = os.environ.get("QTPU_BENCH_TABLE", "trot")
    mb_env = os.environ.get("QTPU_BENCH_MOVE_BLOCK", "")
    if mb_env == "none":
        move_block = ()          # explicit full-resolution horizon
    elif mb_env:
        move_block = tuple(int(x) for x in mb_env.split(","))
    elif HORIZON >= 12:
        # Long-horizon default: the move-blocked configuration is the one
        # parity-gated at H=16 (long_horizon_config — head 4 + tail
        # pairs, 120 vars = one MXU tile).
        from quadruped_tpu.control.mpc import long_horizon_config as _lh

        move_block = _lh().move_block
    else:
        move_block = ()
    runs = int(os.environ.get("QTPU_BENCH_RUNS", "5"))
    rate, band, (flops_xla, flops_analytic), cfg = measure(
        batch, fused, table_kind, move_block, runs=runs)
    mb_tag = (f", moveblock{cfg.move_block}" if cfg.move_block else "")
    if NS_F32_POLISH != 1:
        mb_tag += f", ns_f32_polish={NS_F32_POLISH}"
    if MINV_REUSE and not fused:
        mb_tag += ", minv_reuse"
    if CHUNK > 0 and batch % CHUNK == 0 and batch > CHUNK:
        mb_tag += f", chunk{CHUNK}"
    print(json.dumps({
        "metric": f"MPC solves/s/chip (H={HORIZON}, full build+solve, "
                  f"qp_iters={cfg.qp_iters} warm@cadence, {table_kind} "
                  f"table{mb_tag}, batch={batch}, "
                  f"{fused if fused else 'xla'}, {platform})",
        "value": round(rate, 1),
        "unit": "solves/s",
        "vs_baseline": round(rate / TARGET, 4),
        "band_min": round(band[0], 1),
        "band_max": round(band[1], 1),
        "runs": runs,
        "flops_per_solve": round(flops_analytic, 1),
        "flops_per_solve_xla": round(flops_xla, 1),
        "achieved_tflops": round(rate * flops_analytic / 1e12, 3),
    }))


if __name__ == "__main__":
    main()
