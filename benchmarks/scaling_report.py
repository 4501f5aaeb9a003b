"""Produce the recorded scaling artifact: SCALING.md + SCALING.json.

Measures the batched full-MPC solve (same production configuration as
bench.py: warm-started qp_iters Fast-ADMM, trot table) at:

  * 1 device vs N devices on the available platform (weak scaling,
    batch-per-device held constant) — the "solves/s scaling efficiency"
    number BASELINE.json requires;
  * sp = 1 vs sp > 1 latency at a small fleet batch (the solver-parallel
    axis of distributed/solver_sp.py).

Run on the CPU virtual mesh (default in CI: 8 virtual devices):
    python benchmarks/scaling_report.py --platform cpu
Run on TPU (single chip today; the same script scales to a pod where
jax.devices() is larger, and initialize_from_env() bootstraps
multi-process):
    python benchmarks/scaling_report.py

Writes SCALING.json (machine-readable) and appends a dated section to
SCALING.md at the repo root.
"""

from __future__ import annotations

import argparse
import datetime
import json
import os
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))


def parse_args():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None,
                    help="cpu forces the virtual host mesh")
    ap.add_argument("--batch-per-device", type=int, default=256)
    ap.add_argument("--fleet-batch", type=int, default=8,
                    help="batch for the sp-latency measurement")
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--out", default=str(ROOT / "SCALING.json"))
    ap.add_argument("--md", default=str(ROOT / "SCALING.md"))
    return ap.parse_args()


def main():
    args = parse_args()
    if args.platform == "cpu":
        flags = os.environ.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + " --xla_force_host_platform_device_count=8").strip()

    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("QTPU_CACHE", "/tmp/tpu_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    import numpy as np

    from quadruped_tpu.distributed import (initialize_from_env, make_mesh,
                                           shard_batch, solve_cone_sp)
    from quadruped_tpu.distributed.scaling import measure_throughput
    from quadruped_tpu.control.mpc import MpcConfig
    from quadruped_tpu.core import se3
    from quadruped_tpu.dynamics import srb
    from quadruped_tpu.robots import a1_params
    from quadruped_tpu.solvers import condense, cone_qp

    initialize_from_env()
    n_dev = jax.device_count()
    platform = jax.devices()[0].platform
    cfg = MpcConfig()
    params = a1_params()
    weights = jnp.asarray([10, 10, 5, 40, 60, 100, 0, 0, 0.5, 5, 5, 1, 0.0],
                          jnp.float32)
    H, DT = 10, 0.03

    def make_inputs(batch, rng):
        rpy = (rng.normal(size=(batch, 3)) * 0.1).astype(np.float32)
        feet = (rng.normal(size=(batch, 4, 3)) * 0.05
                + np.array([[0.17, -0.13, -0.28], [0.17, 0.13, -0.28],
                            [-0.17, -0.13, -0.28], [-0.17, 0.13, -0.28]])
                ).astype(np.float32)
        x0 = np.concatenate([rng.normal(size=(batch, 12)) * 0.05,
                             srb.GRAVITY * np.ones((batch, 1))],
                            1).astype(np.float32)
        offs = rng.uniform(size=(batch, 1))
        phase = (np.arange(H)[None, :] * DT / 0.6 + offs) % 1.0
        diag_a = (phase < 0.6).astype(np.float32)
        table = np.stack([diag_a, 1 - diag_a, 1 - diag_a, diag_a], axis=2)
        table[:, 0, :] = 1.0
        return (jnp.asarray(rpy), jnp.asarray(feet), jnp.asarray(x0),
                jnp.asarray(table))

    def build_timed_prob(rpy, feet, x0, contact):
        """ONE problem construction shared by the untimed boot and the
        timed solve — the warm start is guaranteed to come from the same
        QP the timed region solves."""
        batch = rpy.shape[0]
        r = se3.rpy_to_rotmat(rpy)
        k = jnp.arange(H, dtype=jnp.float32)[:, None]
        drift = jnp.zeros((13,), jnp.float32).at[3].set(0.4 * DT)
        x_des = (x0[:, None, :] + k[None] * drift[None, None, :])
        x_des = x_des.at[..., 9].set(0.4)
        a, b = srb.srb_continuous(r, params.total_inertia,
                                  params.total_mass, feet)
        ad, bd = srb.srb_discretize(a, b, DT)
        p, q = condense.condense_cost_structured(
            a, bd, ad, x0, x_des, weights, 4e-6, H, DT)
        fz_hi = (contact * params.max_force).reshape(batch, H * 4)
        return cone_qp.ConeQP(p=p, q=q, mu=jnp.asarray(0.45, jnp.float32),
                              fz_lo=jnp.zeros_like(fz_hi), fz_hi=fz_hi)

    def full_solve(rpy, feet, x0, contact, x_warm, y_warm):
        return cone_qp.solve(build_timed_prob(rpy, feet, x0, contact),
                             iters=cfg.qp_iters, alpha=cfg.qp_alpha,
                             accel_restart=cfg.qp_accel_restart,
                             x0=x_warm, y0=y_warm).x

    def cold_boot(rpy, feet, x0, contact):
        """Untimed boot solve producing the warm state (the production
        schedule bench.py times — NOT zeros)."""
        sol = cone_qp.solve(build_timed_prob(rpy, feet, x0, contact),
                            iters=cfg.qp_cold_iters,
                            alpha=cfg.qp_cold_alpha)
        return sol.x, sol.y

    def bench_at(n_devices):
        """Weak scaling: batch_per_device * n, sharded over the mesh."""
        batch = args.batch_per_device * n_devices
        rng = np.random.default_rng(0)
        inputs = make_inputs(batch, rng)
        mesh = make_mesh(n_devices)
        sharded_in = shard_batch(mesh, inputs)
        warm = jax.jit(cold_boot)(*sharded_in)
        jax.block_until_ready(warm)
        fn = jax.jit(full_solve)
        dt = measure_throughput(fn, sharded_in + tuple(warm), args.reps)
        return batch / dt

    results = {
        "date": datetime.date.today().isoformat(),
        "platform": platform,
        "devices": n_dev,
        "processes": jax.process_count(),
        "config": {"horizon": H, "qp_iters": cfg.qp_iters,
                   "batch_per_device": args.batch_per_device,
                   "table": "trot"},
    }
    if platform == "cpu":
        # Virtual host devices share the machine's cores: weak-scaling
        # efficiency is hard-bounded by cores/devices. Record the bound so
        # the number is interpretable (on a TPU slice each device is a
        # real chip and the bound is 1.0).
        cores = os.cpu_count() or 1
        results["physical_cores"] = cores
        results["efficiency_upper_bound"] = round(min(1.0, cores / n_dev), 4)

    solves_1 = bench_at(1)
    results["solves_per_s_1dev"] = round(solves_1, 1)
    if n_dev > 1:
        solves_n = bench_at(n_dev)
        eff = solves_n / (solves_1 * n_dev)
        results[f"solves_per_s_{n_dev}dev"] = round(solves_n, 1)
        results["scaling_efficiency"] = round(eff, 4)
        if "efficiency_upper_bound" in results:
            results["efficiency_vs_bound"] = round(
                eff / results["efficiency_upper_bound"], 4)

    # sp-latency at fleet batch (needs >= 2 devices).
    if n_dev >= 2:
        b = args.fleet_batch
        rng = np.random.default_rng(1)
        inputs = make_inputs(b, rng)

        def build_prob(rpy, feet, x0, contact):
            r = se3.rpy_to_rotmat(rpy)
            k = jnp.arange(H, dtype=jnp.float32)[:, None]
            drift = jnp.zeros((13,), jnp.float32).at[3].set(0.4 * DT)
            x_des = (x0[:, None, :] + k[None] * drift[None, None, :])
            x_des = x_des.at[..., 9].set(0.4)
            a, bmat = srb.srb_continuous(r, params.total_inertia,
                                         params.total_mass, feet)
            ad, bd = srb.srb_discretize(a, bmat, DT)
            p, q = condense.condense_cost_structured(
                a, bd, ad, x0, x_des, weights, 4e-6, H, DT)
            fz_hi = (contact * params.max_force).reshape(b, H * 4)
            return cone_qp.ConeQP(p=p, q=q,
                                  mu=jnp.asarray(0.45, jnp.float32),
                                  fz_lo=jnp.zeros_like(fz_hi),
                                  fz_hi=fz_hi)

        prob = jax.jit(build_prob)(*inputs)
        jax.block_until_ready(prob)
        sp = min(4, n_dev)
        lat = {}
        for sp_k in (1, sp):
            mesh = make_mesh(sp_k, sp=sp_k)   # all sp: pure latency split
            t0 = None
            solve = lambda: solve_cone_sp(mesh, prob, iters=cfg.qp_iters)
            jax.block_until_ready(solve().x)
            t0 = time.perf_counter()
            for _ in range(args.reps):
                out = solve().x
            jax.block_until_ready(out)
            lat[sp_k] = (time.perf_counter() - t0) / args.reps * 1e3
        results["fleet_latency_ms_sp1"] = round(lat[1], 3)
        results[f"fleet_latency_ms_sp{sp}"] = round(lat[sp], 3)
        results["sp_speedup"] = round(lat[1] / lat[sp], 3)

    out = Path(args.out)
    existing = {}
    if out.exists():
        existing = json.loads(out.read_text())
    existing[platform] = results
    out.write_text(json.dumps(existing, indent=2) + "\n")

    md = Path(args.md)
    lines = [f"\n## {results['date']} — {platform} ({n_dev} device(s), "
             f"{results['processes']} process(es))\n"]
    for k, v in results.items():
        if k not in ("date", "platform", "config"):
            lines.append(f"- {k}: {v}")
    lines.append(f"- config: {json.dumps(results['config'])}")
    with md.open("a") as f:
        f.write("\n".join(lines) + "\n")
    print(json.dumps(results))


if __name__ == "__main__":
    main()
