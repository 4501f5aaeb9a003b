"""Produce the recorded scaling artifact: SCALING.md + SCALING.json.

Round-5 rewrite (VERDICT r4 item 2): the harness now times EXACTLY the
program bench.py times — bench.build_bench's full production MPC update
(trajectory build + SRB + ZOH + condensation + cone build + warm
Fast-ADMM solve, batch-chunked through lax.map) — so no number recorded
here can drift from the headline. The pre-round-5 harness timed a
different program (solve-only, monolithic graph, B=256); its recorded
TPU numbers (151.5k r3 / 139.5k r4) are not comparable to the bench
headline and their spread was harness sensitivity, eliminated by reusing
bench.build_bench verbatim.

Measures:
  * single-device headline at the production chunked configuration
    (H=10 and, on TPU, the H=16 long-horizon configuration), with the
    same median + band discipline as bench.py;
  * weak scaling 1 -> N devices (batch-per-device constant, shard_map
    over the dp mesh axis, each device running the same chunked update);
  * sp = 1 vs sp > 1 latency at a small fleet batch (the solver-parallel
    axis of distributed/solver_sp.py).

Run on the CPU virtual mesh (default in CI: 8 virtual devices):
    python benchmarks/scaling_report.py --platform cpu
Run on TPU (single chip today; the same script scales to a pod where
jax.devices() is larger, and initialize_from_env() bootstraps
multi-process):
    python benchmarks/scaling_report.py

Rewrites SCALING.json (per-platform entries) and regenerates SCALING.md
from it, so the two artifacts cannot disagree.
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
    ap.add_argument("--batch-per-device", type=int, default=256,
                    help="weak-scaling batch per device")
    ap.add_argument("--headline-batch", type=int, default=None,
                    help="single-device headline batch (default: 32768 on "
                         "TPU — the bench.py default — 512 on CPU)")
    ap.add_argument("--chunk", type=int, default=256)
    ap.add_argument("--runs", type=int, default=3,
                    help="independent timing runs for the band")
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--fleet-batch", type=int, default=8,
                    help="batch for the sp-latency measurement")
    ap.add_argument("--skip-h16", action="store_true")
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

    import bench  # repo-root bench.py — the single source of the timed program
    import numpy as np
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    from quadruped_tpu.distributed import initialize_from_env, make_mesh
    from quadruped_tpu.distributed.mesh import shard_batch
    from quadruped_tpu.control.mpc import MpcConfig, long_horizon_config

    initialize_from_env()
    n_dev = jax.device_count()
    platform = jax.devices()[0].platform
    on_tpu = platform not in ("cpu",)
    headline_batch = args.headline_batch or (32768 if on_tpu else 512)

    results = {
        "date": datetime.date.today().isoformat(),
        "platform": platform,
        "devices": n_dev,
        "processes": jax.process_count(),
        "config": {"horizon": 10, "qp_iters": MpcConfig().qp_iters,
                   "chunk": args.chunk,
                   "headline_batch": headline_batch,
                   "batch_per_device": args.batch_per_device,
                   "table": "trot",
                   "program": "bench.build_bench (identical to bench.py)"},
    }

    # --- single-device headline, the bench.py program verbatim ---
    rate, band, _, _ = bench.measure(headline_batch, False, "trot",
                                     horizon=10, chunk=args.chunk,
                                     runs=args.runs)
    results["headline_h10_solves_per_s_1dev"] = round(rate, 1)
    results["headline_h10_band"] = [round(band[0], 1), round(band[1], 1)]

    if on_tpu and not args.skip_h16:
        mb = long_horizon_config().move_block
        rate16, band16, _, _ = bench.measure(headline_batch, False, "trot",
                                             move_block=mb, horizon=16,
                                             chunk=args.chunk,
                                             runs=args.runs)
        results["headline_h16_solves_per_s_1dev"] = round(rate16, 1)
        results["headline_h16_band"] = [round(band16[0], 1),
                                        round(band16[1], 1)]

    if platform == "cpu":
        # Virtual host devices share the machine's cores: weak-scaling
        # efficiency is hard-bounded by cores/devices. Record the bound so
        # the number is interpretable (on a TPU slice each device is a
        # real chip and the bound is 1.0).
        cores = os.cpu_count() or 1
        results["physical_cores"] = cores
        results["efficiency_upper_bound"] = round(min(1.0, cores / n_dev), 4)

    # --- weak scaling: the SAME chunked update, shard_mapped over dp ---
    def bench_at(n_devices):
        per_dev = args.batch_per_device
        # Build the per-device program (unjitted) + per-device warm args
        # from bench itself, then run one copy per device under shard_map.
        fn, dev_args, _ = bench.build_bench(per_dev, False, "trot",
                                            horizon=10, chunk=args.chunk)
        raw = getattr(fn, "__wrapped__", fn)
        mesh = make_mesh(n_devices)
        if n_devices == 1:
            gfn, gargs = fn, dev_args
        else:
            tile = lambda x: np.tile(
                np.asarray(x), (n_devices,) + (1,) * (np.ndim(x) - 1))
            gargs = shard_batch(mesh, jax.tree.map(tile, dev_args))
            gfn = jax.jit(shard_map(
                raw, mesh=mesh,
                in_specs=tuple(P("dp") for _ in dev_args),
                out_specs=P("dp"), check_vma=False))
        out = gfn(*gargs)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(args.reps):
            out = gfn(*gargs)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / args.reps
        return per_dev * n_devices / dt

    solves_1 = bench_at(1)
    results["weak_solves_per_s_1dev"] = round(solves_1, 1)
    if n_dev > 1:
        solves_n = bench_at(n_dev)
        eff = solves_n / (solves_1 * n_dev)
        results[f"weak_solves_per_s_{n_dev}dev"] = round(solves_n, 1)
        results["scaling_efficiency"] = round(eff, 4)
        if "efficiency_upper_bound" in results:
            results["efficiency_vs_bound"] = round(
                eff / results["efficiency_upper_bound"], 4)

    # --- sp-latency at fleet batch (needs >= 2 devices) ---
    if n_dev >= 2:
        import jax.numpy as jnp
        from quadruped_tpu.distributed import solve_cone_sp
        from quadruped_tpu.core import se3
        from quadruped_tpu.dynamics import srb
        from quadruped_tpu.robots import a1_params
        from quadruped_tpu.solvers import condense, cone_qp

        cfg = MpcConfig()
        params = a1_params()
        weights = jnp.asarray(
            [10, 10, 5, 40, 60, 100, 0, 0, 0.5, 5, 5, 1, 0.0], jnp.float32)
        b = args.fleet_batch
        H, DT = 10, 0.03
        rpy, feet, x0 = bench.make_states(b, 0.0, np.random.default_rng(1))
        table = bench.trot_table(b, 0.0, np.random.default_rng(2), H)

        def build_prob(rpy, feet, x0, contact):
            r = se3.rpy_to_rotmat(jnp.asarray(rpy))
            k = jnp.arange(H, dtype=jnp.float32)[:, None]
            drift = jnp.zeros((13,), jnp.float32).at[3].set(0.4 * DT)
            x_des = (jnp.asarray(x0)[:, None, :]
                     + k[None] * drift[None, None, :])
            x_des = x_des.at[..., 9].set(0.4)
            a, bmat = srb.srb_continuous(r, params.total_inertia,
                                         params.total_mass,
                                         jnp.asarray(feet))
            ad, bd = srb.srb_discretize(a, bmat, DT)
            p, q = condense.condense_cost_structured(
                a, bd, ad, jnp.asarray(x0), x_des, weights, 4e-6, H, DT)
            fz_hi = (jnp.asarray(contact) * params.max_force) \
                .reshape(b, H * 4)
            return cone_qp.ConeQP(p=p, q=q,
                                  mu=jnp.asarray(0.45, jnp.float32),
                                  fz_lo=jnp.zeros_like(fz_hi),
                                  fz_hi=fz_hi)

        prob = jax.jit(build_prob)(rpy, feet, x0, table)
        jax.block_until_ready(prob)
        sp = min(4, n_dev)
        lat = {}
        for sp_k in (1, sp):
            mesh = make_mesh(sp_k, sp=sp_k)   # all sp: pure latency split
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
    existing.pop("_history_note", None)
    existing[platform] = results
    existing["_history_note"] = (
        "Entries produced by benchmarks/scaling_report.py round-5+, which "
        "times bench.build_bench verbatim. Pre-round-5 entries (solve-only "
        "monolithic harness) were removed as not comparable.")
    out.write_text(json.dumps(existing, indent=2) + "\n")
    write_md(Path(args.md), existing)
    print(json.dumps(results))


def write_md(md: Path, data: dict):
    """Regenerate SCALING.md wholesale from SCALING.json so the two
    artifacts cannot disagree (VERDICT r4: the dated-append format had
    accumulated internally inconsistent numbers)."""
    lines = [
        "# Scaling record",
        "",
        "Generated by `benchmarks/scaling_report.py` — do not hand-edit;",
        "re-run the script. All throughput lines time **exactly the "
        "program `bench.py` times** (`bench.build_bench`: full production "
        "MPC update, warm Fast-ADMM at the 15 ms cadence, trot table, "
        "batch-chunked), so the single-device numbers here and the "
        "BENCH_r*.json headline are the same measurement by construction.",
        "",
        "## Methodology notes",
        "",
        "- Weak scaling runs the identical chunked update once per device "
        "under `shard_map` over the `dp` mesh axis (no cross-device math "
        "in the update itself — scenario data parallelism). Its "
        "`weak_solves_per_s_1dev` baseline uses the small "
        "`batch_per_device` (a latency-regime batch), NOT the headline "
        "throughput batch — compare weak_* numbers only to each other; "
        "`headline_*` is the bench.py number.",
        "- On the CPU virtual mesh, devices share physical cores: "
        "`efficiency_upper_bound = cores/devices` is recorded and the "
        "honest comparison is `efficiency_vs_bound`.",
        "- The `sp` (solver-parallel) axis remains a correctness-proven "
        "mechanism with no winning regime measured in this environment "
        "(round-3/4 result, `distributed/solver_sp.py` docstring): sp>1 "
        "is 2-2.6x slower than sp=1 at every batch/horizon tried on the "
        "virtual mesh, pending real multi-chip ICI.",
        "- History: pre-round-5 reports timed a solve-only monolithic "
        "program at B=256; its TPU entries (151.5k r3, 139.5k r4) are "
        "not comparable to the headline — the drift between them was "
        "harness sensitivity, eliminated by this rewrite.",
        "",
    ]
    for platform, res in data.items():
        if platform.startswith("_") or not isinstance(res, dict):
            continue
        # Entries from sibling harnesses (e.g. scaling_multiprocess.py's
        # "cpu-multiprocess") carry different keys — render generically.
        head = (f"## {platform} — {res.get('date', '?')} "
                f"({res.get('devices', res.get('devices_per_process', '?'))}"
                f" device(s), {res.get('processes', '?')} process(es))")
        lines.append(head)
        lines.append("")
        for k, v in res.items():
            if k in ("date", "platform", "config"):
                continue
            lines.append(f"- {k}: {v}")
        if "config" in res:
            lines.append(f"- config: {json.dumps(res['config'])}")
        lines.append("")
    md.write_text("\n".join(lines))


if __name__ == "__main__":
    main()
