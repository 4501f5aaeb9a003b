"""Round-5 measurement attempt: where does the headline budget go?

OUTCOME — A DOCUMENTED MEASUREMENT ARTIFACT, NOT ANSWERS. On this
development setup the TPU is reached through an experimental tunneled
backend that caches identical (executable, input) calls and whose
`block_until_ready` does not force execution for small toy programs:
this script reports physically impossible rates (>1 PFLOP/s on a chip
whose bf16 peak is ~200 TFLOP/s), while forcing a fetch takes seconds
per call. The conclusions it was built to extract were obtained instead
by benchmarking THROUGH bench.py at production sizes (whose 20-rep
protocol is reproducible and responds consistently to algorithm
changes): the fused VMEM-resident kernels measure 196.6-222.5k solves/s
at the headline configuration vs 278.5k pure XLA (same day) — see
solvers/pallas_admm.py ROLE note and STATUS.md. Kept as the record of
the artifact: do NOT microbenchmark with toy programs on this machine;
express perf experiments as bench.py configurations.

Run: python benchmarks/exp_mxu_rate.py   (TPU; ~2 min)
"""

from __future__ import annotations

import functools
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("QTPU_CACHE", "/tmp/tpu_cache"))

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 128


def timeit(fn, *args, reps=20, runs=3):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / reps)
    return best


def xla_batched_matmul(b, dtype, precision=None, iters=40):
    """iters chained batched matmuls (the NS access pattern: each step
    reads the carry, so HBM streams M every step unless fused).
    Normalized each step so bf16 cannot overflow; output reduced to a
    scalar so the timing cannot skip the dependency chain."""
    m = jnp.asarray(np.random.default_rng(0).normal(size=(b, N, N)),
                    dtype)

    @jax.jit
    def f(m):
        def body(x, _):
            y = jnp.einsum("...ij,...jk->...ik", m, x,
                           preferred_element_type=jnp.float32,
                           precision=precision)
            y = y / jnp.max(jnp.abs(y), axis=(-2, -1), keepdims=True)
            return y.astype(dtype), None
        x, _ = jax.lax.scan(body, m, None, length=iters)
        return jnp.sum(x.astype(jnp.float32))

    dt = timeit(f, m)
    flops = 2 * N**3 * b * iters
    return dt, flops / dt / 1e12


def pallas_unrolled_dots(b, tile, dtype, iters=10):
    """Per-element [128,128] dots, unrolled over a VMEM-resident tile,
    iterated `iters` times (the fused-NS access pattern)."""
    m = jnp.asarray(np.random.default_rng(0).normal(size=(b, N, N)),
                    dtype)

    def kernel(m_ref, out_ref):
        def body(_, x):
            # x: [tile, N, N] value; per-element dots unrolled.
            outs = []
            for i in range(tile):
                y = jnp.dot(m_ref[i], x[i],
                            preferred_element_type=jnp.float32)
                y = y / jnp.max(jnp.abs(y))
                outs.append(y.astype(dtype))
            return jnp.stack(outs)
        x = jax.lax.fori_loop(0, iters, body, m_ref[:])
        out_ref[:] = x

    @jax.jit
    def f(m):
        out = pl.pallas_call(
            kernel,
            grid=(b // tile,),
            in_specs=[pl.BlockSpec((tile, N, N), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((tile, N, N), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b, N, N), dtype),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=int(14.5 * 1024 * 1024)),
        )(m)
        return jnp.sum(out.astype(jnp.float32))

    dt = timeit(f, m)
    flops = 2 * N**3 * b * iters
    return dt, flops / dt / 1e12


def ns_share_of_headline(batch=8192, chunk=256):
    """Time JUST the production cold NS inverse (11 iters, bf16+f32-HIGH
    polish) on the bench's M matrices, chunked like the headline."""
    from quadruped_tpu.solvers import cone_qp

    rng = np.random.default_rng(0)
    a = rng.normal(size=(batch, 120, 120)).astype(np.float32)
    m = jnp.asarray(np.einsum("bij,bkj->bik", a, a) / 120
                    + 0.1 * np.eye(120, dtype=np.float32))

    @jax.jit
    def f(m):
        rs = lambda x: x.reshape((batch // chunk, chunk) + x.shape[1:])
        return jax.lax.map(lambda ch: cone_qp.newton_schulz_inverse(ch),
                           rs(m))

    dt = timeit(f, m, reps=5)
    return dt / batch * 1e6   # us per element


def main():
    print(f"device: {jax.devices()[0]}")
    print("\n-- XLA batched matmul (chained, NS pattern), B=1024 --")
    for dtype, prec, tag in [
            (jnp.bfloat16, None, "bf16"),
            (jnp.float32, jax.lax.Precision.HIGH, "f32 HIGH"),
            (jnp.float32, jax.lax.Precision.HIGHEST, "f32 HIGHEST")]:
        dt, tf = xla_batched_matmul(1024, dtype, prec)
        print(f"  {tag:12s}: {dt*1e3:7.2f} ms  {tf:6.1f} TFLOP/s"
              f"  ({dt/10/1024*1e9:6.1f} ns per [128^3] matmul)")

    print("\n-- Pallas unrolled per-element dots, B=1024, iters=10 --")
    for tile in (8, 16, 32):
        for dtype, tag in [(jnp.bfloat16, "bf16"), (jnp.float32, "f32")]:
            try:
                dt, tf = pallas_unrolled_dots(1024, tile, dtype)
                print(f"  tile={tile:2d} {tag:5s}: {dt*1e3:7.2f} ms "
                      f" {tf:6.1f} TFLOP/s")
            except Exception as e:  # noqa: BLE001
                print(f"  tile={tile:2d} {tag:5s}: FAILED "
                      f"{type(e).__name__}: {str(e)[:120]}")

    print("\n-- production NS inverse share (B=8192 chunk=256) --")
    us = ns_share_of_headline()
    print(f"  NS alone: {us:.2f} us/solve  "
          f"(headline total is ~3.53 us/solve at 283k)")


if __name__ == "__main__":
    main()
