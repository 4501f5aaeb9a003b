"""Parity: the Pallas fused ADMM kernel must match the XLA cone solver
bit-for-bit in algorithm (same splitting, scaling, iteration count)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quadruped_tpu.dynamics import srb
from quadruped_tpu.robots import a1_params
from quadruped_tpu.solvers import condense, cone_qp

H = 10
B = 8  # small batch for interpreter-mode CPU execution


def build_batch(seed=0):
    params = a1_params()
    rng = np.random.default_rng(seed)
    yaw = jnp.asarray(rng.uniform(-1, 1, B), jnp.float32)
    feet = jnp.asarray(
        rng.normal(size=(B, 4, 3)) * 0.04
        + np.array([[0.17, -0.13, -0.28], [0.17, 0.13, -0.28],
                    [-0.17, -0.13, -0.28], [-0.17, 0.13, -0.28]]),
        jnp.float32)
    x0 = jnp.asarray(
        np.concatenate([rng.normal(size=(B, 12)) * 0.05,
                        -9.81 * np.ones((B, 1))], 1), jnp.float32)
    x_des = jnp.tile(x0[:, None, :], (1, H, 1)).at[:, :, 9].set(0.4)
    w = jnp.asarray([10, 10, 5, 40, 60, 100, 0, 0, 0.5, 5, 5, 1, 0.0],
                    jnp.float32)
    a, b = jax.vmap(lambda y, f: srb.srb_continuous(
        y, params.total_inertia, params.total_mass, f))(yaw, feet)
    ad, bd = srb.srb_discretize(a, b, 0.03)
    p, q = condense.condense_cost(ad, bd, x0, x_des, w, 4e-6, H)
    contact = np.ones((B, H, 4), np.float32)
    contact[:, :, 1] = np.tile((np.arange(H) % 2), (B, 1))  # FL phases
    fz_hi = jnp.asarray(contact.reshape(B, H * 4)) * params.max_force
    return cone_qp.ConeQP(p=p, q=q, mu=jnp.asarray(0.45, jnp.float32),
                          fz_lo=jnp.zeros_like(fz_hi), fz_hi=fz_hi)


def test_fused_matches_xla_solver():
    prob = build_batch()
    iters = 30
    # polish=2: iterate parity needs both paths to use the SAME (i.e.
    # fully converged) inverse; the production polish=1 inverses differ at
    # ~1e-4 between implementations, which 30 iterations amplify.
    sol_xla = cone_qp.solve(prob, iters=iters, ns_f32_polish=2)
    sol_fused = cone_qp.solve_fused(prob, iters=iters, tile=B,
                                    ns_f32_polish=2)
    np.testing.assert_allclose(np.asarray(sol_fused.x),
                               np.asarray(sol_xla.x), atol=5e-2, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(sol_fused.y),
                               np.asarray(sol_xla.y), atol=5e-2, rtol=1e-3)
    # Residuals agree with the XLA path (same algorithm, same iterate).
    np.testing.assert_allclose(np.asarray(sol_fused.prim_res),
                               np.asarray(sol_xla.prim_res), atol=5e-3)


def test_fused_warm_start():
    prob = build_batch(seed=1)
    cold = cone_qp.solve_fused(prob, iters=200, tile=B)
    warm = cone_qp.solve_fused(prob, iters=20, x0=cold.x, y0=cold.y, tile=B)
    # Warm-started iterations keep refining; stay within ~1 N of the
    # 200-iteration point (forces are O(100 N)).
    np.testing.assert_allclose(np.asarray(warm.x), np.asarray(cold.x),
                               atol=1.0)


def test_full_fused_matches_xla_solver():
    """The in-kernel NS is pure f32 while the XLA path's NS carries bf16
    (both converge to the same inverse) — solutions agree at force
    tolerance rather than bitwise-trajectory level."""
    prob = build_batch(seed=2)
    sol_xla = cone_qp.solve(prob, iters=120, ns_f32_polish=2)
    sol_full = cone_qp.solve_fused_full(prob, iters=120, tile=B,
                                        ns_f32_polish=2)
    np.testing.assert_allclose(np.asarray(sol_full.x),
                               np.asarray(sol_xla.x), atol=1.0)
    assert float(jnp.max(sol_full.prim_res)) < 1e-2


def test_fused_production_accel_matches_xla():
    """Production warm-solve semantics — Fast-ADMM (restart 20, alpha 1),
    warm-started — through the loop-only kernel vs the XLA path. This is
    the configuration bench.py times, so kernel results are comparable to
    the headline, not just to the legacy relaxed scheme."""
    prob = build_batch(seed=3)
    boot = cone_qp.solve(prob, iters=300, ns_f32_polish=2)
    sol_xla = cone_qp.solve(prob, iters=24, alpha=1.0, accel_restart=20,
                            ns_f32_polish=2, x0=boot.x, y0=boot.y)
    sol_k = cone_qp.solve_fused(prob, iters=24, alpha=1.0,
                                accel_restart=20, ns_f32_polish=2,
                                tile=B, x0=boot.x, y0=boot.y)
    np.testing.assert_allclose(np.asarray(sol_k.x),
                               np.asarray(sol_xla.x), atol=5e-2, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(sol_k.y),
                               np.asarray(sol_xla.y), atol=5e-2, rtol=1e-3)


def test_full_fused_production_accel_matches_xla():
    """Same production semantics through the NS+ADMM fully fused kernel
    (bf16 NS + f32 polish in-kernel, mirroring newton_schulz_inverse)."""
    prob = build_batch(seed=4)
    boot = cone_qp.solve(prob, iters=300, ns_f32_polish=2)
    sol_xla = cone_qp.solve(prob, iters=24, alpha=1.0, accel_restart=20,
                            ns_f32_polish=2, x0=boot.x, y0=boot.y)
    sol_k = cone_qp.solve_fused_full(prob, iters=24, alpha=1.0,
                                     accel_restart=20, ns_f32_polish=2,
                                     tile=B, x0=boot.x, y0=boot.y)
    np.testing.assert_allclose(np.asarray(sol_k.x),
                               np.asarray(sol_xla.x), atol=1.0)
