"""Warm-started solve quality at the MPC cadence.

The closed loop re-solves every 15 ticks from the previous solution (the
reference hot-starts qpOASES the same way). This test drives a sequence of
slowly-varying MPC problems (as in a real trot) and checks that
warm-started 20-iteration ADMM tracks the fully-converged solution within
control tolerance — the justification for low iteration budgets in
production rollouts.
"""

import jax
import jax.numpy as jnp
import numpy as np

from quadruped_tpu.core import se3
from quadruped_tpu.dynamics import srb
from quadruped_tpu.robots import a1_params
from quadruped_tpu.solvers import condense, cone_qp

H = 10
DT = 0.03


def problem_at(t, params, weights):
    """A slowly-varying trot-like MPC problem parameterized by time."""
    rpy = jnp.asarray([0.02 * np.sin(3 * t), 0.02 * np.cos(2 * t), 0.1 * t],
                      jnp.float32)
    r = se3.rpy_to_rotmat(rpy)
    feet = jnp.asarray(
        np.array([[0.17, -0.13, -0.28], [0.17, 0.13, -0.28],
                  [-0.17, -0.13, -0.28], [-0.17, 0.13, -0.28]])
        + 0.02 * np.sin(t * 5), jnp.float32)
    a, b = srb.srb_continuous(r, params.total_inertia, params.total_mass,
                              feet)
    ad, bd = srb.srb_discretize(a, b, DT)
    x0 = srb.srb_initial_state(
        rpy, jnp.asarray([0.4 * t, 0.0, 0.27 + 0.01 * np.sin(4 * t)]),
        jnp.asarray([0.0, 0.0, 0.1]), jnp.asarray([0.4, 0.0, 0.0]))
    x_des = jnp.tile(x0, (H, 1)).at[:, 9].set(0.4)
    p, q = condense.condense_cost(ad, bd, x0, x_des, weights, 4e-6, H)
    # Alternating diagonal contact (trot) advancing with t.
    phase = (np.arange(H) * DT / 0.6 + t / 0.6) % 1.0
    diag_a = (phase < 0.6).astype(np.float32)
    contact = np.stack([diag_a, 1 - diag_a, 1 - diag_a, diag_a], axis=1)
    contact[0] = 1.0  # current tick in full stance for determinism
    fz_hi = jnp.asarray(contact.reshape(H * 4), jnp.float32) \
        * params.max_force
    return cone_qp.ConeQP(p=p, q=q, mu=jnp.asarray(0.45, jnp.float32),
                          fz_lo=jnp.zeros_like(fz_hi), fz_hi=fz_hi)


def test_warm_20_iter_tracks_converged():
    params = a1_params()
    weights = jnp.asarray([10, 10, 5, 40, 60, 100, 0, 0, 0.5, 5, 5, 1, 0.0],
                          jnp.float32)
    x_warm = None
    y_warm = None
    scale = float(params.total_mass) * 9.81
    errs = []
    for k in range(12):
        t = 0.03 * k  # one solve per MPC period
        prob = problem_at(t, params, weights)
        ref = cone_qp.solve(prob, iters=800)
        if x_warm is None:
            sol = cone_qp.solve(prob, iters=120)  # cold start (first 50
            # ticks solve every tick in the reference; budget is larger)
        else:
            sol = cone_qp.solve(prob, iters=20, x0=x_warm, y0=y_warm)
        x_warm, y_warm = sol.x, sol.y
        err = float(jnp.max(jnp.abs(sol.x[:12] - ref.x[:12])))
        errs.append(err)
    errs = np.asarray(errs)
    # First-step forces within 2.5% of m*g of the converged solution.
    assert errs.max() < 0.025 * scale, errs
