"""Zero-moment-point estimate (cart-table model), batched.

Capability parity with `qrRobotEstimator::ComputeZMP`
(quadruped/src/estimators/qr_robot_estimator.cpp:95-105): the cart-on-table
approximation zmp_xy = com_xy - (z / g) * a_xy, using the estimated CoM
height and the (filtered) CoM acceleration. The reference's dormant 18-state
CMU-lineage KF (CMUUpdate :165-269, not wired to outputs there) is
intentionally not reproduced; the velocity KF in estimation/velocity.py is
the active estimator, matching the reference's wiring.
"""

from __future__ import annotations

import jax.numpy as jnp

G = 9.81


def compute_zmp(com_position: jnp.ndarray,      # [..., 3] world
                com_acceleration: jnp.ndarray,  # [..., 3] world (gravity-free)
                ) -> jnp.ndarray:
    """[..., 2] ZMP in world frame."""
    z = com_position[..., 2]
    return com_position[..., :2] - (z / G)[..., None] * com_acceleration[..., :2]


def support_margin(zmp_xy: jnp.ndarray,              # [..., 2]
                   foot_positions_world: jnp.ndarray,  # [..., 4, 3]
                   contact: jnp.ndarray,             # [..., 4]
                   ) -> jnp.ndarray:
    """[...] signed distance from the ZMP to the support-polygon centroid
    minus the polygon's mean radius — negative means the ZMP left the
    support region (a batched stability monitor; the reference's tip-over
    guard analogue at planner level)."""
    n = jnp.maximum(jnp.sum(contact, axis=-1), 1.0)
    centroid = jnp.sum(foot_positions_world[..., :2]
                       * contact[..., None], axis=-2) / n[..., None]
    radii = jnp.linalg.norm(
        (foot_positions_world[..., :2] - centroid[..., None, :])
        * contact[..., None], axis=-1)
    mean_radius = jnp.sum(radii, axis=-1) / n
    d = jnp.linalg.norm(zmp_xy - centroid, axis=-1)
    return mean_radius - d
