"""Terrain height fields for the batched simulators.

Capability parity with the reference's terrain model
(quadruped/config/<robot>/terrain.yaml terrain_type + qrGap/qrStair structs
in the ground estimator / foot stepper, qr_ground_surface_estimator.cpp
Reset :73-130): PLANE, SLOPE, STAIRS, GAPS (plum piles), ROUGH — expressed
as pure height-field functions z(x, y) that close over their parameters, so
every scenario in a batch can carry different terrain parameters.
"""

from __future__ import annotations

import jax.numpy as jnp


class TerrainType:
    PLANE = 0
    SLOPE = 1
    STAIRS = 2
    GAPS = 3
    ROUGH = 4


def plane(height=0.0):
    def f(x, y):
        return jnp.full_like(x, height)

    return f


def slope(pitch=0.1, height=0.0):
    """Incline rising along +x at `pitch` radians."""
    slope_k = jnp.tan(jnp.asarray(pitch))

    def f(x, y):
        return height + slope_k * x

    return f


def stairs(step_length=0.25, step_height=0.06, start_x=0.5):
    def f(x, y):
        n = jnp.floor(jnp.maximum(x - start_x, 0.0) / step_length)
        return n * step_height

    return f


def gaps(gap_centers=(1.0, 1.6), gap_width=0.12, depth=0.5):
    """Plum-pile style gaps: ground drops `depth` inside each gap strip."""
    centers = jnp.asarray(gap_centers)

    def f(x, y):
        in_gap = jnp.any(
            jnp.abs(x[..., None] - centers) < gap_width / 2, axis=-1)
        return jnp.where(in_gap, -depth, 0.0)

    return f


def rough(amplitude=0.02, wavelength=0.3):
    """Deterministic sinusoidal roughness (batch-friendly stand-in for
    random rough terrain; seedable variants can phase-shift per scenario)."""

    def f(x, y):
        k = 2 * jnp.pi / wavelength
        return amplitude * (jnp.sin(k * x) * jnp.cos(0.7 * k * y))

    return f


def named(terrain_type: int, **kw):
    return {TerrainType.PLANE: plane, TerrainType.SLOPE: slope,
            TerrainType.STAIRS: stairs, TerrainType.GAPS: gaps,
            TerrainType.ROUGH: rough}[terrain_type](**kw)
