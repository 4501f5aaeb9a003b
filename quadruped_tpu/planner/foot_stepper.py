"""Terrain-constrained foothold adjustment (gaps / stairs), batched.

Capability parity with `qrFootStepper`
(quadruped/src/planner/qr_foot_stepper.cpp:30-525) and the terrain-aware
`qrFootholdPlanner::UpdateOnce` path (qr_foothold_planner.cpp:67-109): given
nominal next footholds and a terrain description, shift the step length so no
foot lands inside a gap (plum-pile terrain) and snap foot heights to stair
treads.

TPU-first redesign: the reference solves a sequence of 1-variable QPs with
QuadProg++ until a feasible offset is found (`GetOptimalFootholdsOffset`,
attempts loop :339+). Here feasibility is evaluated for a *static grid of
candidate offsets* in parallel and the minimum-magnitude feasible offset is
selected with an argmin — same optimum (the QP is 1-D with interval
constraints, so the solution lies on a constraint boundary or at zero),
fully vectorized, no iteration.
"""

from __future__ import annotations

import jax.numpy as jnp

# Candidate x-offsets the stepper may add to the nominal step (m).
CANDIDATE_OFFSETS = jnp.linspace(-0.15, 0.15, 61)


def gap_infeasible(x: jnp.ndarray, gap_centers: jnp.ndarray,
                   gap_width) -> jnp.ndarray:
    """[...] 1.0 where world-x lands inside any gap strip."""
    d = jnp.abs(x[..., None] - gap_centers)
    return jnp.any(d < gap_width / 2 + 0.02, axis=-1)  # 2 cm margin


def optimal_foothold_offset(nominal_x: jnp.ndarray,   # [4] world x of footholds
                            gap_centers: jnp.ndarray,  # [G]
                            gap_width) -> jnp.ndarray:
    """[] common x-offset moving all footholds out of gaps
    (GetOptimalFootholdsOffset): smallest |offset| such that every foothold
    is clear."""
    cand = CANDIDATE_OFFSETS
    shifted = nominal_x[None, :] + cand[:, None]           # [C, 4]
    bad = gap_infeasible(shifted, gap_centers, gap_width)  # [C, 4]
    feasible = ~jnp.any(bad, axis=-1)                      # [C]
    cost = jnp.where(feasible, jnp.abs(cand), jnp.inf)
    best = jnp.argmin(cost)
    # If nothing is feasible, keep the nominal step (offset 0).
    return jnp.where(jnp.isfinite(cost[best]), cand[best], 0.0)


def snap_to_stairs(foothold_world: jnp.ndarray,  # [..., 4, 3]
                   step_length, step_height, start_x) -> jnp.ndarray:
    """Snap foothold heights to the stair tread under each (x, y), and nudge
    x away from tread edges (CheckSolution / stair model)."""
    x = foothold_world[..., 0]
    rel = jnp.maximum(x - start_x, 0.0)
    tread = jnp.floor(rel / step_length)
    z = tread * step_height
    # Keep feet >= 3 cm away from the rising edge of the next tread.
    frac = rel - tread * step_length
    near_edge = (frac > step_length - 0.03) & (x > start_x)
    x_adj = jnp.where(near_edge, x - (frac - (step_length - 0.03)), x)
    return jnp.stack([x_adj, foothold_world[..., 1], z], axis=-1)


def adjust_footholds_for_gaps(foothold_world: jnp.ndarray,  # [4, 3]
                              gap_centers: jnp.ndarray,
                              gap_width) -> jnp.ndarray:
    """Apply the common offset to all footholds (UpdateOnce -> stepper)."""
    off = optimal_foothold_offset(foothold_world[:, 0], gap_centers,
                                  gap_width)
    return foothold_world.at[:, 0].add(off)
