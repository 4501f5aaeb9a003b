"""Rollout visualization: trace plots for batched runs.

Replaces the reference's debug visualization stack — matplotlib-cpp
`Visualization2D` (quadruped/src/utils/qr_visualization.cpp:91) and the
xpp/RViz cartesian-state bridge (quadruped/src/ros/qr_control2gazebo_msg.cpp)
— with host-side plotting of rollout traces. Works on the arrays the rollout
drivers already return; no sim-process coupling.

All functions degrade to no-ops when matplotlib is unavailable (headless
benchmark machines).
"""

from __future__ import annotations

import numpy as np


def _plt():
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        return plt
    except Exception:
        return None


def plot_rollout(result, path: str = "/tmp/rollout.png", dt: float = 0.002,
                 batch_index=None):
    """Plot height / velocity / stance-force traces from a RolloutResult
    (sim/rollout.py) or any object with base_height_trace, vel_trace,
    forces_trace arrays of shape [T, ...]."""
    plt = _plt()
    if plt is None:
        return None
    hs = np.asarray(result.base_height_trace)
    vs = np.asarray(result.vel_trace)
    fs = np.asarray(result.forces_trace)
    if batch_index is not None:
        hs, vs, fs = hs[:, batch_index], vs[:, batch_index], fs[:, batch_index]
    t = np.arange(hs.shape[0]) * dt

    fig, axes = plt.subplots(3, 1, figsize=(9, 8), sharex=True)
    axes[0].plot(t, hs)
    axes[0].set_ylabel("CoM height [m]")
    axes[1].plot(t, vs[..., 0], label="vx")
    axes[1].plot(t, vs[..., 1], label="vy")
    axes[1].legend(loc="upper right")
    axes[1].set_ylabel("world velocity [m/s]")
    for leg, name in enumerate(["FR", "FL", "RR", "RL"]):
        axes[2].plot(t, fs[..., leg, 2], label=name, lw=0.8)
    axes[2].legend(loc="upper right", ncol=4)
    axes[2].set_ylabel("stance fz [N]")
    axes[2].set_xlabel("time [s]")
    fig.tight_layout()
    fig.savefig(path, dpi=110)
    plt.close(fig)
    return path


def plot_gait_diagram(leg_states, path: str = "/tmp/gait.png",
                      dt: float = 0.002):
    """Gait diagram: [T, 4] leg states -> stance bars per leg."""
    plt = _plt()
    if plt is None:
        return None
    ls = np.asarray(leg_states)
    t = np.arange(ls.shape[0]) * dt
    fig, ax = plt.subplots(figsize=(9, 2.5))
    for leg, name in enumerate(["FR", "FL", "RR", "RL"]):
        stance = (ls[:, leg] == 1) | (ls[:, leg] == 2)
        ax.fill_between(t, leg + 0.1, leg + 0.9, where=stance, step="post")
    ax.set_yticks([0.5, 1.5, 2.5, 3.5])
    ax.set_yticklabels(["FR", "FL", "RR", "RL"])
    ax.set_xlabel("time [s]")
    fig.tight_layout()
    fig.savefig(path, dpi=110)
    plt.close(fig)
    return path
