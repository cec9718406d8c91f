"""Simulation replay: curvilinear states → Cartesian car positions.

Capability parity with reference src/visualiser.py:9-74: reconstruct the car
position as path(s) + n·normal, rotate the body-frame velocity into the track
frame, quiver every 10th step.  The reconstruction itself is vectorized over
all steps via the MPCTrack lookup tables instead of a per-step spline solve.
"""

from __future__ import annotations

import json

import jax.numpy as jnp
import numpy as np

from lap_time_optimization_tpu.mpc.track import MPCTrack


def vehicle_positions(track: MPCTrack, states: np.ndarray):
    """states (n, 8) → (positions (n,2), velocities (n,2)) in world frame
    (reference src/visualiser.py:37-67)."""
    states = np.asarray(states)
    s, n, mu, vx, vy = states[:, 0], states[:, 1], states[:, 2], states[:, 3], states[:, 4]
    pts, tangents = track.position(jnp.asarray(s))
    pts = np.asarray(pts).T  # (n, 2)
    tan = np.asarray(tangents).T
    normal = np.stack([-tan[:, 1], tan[:, 0]], axis=1)
    positions = pts + n[:, None] * normal
    v_long = vx * np.cos(mu) - vy * np.sin(mu)
    v_lat = vx * np.sin(mu) + vy * np.cos(mu)
    velocities = v_long[:, None] * tan + v_lat[:, None] * normal
    return positions, velocities


def plot_replay(dest: str, track: MPCTrack, sim_results_path: str, quiver_every: int = 10):
    """Track + optimal path + simulated car positions/velocity quivers."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    with open(sim_results_path) as f:
        data = json.load(f)
    states = np.asarray(data["x"])[:, :, 0]
    positions, velocities = vehicle_positions(track, states)

    fig, ax = plt.subplots(figsize=(16, 9))
    fig.suptitle("Visualiser")
    ax.plot(*np.asarray(track.path_xy), "g")
    ax.plot(*np.asarray(track.left_xy), "black")
    ax.plot(*np.asarray(track.right_xy), "black")
    for i in range(0, len(positions), quiver_every):
        ax.quiver(
            positions[i, 0], positions[i, 1], velocities[i, 0], velocities[i, 1],
            angles="xy", scale_units="xy", scale=1, color="blue",
        )
    ax.scatter(positions[:, 0], positions[:, 1], s=4)
    ax.set_aspect("equal", adjustable="box")
    fig.savefig(dest, bbox_inches="tight", dpi=200)
    plt.close(fig)
    return positions, velocities


def plot_internal(dest: str, track: MPCTrack, sim_results_path: str, dt: float = 0.1):
    """Internal-parameter plots: k(s), slip angles, lateral forces, yaw rate
    (capability parity with reference src/show_results.py:20-46)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    with open(sim_results_path) as f:
        data = json.load(f)
    states = np.asarray(data["x"])[:, :, 0]
    alphas = np.asarray(data["alpha"])
    fys = np.asarray(data["Fy"])
    t = np.arange(len(states)) * dt
    k = np.asarray(track.curvature(jnp.asarray(states[:, 0])))

    fig, axs = plt.subplots(2, 2, figsize=(14, 8))
    axs[0, 0].plot(t, k)
    axs[0, 0].set_title("curvature k(s(t))")
    axs[0, 1].plot(t, alphas[:, 0], label="front")
    axs[0, 1].plot(t, alphas[:, 1], label="rear")
    axs[0, 1].set_title("slip angles")
    axs[0, 1].legend()
    axs[1, 0].plot(t, fys[:, 0], label="front")
    axs[1, 0].plot(t, fys[:, 1], label="rear")
    axs[1, 0].set_title("lateral forces")
    axs[1, 0].legend()
    axs[1, 1].plot(t, states[:, 5])
    axs[1, 1].set_title("yaw rate r")
    for ax in axs.flat:
        ax.set_xlabel("t [s]")
    fig.tight_layout()
    fig.savefig(dest, bbox_inches="tight", dpi=200)
    plt.close(fig)
