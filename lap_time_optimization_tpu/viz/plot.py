"""Track/path/corner/velocity plots (capability parity with reference src/plot.py).

Differences by design: TeX rendering is opt-in (the reference hard-requires a
LaTeX install, src/plot.py:10); everything else — colors, normalization
ranges, layout — matches so output images are visually comparable.
"""

from __future__ import annotations

import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
from matplotlib.collections import LineCollection  # noqa: E402

plt.rc("font", family="serif")

BOUNDARY_COLOR = "tab:gray"
DPI = 500  # reference src/plot.py:16


def plot_path(dest, left, right, samples, control=None, show_cones=False):
    """Track boundaries + solid path (reference src/plot.py:21-42)."""
    left, right, samples = map(np.asarray, (left, right, samples))
    plt.figure()
    plt.plot(left[0], left[1], color=BOUNDARY_COLOR, linestyle="solid", zorder=1, linewidth=1)
    plt.plot(right[0], right[1], color=BOUNDARY_COLOR, linestyle="solid", zorder=1, linewidth=1)
    plt.plot(samples[0], samples[1], color="tab:green", linestyle="solid", zorder=2)
    if control is not None:
        control = np.asarray(control)
        plt.scatter(control[0], control[1], color="tab:green", marker=".")
    if show_cones:
        plt.scatter(left[0], left[1], color="tab:blue", marker=".")
        plt.scatter(right[0], right[1], color="tab:orange", marker=".")
    plt.gca().set_aspect("equal", adjustable="box")
    plt.axis("off")
    plt.savefig(dest, bbox_inches="tight", dpi=DPI)
    plt.close()


def plot_corners(dest, left, right, samples, is_corner):
    """Corner-mask colored path (reference src/plot.py:45-63)."""
    left, right, samples = map(np.asarray, (left, right, samples))
    plt.figure()
    plt.plot(left[0], left[1], color=BOUNDARY_COLOR, linestyle="solid", linewidth=1)
    plt.plot(right[0], right[1], color=BOUNDARY_COLOR, linestyle="solid", linewidth=1)
    p = samples.T.reshape(-1, 1, 2)
    segments = np.concatenate([p[:-1], p[1:]], axis=1)
    lc = LineCollection(
        segments, array=np.asarray(is_corner, dtype=float), cmap="Greens",
        norm=plt.Normalize(0, 1.5), linewidth=4,
    )
    plt.gca().add_collection(lc)
    plt.gca().set_aspect("equal", adjustable="box")
    plt.axis("off")
    plt.savefig(dest, bbox_inches="tight", dpi=DPI)
    plt.close()


def plot_trajectory(dest, left, right, samples, velocities):
    """Velocity-gradient path, inferno colormap fixed to 10-40 m/s
    (reference src/plot.py:66-88)."""
    left, right, samples = map(np.asarray, (left, right, samples))
    plt.figure()
    plt.plot(left[0], left[1], color=BOUNDARY_COLOR, linestyle="solid", linewidth=1, zorder=1)
    plt.plot(right[0], right[1], color=BOUNDARY_COLOR, linestyle="solid", linewidth=1, zorder=1)
    p = samples.T.reshape(-1, 1, 2)
    segments = np.concatenate([p[:-1], p[1:]], axis=1)
    lc = LineCollection(
        segments, array=np.asarray(velocities), cmap="inferno",
        norm=plt.Normalize(10, 40), linewidth=2, zorder=2,
    )
    plt.gca().add_collection(lc)
    plt.gcf().colorbar(lc, orientation="horizontal", label="Velocity (m/s)", pad=0.05, aspect=30)
    plt.gca().set_aspect("equal", adjustable="box")
    plt.axis("off")
    plt.savefig(dest, bbox_inches="tight", dpi=DPI)
    plt.close()
