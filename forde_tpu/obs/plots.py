"""Brain-map plot artifacts: Brain Scan, Feature Space, Census.

Parity target: reference src/utils/logging.py (plot_brain_scan :7-19,
plot_feature_space :22-52) plus the Census histogram the README mandates
(README.md:61-66) but the reference never implemented. Unlike the
reference — where these helpers are dead code — the training loop here
actually calls them after every slow loop.

Matplotlib only (no seaborn dependency); import is lazy so headless/test
environments without a display never pay for it.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np


def _mpl():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def plot_brain_scan(
    smoothed_grid: np.ndarray, epoch: int, step: int, output_dir: str = "plots"
) -> str:
    """Heatmap of the smoothed assignment grid (reference logging.py:7-19)."""
    plt = _mpl()
    os.makedirs(output_dir, exist_ok=True)
    grid = np.asarray(smoothed_grid)
    if grid.ndim == 1:
        grid = grid[None, :]
    fig, ax = plt.subplots(figsize=(8, 6))
    im = ax.imshow(grid, cmap="viridis", interpolation="nearest")
    for (i, j), val in np.ndenumerate(grid):
        ax.text(j, i, str(int(val)), ha="center", va="center", color="w")
    fig.colorbar(im, ax=ax)
    ax.set_title(f"Brain Scan - Epoch {epoch}, Step {step}")
    path = os.path.join(output_dir, f"brain_scan_epoch{epoch}_step{step}.png")
    fig.savefig(path)
    plt.close(fig)
    return path


def plot_feature_space(
    stats: np.ndarray,
    assignments: np.ndarray,
    epoch: int,
    step: int,
    output_dir: str = "plots",
    feature_names=("feature 0", "feature 1"),
) -> str:
    """Scatter of the first two stat dims colored by cluster
    (reference logging.py:22-52)."""
    plt = _mpl()
    os.makedirs(output_dir, exist_ok=True)
    stats = np.asarray(stats)
    assignments = np.asarray(assignments)
    fig, ax = plt.subplots(figsize=(8, 6))
    sc = ax.scatter(
        stats[:, 0], stats[:, 1], c=assignments, cmap="viridis", alpha=0.8
    )
    fig.colorbar(sc, ax=ax, label="cluster")
    ax.set_xlabel(feature_names[0])
    ax.set_ylabel(feature_names[1])
    ax.set_title(f"Feature Space - Epoch {epoch}, Step {step}")
    path = os.path.join(output_dir, f"feature_space_epoch{epoch}_step{step}.png")
    fig.savefig(path)
    plt.close(fig)
    return path


def plot_census(
    assignments: np.ndarray,
    epoch: int,
    step: int,
    output_dir: str = "plots",
    num_clusters: Optional[int] = None,
    labels: Dict[int, str] = None,
) -> str:
    """Histogram of the assignment distribution — the README-mandated
    model-health Census (README.md:66); no reference implementation exists."""
    plt = _mpl()
    os.makedirs(output_dir, exist_ok=True)
    assignments = np.asarray(assignments).reshape(-1)
    k = num_clusters or int(assignments.max()) + 1
    counts = np.bincount(assignments, minlength=k)
    fig, ax = plt.subplots(figsize=(8, 6))
    names = [
        (labels or {}).get(i, f"cluster {i}") for i in range(k)
    ]
    ax.bar(names, counts)
    ax.set_ylabel("count")
    ax.set_title(f"Census - Epoch {epoch}, Step {step}")
    path = os.path.join(output_dir, f"census_epoch{epoch}_step{step}.png")
    fig.savefig(path)
    plt.close(fig)
    return path
