"""Trajectory plotting (parity: dust3r/utils/vo_eval.py plot_trajectory :434)."""

from __future__ import annotations

from typing import Optional

import numpy as np


def plot_trajectory(
    out_path: str,
    pred,
    gt=None,
    title: str = "",
):
    """Top-down (best-variance-plane) trajectory plot -> PNG.

    pred/gt: evals.trajectory.Trajectory.
    """
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    ref = gt if gt is not None else pred
    order = np.argsort(np.var(ref.positions, axis=0))
    a1, a2 = order[2], order[1]  # two highest-variance axes
    names = "xyz"

    fig, ax = plt.subplots(figsize=(6, 6))
    ax.plot(pred.positions[:, a1], pred.positions[:, a2], "b-", label="pred")
    if gt is not None:
        ax.plot(gt.positions[:, a1], gt.positions[:, a2], "k--", label="gt")
    ax.set_xlabel(names[a1])
    ax.set_ylabel(names[a2])
    ax.set_title(title)
    ax.legend()
    ax.set_aspect("equal", adjustable="datalim")
    fig.savefig(out_path, dpi=90, bbox_inches="tight")
    plt.close(fig)
    return out_path
