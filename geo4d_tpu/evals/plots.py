"""Trajectory plotting (parity: dust3r/utils/vo_eval.py plot_trajectory :434).

Matches the reference's eval-report contract: the prediction is sim3-aligned
onto ground truth before plotting (evo `traj.align`), the plot plane is the
two highest-variance GT axes (`best_plotmode` :261-264), GT dashed gray /
prediction solid blue.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from geo4d_tpu.evals.trajectory import Trajectory, umeyama_align


def plot_trajectory(
    out_path: str,
    pred: Trajectory,
    gt: Optional[Trajectory] = None,
    title: str = "",
    align: bool = True,
    correct_scale: bool = True,
):
    """Top-down (best-variance-plane) trajectory plot -> PNG."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    pred_pos = pred.positions
    if gt is not None and align:
        s, R, t = umeyama_align(pred, gt, correct_scale=correct_scale)
        pred_pos = (s * pred_pos) @ R.T + t

    ref_pos = gt.positions if gt is not None else pred_pos
    order = np.argsort(np.var(ref_pos, axis=0))
    a1, a2 = order[2], order[1]  # two highest-variance axes
    names = "xyz"

    fig, ax = plt.subplots(figsize=(8, 8))
    if gt is not None:
        ax.plot(gt.positions[:, a1], gt.positions[:, a2], "--",
                color="gray", label="Ground Truth")
    ax.plot(pred_pos[:, a1], pred_pos[:, a2], "-", color="blue",
            label="Predicted")
    ax.set_xlabel(names[a1])
    ax.set_ylabel(names[a2])
    ax.set_title(title)
    ax.legend()
    ax.set_aspect("equal", adjustable="datalim")
    fig.savefig(out_path, dpi=90, bbox_inches="tight")
    plt.close(fig)
    return out_path
