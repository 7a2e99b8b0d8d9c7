"""Training-time visualisation: pred-vs-GT waypoints/route over the camera.

Counterpart of reference `simlingo_training/callbacks/visualise.py`
(VisualiseCallback): every N steps, plot predicted and ground-truth
waypoints/route plus the generated/target language; saved as PNGs under the
run dir (wandb upload optional).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import numpy as np


def plot_predictions(image: Optional[np.ndarray],
                     pred_route: np.ndarray, gt_route: np.ndarray,
                     pred_wps: np.ndarray, gt_wps: np.ndarray,
                     text: str = "", out_path: str = "viz.png") -> str:
    """BEV scatter of route/waypoints (+ camera image when given)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    ncols = 2 if image is not None else 1
    fig, axes = plt.subplots(1, ncols, figsize=(6 * ncols, 6))
    axes = np.atleast_1d(axes)
    if image is not None:
        axes[0].imshow(image.astype(np.uint8))
        axes[0].set_title("camera")
        axes[0].axis("off")
    ax = axes[-1]
    # BEV: x forward (up), y right
    ax.plot(gt_route[:, 1], gt_route[:, 0], "g.-", label="route gt")
    ax.plot(pred_route[:, 1], pred_route[:, 0], "b.-", label="route pred")
    ax.plot(gt_wps[:, 1], gt_wps[:, 0], "gx", label="wps gt")
    ax.plot(pred_wps[:, 1], pred_wps[:, 0], "rx", label="wps pred")
    ax.scatter([0], [0], c="k", marker="s", label="ego")
    ax.legend(loc="upper right", fontsize=8)
    ax.set_aspect("equal")
    ax.set_title(text[:80])
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    fig.savefig(out_path, dpi=100, bbox_inches="tight")
    plt.close(fig)
    return out_path


class VisualiseCallback:
    """Hook for the trainer: call .maybe_plot(step, batch, preds)."""

    def __init__(self, every_n_steps: int, out_dir: str):
        self.every = every_n_steps
        self.out_dir = out_dir

    def maybe_plot(self, step: int, example, preds: Dict[str, Any]) -> Optional[str]:
        if self.every <= 0:
            return None
        route = np.asarray(preds["route"][0])
        wps = np.asarray(preds["speed_wps"][0])
        gt_route = np.asarray(example.driving_label.path[0])
        gt_wps = np.asarray(example.driving_label.waypoints[0])
        return plot_predictions(
            None, route, gt_route, wps, gt_wps,
            text=f"step {step}",
            out_path=os.path.join(self.out_dir, f"viz_{step:08d}.png"))
