"""Scalar -> color mapping (reference ``src/visualization/color_map.py``)
via matplotlib colormaps, plus the histogram figure used in validation
(reference ``src/misc/image_io.py:get_hist_image``)."""

from __future__ import annotations

import numpy as np


def apply_color_map(values: np.ndarray, cmap: str = "inferno") -> np.ndarray:
    """(…,) scalars in [0, 1] -> (…, 3) RGB."""
    import matplotlib

    cm = matplotlib.colormaps[cmap]
    return np.asarray(cm(np.clip(values, 0.0, 1.0)))[..., :3].astype(np.float32)


def apply_depth_color_map(depth: np.ndarray, cmap: str = "turbo") -> np.ndarray:
    """Normalize a depth map then color it (reference color_map usage)."""
    lo, hi = float(depth.min()), float(depth.max())
    norm = (depth - lo) / max(hi - lo, 1e-8)
    return apply_color_map(norm, cmap)


def get_hist_image(
    values: np.ndarray, bins: int = 100, title: str = "", size: int = 400
) -> np.ndarray:
    """Histogram of tensor values rendered to a float image (reference
    ``image_io.py:get_hist_image``; used by validation_step histograms)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(size / 100, size / 100), dpi=100)
    ax.hist(np.asarray(values).reshape(-1), bins=bins)
    ax.set_title(title)
    fig.tight_layout()
    fig.canvas.draw()
    buf = np.asarray(fig.canvas.buffer_rgba())[..., :3]
    plt.close(fig)
    return buf.astype(np.float32) / 255.0
