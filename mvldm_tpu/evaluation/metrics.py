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


def _l2_pool_kernel(filter_size: int = 3) -> np.ndarray:
    """DISTS' L2-pooling window: a Hann window (anti-aliased downsampling,
    Zhang 2019 'Making Convolutional Networks Shift-Invariant Again')."""
    a = np.hanning(filter_size + 2)[1:-1]
    g = np.outer(a, a)
    return (g / g.sum()).astype(np.float32)


def _l2_pool(x: Array, filter_size: int = 3, stride: int = 2) -> Array:
    """sqrt(hann_conv(x^2)): the pooling DISTS substitutes for max-pool."""
    k = jnp.asarray(_l2_pool_kernel(filter_size))[:, :, None, None]
    c = x.shape[-1]
    k = jnp.tile(k, (1, 1, 1, c))
    pooled = jax.lax.conv_general_dilated(
        x * x,
        k,
        window_strides=(stride, stride),
        padding=[(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )
    return jnp.sqrt(jnp.maximum(pooled, 1e-12))


class DISTS:
    """Deep Image Structure and Texture Similarity (Ding et al. 2020),
    exactly as the reference computes it via the DISTS_pytorch package
    (reference ``metrics.py:28-40``): a VGG16 trunk with L2-pooling in
    place of max-pool, stages [input, conv1_2, conv2_2, conv3_3, conv4_3,
    conv5_3], per-channel texture (mean) and structure (covariance) terms
    combined with the learned alpha/beta weights.

    Requires ``dists_alpha``/``dists_beta`` in the converted weights file
    (utils/lpips_convert.py --dists) — without the learned weights the
    metric is not DISTS, so construction fails loudly instead of silently
    substituting uniform weights.
    """

    C1 = 1e-6
    C2 = 1e-6
    # Convs whose activations feed the metric, per VGG block.
    STAGE_CONVS = ["conv1_2", "conv2_2", "conv3_3", "conv4_3", "conv5_3"]
    CHNS = [3, 64, 128, 256, 512, 512]

    def __init__(self, weights_path: Optional[Path] = None):
        path = Path(weights_path or "assets/lpips_vgg.npz")
        if not path.exists():
            raise FileNotFoundError(
                f"VGG weights not found at {path}; run utils/lpips_convert.py "
                "on a connected machine."
            )
        data = np.load(path)
        if "dists_alpha" not in data or "dists_beta" not in data:
            raise FileNotFoundError(
                f"{path} lacks the learned DISTS alpha/beta weights; "
                "re-run utils/lpips_convert.py with --dists (needs the "
                "DISTS_pytorch package). Refusing to substitute uniform "
                "weights — that would not be DISTS."
            )
        self.weights = {}
        for block, (ch, n_convs) in enumerate(_VGG16Features.CONV_LAYERS):
            for c in range(n_convs):
                name = f"conv{block + 1}_{c + 1}"
                self.weights[name] = (
                    jnp.asarray(data[f"{name}_kernel"]),
                    jnp.asarray(data[f"{name}_bias"]),
                )
        # (sum(CHNS),) per-channel weights across stages.
        self.alpha = jnp.asarray(data["dists_alpha"], jnp.float32).reshape(-1)
        self.beta = jnp.asarray(data["dists_beta"], jnp.float32).reshape(-1)

    def _features(self, x: Array) -> list:
        """x: (b, h, w, 3) in [0, 1] -> [x, conv1_2, ..., conv5_3] with
        L2-pooling between blocks (DISTS forward_once)."""
        feats = [jnp.asarray(x, jnp.float32)]
        h = ((jnp.asarray(x, jnp.float32) - LPIPS.MEAN) / LPIPS.STD)
        for block, (ch, n_convs) in enumerate(_VGG16Features.CONV_LAYERS):
            if block > 0:
                h = _l2_pool(h)
            for c in range(n_convs):
                k, b = self.weights[f"conv{block + 1}_{c + 1}"]
                h = jax.lax.conv_general_dilated(
                    h, k, (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                ) + b
                h = jax.nn.relu(h)
            feats.append(h)
        return feats

    def __call__(self, x: Array, y: Array) -> Array:
        """x, y: (b, h, w, 3) in [0, 1] -> (b,) DISTS distances (lower is
        more similar)."""
        fx = self._features(x)
        fy = self._features(y)
        w_sum = self.alpha.sum() + self.beta.sum()
        alpha = jnp.split(
            self.alpha / w_sum, np.cumsum(self.CHNS)[:-1].tolist()
        )
        beta = jnp.split(
            self.beta / w_sum, np.cumsum(self.CHNS)[:-1].tolist()
        )

        dist1 = 0.0
        dist2 = 0.0
        for j, (a, b) in enumerate(zip(fx, fy)):
            mu_a = jnp.mean(a, axis=(1, 2))
            mu_b = jnp.mean(b, axis=(1, 2))
            texture = (2 * mu_a * mu_b + self.C1) / (
                mu_a**2 + mu_b**2 + self.C1
            )
            var_a = jnp.var(a, axis=(1, 2))
            var_b = jnp.var(b, axis=(1, 2))
            cov = jnp.mean(a * b, axis=(1, 2)) - mu_a * mu_b
            structure = (2 * cov + self.C2) / (var_a + var_b + self.C2)
            dist1 = dist1 + jnp.sum(alpha[j][None, :] * texture, axis=-1)
            dist2 = dist2 + jnp.sum(beta[j][None, :] * structure, axis=-1)
        return 1.0 - (dist1 + dist2)


def get_dists(weights_path: Optional[Path] = None) -> Optional[DISTS]:
    """Exact DISTS when converted weights (incl. learned alpha/beta) exist,
    else None with a loud one-time notice — never a silent skip."""
    try:
        return DISTS(weights_path)
    except FileNotFoundError as e:
        print(f"DISTS unavailable: {e}")
        return None


class VAEFeatureDistance:
    """Perceptual-distance fallback over the SD-VAE *encoder* features.

    The LPIPS formula (channel-unit-normalized feature difference, averaged
    over spatial positions) applied to the VAE encoder's posterior means
    instead of VGG activations — the in-repo fallback when no VGG/DISTS
    weights can exist in the environment (the weights ship WITH the model
    checkpoint, so this metric is always producible; reference counterpart:
    ``src/evaluation/metrics.py:44-54`` which hard-requires the ``lpips``
    package). Scores are comparable within/between runs of this framework
    and are loudly keyed ``lpips_vaefeat*`` — never against published LPIPS
    numbers.
    """

    def __init__(self, vae_params, vae_kwargs=None):
        from ..models.vae import AutoencoderKL, AutoencoderKLCfg

        vae = AutoencoderKL(vae_kwargs or AutoencoderKLCfg())

        @jax.jit
        def dist_fn(x: Array, y: Array) -> Array:
            def feats(img):
                d = vae.apply(
                    {"params": vae_params}, img * 2.0 - 1.0,
                    method=AutoencoderKL.encode,
                )
                f = d.mean
                return f / jnp.sqrt(
                    jnp.sum(f**2, axis=-1, keepdims=True) + 1e-10
                )

            fx = feats(x.astype(jnp.float32))
            fy = feats(y.astype(jnp.float32))
            return jnp.mean(jnp.sum((fx - fy) ** 2, axis=-1), axis=(1, 2))

        self._dist = dist_fn

    def __call__(self, x: Array, y: Array) -> Array:
        """x, y: (b, h, w, 3) in [0, 1] -> (b,) feature distances."""
        return self._dist(jnp.asarray(x), jnp.asarray(y))
