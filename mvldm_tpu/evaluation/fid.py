"""FID / KID computation.

Re-creates the reference's FID surface (torchmetrics FID at
``metric_computer.py:22,65-68`` and cleanfid directory-vs-directory at
``scripts/compute_fid.py:43-50``) as feature-space statistics in numpy:

* :func:`frechet_distance` — exact Frechet distance between Gaussian fits.
* :func:`kernel_distance` — polynomial-kernel MMD (KID).
* :class:`FeatureExtractor` protocol — any callable mapping image batches to
  feature vectors. InceptionV3 weights cannot be downloaded in this
  environment, so the default extractor is the LPIPS VGG16 trunk when its
  converted weights exist (a standard FID-style substitute); scores are
  comparable within a run, not against published Inception-FID numbers.
"""

from __future__ import annotations

from pathlib import Path
from typing import Callable, Optional

import numpy as np
import scipy.linalg


def gaussian_stats(features: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    mu = features.mean(axis=0)
    sigma = np.cov(features, rowvar=False)
    return mu, sigma


def frechet_distance(
    feats_a: np.ndarray, feats_b: np.ndarray, eps: float = 1e-6
) -> float:
    """Frechet distance between Gaussian fits (cleanfid semantics).

    Small-sample / low-rank feature sets make ``sigma1 @ sigma2`` singular;
    following cleanfid (``cleanfid/fid.py``, referenced by the reference's
    ``src/scripts/compute_fid.py:43-50``), the product is regularized with
    ``eps * I`` before the matrix square root whenever the plain sqrtm is
    non-finite or warns about singularity. A materially complex result (an
    actually-invalid covariance pair, not round-off) raises instead of being
    silently truncated to its real part."""
    import warnings

    mu1, sigma1 = gaussian_stats(feats_a)
    mu2, sigma2 = gaussian_stats(feats_b)
    diff = mu1 - mu2
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        covmean, _ = scipy.linalg.sqrtm(sigma1 @ sigma2, disp=False)
    singular = any(
        issubclass(w.category, scipy.linalg.LinAlgWarning) for w in caught
    )
    if singular or not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        with warnings.catch_warnings():
            # The regularized product can still be near-singular; its
            # LinAlgWarning (and scipy's disp deprecation) must not leak.
            warnings.simplefilter("ignore")
            covmean, _ = scipy.linalg.sqrtm(
                (sigma1 + offset) @ (sigma2 + offset), disp=False
            )
    if np.iscomplexobj(covmean):
        if not np.allclose(np.diagonal(covmean).imag, 0, atol=1e-3):
            raise ValueError(
                "frechet_distance: sqrtm produced a materially complex "
                f"result (max |imag| = {np.abs(covmean.imag).max():.3e}); "
                "the feature covariances are invalid"
            )
        covmean = covmean.real
    return float(diff @ diff + np.trace(sigma1) + np.trace(sigma2) - 2 * np.trace(covmean))


def kernel_distance(
    feats_a: np.ndarray,
    feats_b: np.ndarray,
    degree: int = 3,
    gamma: Optional[float] = None,
    coef0: float = 1.0,
) -> float:
    """KID: polynomial-kernel MMD^2 (cleanfid semantics)."""
    d = feats_a.shape[1]
    gamma = gamma if gamma is not None else 1.0 / d

    def k(x, y):
        return (gamma * x @ y.T + coef0) ** degree

    m, n = len(feats_a), len(feats_b)
    kxx = k(feats_a, feats_a)
    kyy = k(feats_b, feats_b)
    kxy = k(feats_a, feats_b)
    mmd = (
        (kxx.sum() - np.trace(kxx)) / (m * (m - 1))
        + (kyy.sum() - np.trace(kyy)) / (n * (n - 1))
        - 2 * kxy.mean()
    )
    return float(mmd)


def vgg_feature_extractor(
    lpips_weights: Optional[Path] = None,
) -> Optional[Callable[[np.ndarray], np.ndarray]]:
    """Pooled VGG16 conv5 features (needs assets/lpips_vgg.npz)."""
    from .metrics import get_lpips

    lp = get_lpips(lpips_weights)
    if lp is None:
        return None

    import jax.numpy as jnp

    def extract(images: np.ndarray) -> np.ndarray:
        x = (jnp.asarray(images) - lp.MEAN) / lp.STD
        feats = lp.vgg(x.astype(jnp.float32))
        pooled = jnp.mean(feats[-1], axis=(1, 2))
        return np.asarray(pooled)

    return extract


def vae_feature_extractor(
    vae_params,
    vae_kwargs=None,
    pool_to: int = 8,
    batch_size: int = 16,
) -> Callable[[np.ndarray], np.ndarray]:
    """Feature extractor over the SD-VAE *encoder*: latent means pooled to a
    (pool_to x pool_to x 4) grid and flattened (256-d by default).

    The in-repo fallback when no VGG/Inception weights can exist in the
    environment (reference counterpart: cleanfid's Inception at
    ``scripts/compute_fid.py:43-50``): the converted SD2.1 VAE encoder is a
    strong learned feature map that ships WITH the model checkpoint, so the
    eval sweep can always emit a learned-feature Frechet/kernel distance.
    Scores are comparable within a run / across runs of this framework —
    loudly keyed ``fid_vaefeat_*`` — never against published Inception-FID
    numbers."""
    import jax
    import jax.numpy as jnp

    from ..models.vae import AutoencoderKL, AutoencoderKLCfg

    vae = AutoencoderKL(vae_kwargs or AutoencoderKLCfg())

    @jax.jit
    def encode(images):
        # images in [0, 1] -> VAE domain [-1, 1]; features = latent MEANS
        # (the deterministic branch of the posterior).
        dist = vae.apply(
            {"params": vae_params}, images * 2.0 - 1.0,
            method=AutoencoderKL.encode,
        )
        mean = dist.mean
        b, h, w, c = mean.shape
        assert h % pool_to == 0 and w % pool_to == 0, (
            f"latent {h}x{w} not divisible by pool_to={pool_to}"
        )
        pooled = mean.reshape(
            b, pool_to, h // pool_to, pool_to, w // pool_to, c
        ).mean(axis=(2, 4))
        return pooled.reshape(b, pool_to * pool_to * c)

    def extract(images: np.ndarray) -> np.ndarray:
        feats = []
        for i in range(0, len(images), batch_size):
            feats.append(np.asarray(encode(jnp.asarray(
                images[i : i + batch_size], jnp.float32
            ))))
        return np.concatenate(feats)

    return extract


def resolve_vae_params(
    vae_checkpoint: Optional[Path] = None,
    allow_init_vae: bool = False,
):
    """Resolve SD-VAE encoder params for the learned-feature fallbacks
    (``fid_vaefeat_*`` / ``lpips_vaefeat*``) -> ``(params, key_suffix)`` or
    ``(None, None)``.

    Resolution order matches ``scripts/compute_fid.py``'s module docstring:
    a converted torch checkpoint (ships with the model -> ``"vaefeat"``),
    else — only on explicit opt-in — a seed-0 random-init VAE (a fixed
    random projection, smoke tests / relative comparisons only ->
    ``"vaefeat_randominit"``)."""
    if vae_checkpoint is not None:
        from ..training.checkpoint import load_torch_checkpoint_params

        params = load_torch_checkpoint_params(Path(vae_checkpoint))
        print(f"VAE features: SD-VAE encoder from {vae_checkpoint} "
              "(…_vaefeat*; not comparable to published LPIPS/FID)")
        return params["vae"], "vaefeat"
    if allow_init_vae:
        import jax
        import jax.numpy as jnp

        from ..models.vae import AutoencoderKL, AutoencoderKLCfg

        vae = AutoencoderKL(AutoencoderKLCfg())
        rng = jax.random.PRNGKey(0)
        params = vae.init(rng, jnp.zeros((1, 64, 64, 3)), rng)["params"]
        print("VAE features: RANDOM-INIT VAE encoder (allow_init_vae) — "
              "a fixed random projection, relative comparisons only")
        return params, "vaefeat_randominit"
    return None, None


def fid_between_dirs(
    dir_a: Path,
    dir_b: Path,
    extractor: Optional[Callable] = None,
    batch_size: int = 32,
) -> dict:
    """Directory-vs-directory FID/KID (reference ``compute_fid.py:43-50``)."""
    from ..utils.image_io import load_image

    extractor = extractor or vgg_feature_extractor()
    if extractor is None:
        raise RuntimeError(
            "No feature extractor available: convert LPIPS/VGG weights first "
            "(utils/lpips_convert.py)."
        )

    def features_of(directory: Path) -> np.ndarray:
        paths = sorted(Path(directory).rglob("*.png"))
        feats = []
        for i in range(0, len(paths), batch_size):
            batch = np.stack([load_image(p) for p in paths[i : i + batch_size]])
            feats.append(extractor(batch))
        return np.concatenate(feats)

    fa = features_of(dir_a)
    fb = features_of(dir_b)
    return {
        "fid": frechet_distance(fa, fb),
        "kid": kernel_distance(fa, fb),
        "num_a": len(fa),
        "num_b": len(fb),
    }
