"""Model/engine construction from a typed RootCfg.

The registry layer (reference ``get_denoiser``/``get_autoencoder``/
``get_scheduler`` + the channel math in ``DiffusionWrapper.__init__``,
``diffusion_wrapper.py:98-131``) in one place."""

from __future__ import annotations

from pathlib import Path
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .config import RootCfg
from .diffusion.engine import DiffusionEngine, ModelCfg, unet_in_channels
from .diffusion.schedulers import get_scheduler
from .models.unet import MultiViewUNet
from .models.vae import AutoencoderKL


def resolve_dtype(precision: Optional[str]) -> jnp.dtype:
    """Map the reference's Lightning precision tokens onto JAX dtypes.
    16-mixed (GPU fp16 autocast) maps to bf16 — the TPU-native mixed
    precision."""
    if precision in (None, "32", "32-true", 32):
        return jnp.float32
    if precision in ("bf16", "bf16-mixed", "bf16-true", "16-mixed", "16", "16-true", 16):
        return jnp.bfloat16
    if precision in ("64", "64-true", 64):
        return jnp.float64
    raise ValueError(f"Unknown precision: {precision}")


def build_engine(cfg: RootCfg, dtype: Optional[jnp.dtype] = None) -> DiffusionEngine:
    model_cfg: ModelCfg = cfg.model
    if dtype is None:
        dtype = resolve_dtype(cfg.trainer.precision)
    in_ch = unet_in_channels(model_cfg)
    latent_ch = model_cfg.autoencoder.kwargs.latent_channels
    unet = MultiViewUNet(
        model_cfg.denoiser,
        in_channels=in_ch,
        out_channels=latent_ch,
        dtype=dtype,
        remat=cfg.trainer.remat,
        remat_policy=cfg.trainer.remat_policy,
    )
    vae = AutoencoderKL(model_cfg.autoencoder.kwargs, dtype=dtype)
    scheduler = get_scheduler(model_cfg.scheduler)
    return DiffusionEngine(model_cfg, unet, vae, scheduler, dtype=dtype)


def init_params(
    engine: DiffusionEngine, cfg: RootCfg, rng: jax.Array
) -> Tuple[dict, dict]:
    """Random-initialize UNet + VAE parameter trees at the configured shapes."""
    h, w = cfg.dataset.image_shape
    hl, wl = h // 8, w // 8
    in_ch = unet_in_channels(cfg.model)
    k1, k2, k3 = jax.random.split(rng, 3)
    x = jnp.zeros((1, 2, hl, wl, in_ch))
    t = jnp.zeros((1, 2), dtype=jnp.int32)
    unet_params = jax.jit(engine.unet.init)(k1, x, t)["params"]
    img = jnp.zeros((1, h, w, 3))
    vae_params = jax.jit(engine.vae.init)(k2, img, k3)["params"]
    return unet_params, vae_params


def load_pretrained(
    cfg: RootCfg, engine: DiffusionEngine, rng: jax.Array
) -> Tuple[dict, dict]:
    """Initialize, then overlay converted torch weights when
    ``checkpointing.load`` points at a ``.ckpt`` file (reference warm-start
    path, ``src/main.py:109-113``)."""
    unet_params, vae_params = init_params(engine, cfg, rng)
    load = cfg.checkpointing.load
    if load and str(load).endswith(".ckpt"):
        from .training.checkpoint import load_torch_checkpoint_params

        converted = load_torch_checkpoint_params(Path(load))
        unet_params = _overlay(unet_params, converted["unet"])
        vae_params = _overlay(vae_params, converted["vae"])
        print(f"Loaded converted torch checkpoint from {load}")
    return unet_params, vae_params


def _overlay(base: dict, update: dict) -> dict:
    """Replace matching subtrees of ``base`` with converted arrays."""
    out = dict(base)
    for k, v in update.items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = _overlay(out[k], v)
        else:
            out[k] = jnp.asarray(v)
    return out
