"""Flax AutoencoderKL (Stable Diffusion 2.1 VAE, f8, 4 latent channels).

TPU-native replacement for the diffusers ``AutoencoderKL`` the reference loads
at ``src/model/autoencoder/__init__.py:39-43`` and calls through
``first_stage_encode`` / ``last_stage_decode``
(``src/model/diffusion_wrapper.py:278-298``). Weight-convertible from the
SD2.1 / mvldm-1.0 torch checkpoints (see ``utils/weight_convert.py``).

Layout is NHWC throughout. The scaling factor (0.18215) is applied by the
diffusion engine, not here, mirroring the reference call sites.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import Array

from .layers import AttnBlockVAE, Downsample, GroupNorm, ResnetBlock, Upsample


@dataclass
class AutoencoderKLCfg:
    """Mirrors the reference cfg dataclass (``autoencoder/autoencoder_kl.py``);
    defaults here are the SD2.1 VAE (the only live configuration)."""

    in_channels: int = 3
    out_channels: int = 3
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    latent_channels: int = 4
    norm_num_groups: int = 32
    scaling_factor: float = 0.18215
    use_quant_conv: bool = True
    use_post_quant_conv: bool = True
    mid_block_add_attention: bool = True


@dataclass
class AutoencoderCfg:
    """Registry-level cfg (reference ``autoencoder/__init__.py:11-15``)."""

    name: str = "kl"
    pretrained_from: Optional[str] = None
    kwargs: AutoencoderKLCfg = field(default_factory=AutoencoderKLCfg)


class DiagonalGaussian:
    """Mean/logvar latent distribution (diffusers semantics: logvar clamped to
    [-30, 20]; also re-creates the reference's standalone
    ``src/model/diagonal_gaussian_distribution.py``)."""

    def __init__(self, moments: Array):
        mean, logvar = jnp.split(moments, 2, axis=-1)
        self.mean = mean
        self.logvar = jnp.clip(logvar, -30.0, 20.0)
        self.std = jnp.exp(0.5 * self.logvar)
        self.var = jnp.exp(self.logvar)

    def sample(self, rng: Array) -> Array:
        return self.mean + self.std * jax.random.normal(
            rng, self.mean.shape, dtype=self.mean.dtype
        )

    def mode(self) -> Array:
        return self.mean

    def kl(self) -> Array:
        return 0.5 * jnp.sum(
            self.mean**2 + self.var - 1.0 - self.logvar,
            axis=tuple(range(1, self.mean.ndim)),
        )


class Encoder(nn.Module):
    cfg: AutoencoderKLCfg
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        cfg = self.cfg
        h = nn.Conv(
            cfg.block_out_channels[0], (3, 3), padding=1, dtype=self.dtype,
            name="conv_in",
        )(x)

        for i, out_ch in enumerate(cfg.block_out_channels):
            for j in range(cfg.layers_per_block):
                h = ResnetBlock(
                    out_ch,
                    use_time_emb=False,
                    groups=cfg.norm_num_groups,
                    eps=1e-6,
                    dtype=self.dtype,
                    name=f"down_{i}_res_{j}",
                )(h)
            if i < len(cfg.block_out_channels) - 1:
                h = Downsample(
                    out_ch,
                    dtype=self.dtype,
                    asymmetric_padding=True,
                    name=f"down_{i}_downsample",
                )(h)

        h = ResnetBlock(
            h.shape[-1], use_time_emb=False, groups=cfg.norm_num_groups,
            eps=1e-6, dtype=self.dtype, name="mid_res_0",
        )(h)
        if cfg.mid_block_add_attention:
            h = AttnBlockVAE(
                groups=cfg.norm_num_groups, dtype=self.dtype, name="mid_attn"
            )(h)
        h = ResnetBlock(
            h.shape[-1], use_time_emb=False, groups=cfg.norm_num_groups,
            eps=1e-6, dtype=self.dtype, name="mid_res_1",
        )(h)

        h = GroupNorm(
            cfg.norm_num_groups, 1e-6, act="silu", name="conv_norm_out"
        )(h)
        return nn.Conv(
            2 * cfg.latent_channels, (3, 3), padding=1, dtype=self.dtype,
            name="conv_out",
        )(h)


class Decoder(nn.Module):
    cfg: AutoencoderKLCfg
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z: Array) -> Array:
        cfg = self.cfg
        reversed_channels = list(reversed(cfg.block_out_channels))
        h = nn.Conv(
            reversed_channels[0], (3, 3), padding=1, dtype=self.dtype,
            name="conv_in",
        )(z)

        h = ResnetBlock(
            h.shape[-1], use_time_emb=False, groups=cfg.norm_num_groups,
            eps=1e-6, dtype=self.dtype, name="mid_res_0",
        )(h)
        if cfg.mid_block_add_attention:
            h = AttnBlockVAE(
                groups=cfg.norm_num_groups, dtype=self.dtype, name="mid_attn"
            )(h)
        h = ResnetBlock(
            h.shape[-1], use_time_emb=False, groups=cfg.norm_num_groups,
            eps=1e-6, dtype=self.dtype, name="mid_res_1",
        )(h)

        for i, out_ch in enumerate(reversed_channels):
            for j in range(cfg.layers_per_block + 1):
                h = ResnetBlock(
                    out_ch,
                    use_time_emb=False,
                    groups=cfg.norm_num_groups,
                    eps=1e-6,
                    dtype=self.dtype,
                    name=f"up_{i}_res_{j}",
                )(h)
            if i < len(reversed_channels) - 1:
                h = Upsample(out_ch, dtype=self.dtype, name=f"up_{i}_upsample")(h)

        h = GroupNorm(
            cfg.norm_num_groups, 1e-6, act="silu", name="conv_norm_out"
        )(h)
        return nn.Conv(
            cfg.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv_out"
        )(h)


class AutoencoderKL(nn.Module):
    """Encoder + decoder with quant convs. Methods mirror the diffusers call
    surface used by the reference (``encode().latent_dist.sample()``,
    ``decode().sample``) as plain functions returning the distribution /
    image."""

    cfg: AutoencoderKLCfg = field(default_factory=AutoencoderKLCfg)
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = Encoder(self.cfg, dtype=self.dtype)
        self.decoder = Decoder(self.cfg, dtype=self.dtype)
        if self.cfg.use_quant_conv:
            self.quant_conv = nn.Conv(
                2 * self.cfg.latent_channels, (1, 1), dtype=self.dtype
            )
        if self.cfg.use_post_quant_conv:
            self.post_quant_conv = nn.Conv(
                self.cfg.latent_channels, (1, 1), dtype=self.dtype
            )

    def encode(self, x: Array) -> DiagonalGaussian:
        """x: (b, h, w, 3) in [-1, 1] -> DiagonalGaussian over (b, h/8, w/8, 4)."""
        moments = self.encoder(x)
        if self.cfg.use_quant_conv:
            moments = self.quant_conv(moments)
        return DiagonalGaussian(moments)

    def decode(self, z: Array) -> Array:
        """z: (b, h/8, w/8, 4) -> (b, h, w, 3) in [-1, 1]."""
        if self.cfg.use_post_quant_conv:
            z = self.post_quant_conv(z)
        return self.decoder(z)

    def __call__(self, x: Array, rng: Array) -> Array:
        dist = self.encode(x)
        return self.decode(dist.sample(rng))
