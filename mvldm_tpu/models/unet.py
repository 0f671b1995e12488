"""Multi-view UNet: SD2.1 ``UNet2DConditionModel`` topology with cross-view
attention injected at block boundaries.

Re-creates, in one integrated Flax module, what the reference assembles from
diffusers + wrappers (``src/model/denoiser/mvunet.py``):

* SD2.1 UNet: 4 down/up stages, block channels (320, 640, 1280, 1280), two
  ResNets per down stage (three per up stage), spatial transformers with
  1024-d text cross-attention in stages 0-2, sinusoidal time embedding with a
  2-layer MLP. ``conv_in`` takes the 11-channel multi-view input (4 latent +
  1 mask + 6 ray channels, reference ``diffusion_wrapper.py:98-127``),
  ``conv_out`` produces 4 latent channels (``mvunet.py:66-72``).
* The reference's *unrolled* traversal (``mvunet.py:119-201``): skip
  connections are captured per-resnet BEFORE cross-view attention runs; a
  ``SpatialTransformer3D`` is applied after each down/mid/up stage whose
  feature map is <= 32x32; text cross-attention is fed zeros
  ``(b*v, 1, 1024)``.
* Live-path quirk, preserved for checkpoint parity: when the reference runs
  from a pretrained SD2.1 UNet, the guard at ``mvunet.py:178`` skips the SD
  spatial transformers inside UP blocks entirely (``pretrained_from is None``
  is False), so up stages run resnets only. ``cfg.up_block_attention``
  encodes this; the default (False) matches the live checkpoint.
* Per-view timesteps: a 2-D (batch, view) timestep tensor embeds each view
  independently (context views get t=0; ``mvunet.py:101-105``).

TPU-first: NHWC layout, fused Pallas attention, optional per-view key mask
threaded into every cross-view block for exact single-launch batched CFG.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Literal, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import Array

from .layers import (
    Downsample,
    GroupNorm,
    ResnetBlock,
    Transformer2D,
    Upsample,
    timestep_embedding,
)
from .mv_attention import SpatialTransformer3D, SpatialTransformer3DCfg
from .standard_transformer import CrossAttentionCfg, StandardTransformer


@dataclass
class UNetBackboneCfg:
    """SD2.1 UNet topology (the reference's ``UNet2DModelCfg`` plus the fields
    diffusers hard-codes for SD2.1)."""

    down_block_types: Tuple[str, ...] = (
        "CrossAttnDownBlock2D",
        "CrossAttnDownBlock2D",
        "CrossAttnDownBlock2D",
        "DownBlock2D",
    )
    mid_block_type: str = "UNetMidBlock2DCrossAttn"
    up_block_types: Tuple[str, ...] = (
        "UpBlock2D",
        "CrossAttnUpBlock2D",
        "CrossAttnUpBlock2D",
        "CrossAttnUpBlock2D",
    )
    only_cross_attention: bool = False
    block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    cross_attention_dim: int = 1024
    # SD2.1: heads per stage; head dim is channels/heads = 64 everywhere.
    num_attention_heads: Tuple[int, ...] = (5, 10, 20, 20)
    norm_eps: float = 1e-5
    norm_num_groups: int = 32


@dataclass
class MultiViewUNetCfg:
    """Mirrors reference ``mvunet.py:31-40``."""

    name: Literal["mv_unet"] = "mv_unet"
    autoencoder: UNetBackboneCfg = field(default_factory=UNetBackboneCfg)
    multi_view_attention: SpatialTransformer3DCfg | CrossAttentionCfg = field(
        default_factory=SpatialTransformer3DCfg
    )
    use_ray_encoding: bool = True
    encoder_conditioning: bool = True
    mid_conditioning: bool = True
    decoder_conditioning: bool = True
    pretrained_from: Optional[str] = None
    # Live-path behavior (see module docstring). True only for from-scratch
    # configs, where the reference's guard would run up-block attentions.
    up_block_attention: bool = False
    # Feature-map size at or below which cross-view attention runs
    # (reference ``mvunet.py:137,190``).
    cross_view_max_size: int = 32


class MultiViewUNet(nn.Module):
    """The denoiser. Input (b, v, h, w, c_in); per-view timesteps (b, v)."""

    cfg: MultiViewUNetCfg
    in_channels: int = 11
    out_channels: int = 4
    dtype: jnp.dtype = jnp.float32
    # Block-level rematerialization for training: each ResNet/transformer
    # block's activations are recomputed in the backward pass instead of
    # stored, bounding peak activation memory to ~one block (full-graph
    # jax.checkpoint does NOT reduce peak - the recomputed forward must hold
    # the same intermediates). Parameter structure is unchanged.
    remat: bool = False
    # Optional jax.checkpoint policy for the block remat: "dots" saves
    # matmul/conv outputs and recomputes only the cheap elementwise work
    # (less recompute FLOPs, more activation memory than full remat).
    remat_policy: Optional[str] = None

    @nn.compact
    def __call__(
        self,
        latents: Array,
        timestep: Array,
        view_mask: Optional[Array] = None,
        cond_state: Optional[Array] = None,
    ) -> Array:
        """
        latents: (b, v, h, w, in_channels) multi-view UNet input.
        timestep: (b,) or (b, v) integer timesteps.
        view_mask: optional (b, v) bool; False marks padded views that must not
            contribute keys to cross-view attention (batched CFG / bucketing).
        cond_state: optional (b*v, seq, 1024) text-conditioning states; the
            live model feeds zeros (reference ``mvunet.py:128,157,184``).
        """
        cfg = self.cfg.autoencoder
        b, v, h0, w0, _ = latents.shape
        bv = b * v

        # 1. Timesteps: (b,) -> broadcast to views; (b, v) -> flatten.
        if timestep.ndim < 2:
            timestep = jnp.broadcast_to(timestep[:, None], (b, v))
        t_flat = timestep.reshape(bv)
        t_emb = timestep_embedding(t_flat, cfg.block_out_channels[0])
        temb = nn.Dense(
            cfg.block_out_channels[0] * 4, dtype=self.dtype, name="time_emb_1"
        )(t_emb.astype(self.dtype))
        temb = nn.Dense(
            cfg.block_out_channels[0] * 4, dtype=self.dtype, name="time_emb_2"
        )(nn.silu(temb))

        # cond_state stays None on the live path: the SD cross-attention
        # layers receive all-zero text conditioning (reference
        # ``mvunet.py:128,157,184``), for which the attention collapses to
        # an exact constant — ``layers.CrossAttention`` computes that
        # shortcut instead of a full attention over a zero token.

        hidden = latents.reshape(bv, h0, w0, -1)
        hidden = nn.Conv(
            cfg.block_out_channels[0], (3, 3), padding=1, dtype=self.dtype,
            name="conv_in",
        )(hidden)

        if self.remat:
            kw = {}
            if self.remat_policy == "dots":
                kw["policy"] = (
                    jax.checkpoint_policies.dots_with_no_batch_dims_saveable
                )
            elif self.remat_policy is not None:
                raise ValueError(
                    f"Unknown remat_policy {self.remat_policy!r}"
                )
            Resnet = nn.remat(ResnetBlock, **kw)
            SDAttn = nn.remat(Transformer2D, **kw)
            CrossView3D = nn.remat(SpatialTransformer3D, **kw)
            CrossViewStd = nn.remat(StandardTransformer, **kw)
        else:
            Resnet, SDAttn = ResnetBlock, Transformer2D
            CrossView3D, CrossViewStd = SpatialTransformer3D, StandardTransformer

        def cross_view(name: str, x: Array) -> Array:
            # Attention-block factory (reference denoiser/attention.py:8-27).
            mv_cfg = self.cfg.multi_view_attention
            if mv_cfg.name == "standard":
                return CrossViewStd(
                    mv_cfg, dtype=self.dtype, name=name
                )(x, view_mask=view_mask)
            return CrossView3D(
                mv_cfg,
                groups=cfg.norm_num_groups,
                dtype=self.dtype,
                name=name,
            )(x, view_mask=view_mask)

        def maybe_cross_view(enabled: bool, name: str, x: Array) -> Array:
            *_, hh, ww, _c = x.shape
            if not (hh <= self.cfg.cross_view_max_size and
                    ww <= self.cfg.cross_view_max_size):
                return x
            y = x.reshape(b, v, *x.shape[1:])
            if enabled:
                y = cross_view(name, y)
            return y.reshape(bv, *x.shape[1:])

        # 2a. Down blocks. Skips are captured per-resnet BEFORE cross-view
        # attention (reference ``mvunet.py:117-148``).
        skips = [hidden]
        for i, block_type in enumerate(cfg.down_block_types):
            out_ch = cfg.block_out_channels[i]
            has_attn = block_type == "CrossAttnDownBlock2D"
            for j in range(cfg.layers_per_block):
                hidden = Resnet(
                    out_ch, groups=cfg.norm_num_groups, eps=cfg.norm_eps,
                    dtype=self.dtype, name=f"down_{i}_res_{j}",
                )(hidden, temb)
                if has_attn:
                    hidden = SDAttn(
                        cfg.num_attention_heads[i],
                        out_ch // cfg.num_attention_heads[i],
                        cfg.cross_attention_dim,
                        groups=cfg.norm_num_groups,
                        dtype=self.dtype,
                        name=f"down_{i}_attn_{j}",
                    )(hidden, cond_state)
                skips.append(hidden)
            hidden = maybe_cross_view(
                self.cfg.encoder_conditioning, f"down_{i}_cross_view", hidden
            )
            if i < len(cfg.down_block_types) - 1:
                hidden = Downsample(
                    out_ch, dtype=self.dtype, name=f"down_{i}_downsample"
                )(hidden)
                skips.append(hidden)

        # 2b. Mid block.
        mid_ch = cfg.block_out_channels[-1]
        hidden = Resnet(
            mid_ch, groups=cfg.norm_num_groups, eps=cfg.norm_eps,
            dtype=self.dtype, name="mid_res_0",
        )(hidden, temb)
        hidden = SDAttn(
            cfg.num_attention_heads[-1],
            mid_ch // cfg.num_attention_heads[-1],
            cfg.cross_attention_dim,
            groups=cfg.norm_num_groups,
            dtype=self.dtype,
            name="mid_attn",
        )(hidden, cond_state)
        hidden = Resnet(
            mid_ch, groups=cfg.norm_num_groups, eps=cfg.norm_eps,
            dtype=self.dtype, name="mid_res_1",
        )(hidden, temb)
        hidden = maybe_cross_view(
            self.cfg.mid_conditioning, "mid_cross_view", hidden
        )

        # 2c. Up blocks (layers_per_block + 1 resnets each, consuming skips).
        reversed_channels = list(reversed(cfg.block_out_channels))
        for i, block_type in enumerate(cfg.up_block_types):
            out_ch = reversed_channels[i]
            has_attn = (
                block_type == "CrossAttnUpBlock2D" and self.cfg.up_block_attention
            )
            for j in range(cfg.layers_per_block + 1):
                skip = skips.pop()
                hidden = jnp.concatenate([hidden, skip], axis=-1)
                hidden = Resnet(
                    out_ch, groups=cfg.norm_num_groups, eps=cfg.norm_eps,
                    dtype=self.dtype, name=f"up_{i}_res_{j}",
                )(hidden, temb)
                if has_attn:
                    hidden = SDAttn(
                        list(reversed(cfg.num_attention_heads))[i],
                        out_ch // list(reversed(cfg.num_attention_heads))[i],
                        cfg.cross_attention_dim,
                        groups=cfg.norm_num_groups,
                        dtype=self.dtype,
                        name=f"up_{i}_attn_{j}",
                    )(hidden, cond_state)
            hidden = maybe_cross_view(
                self.cfg.decoder_conditioning, f"up_{i}_cross_view", hidden
            )
            if i < len(cfg.up_block_types) - 1:
                hidden = Upsample(
                    out_ch, dtype=self.dtype, name=f"up_{i}_upsample"
                )(hidden)

        # 3. Output head.
        hidden = GroupNorm(
            cfg.norm_num_groups, cfg.norm_eps, act="silu", name="conv_norm_out"
        )(hidden)
        hidden = nn.Conv(
            self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv_out"
        )(hidden)
        return hidden.reshape(b, v, h0, w0, self.out_channels)
