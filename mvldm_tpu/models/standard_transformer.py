"""StandardTransformer — the alternative cross-view attention block.

Re-creates the reference's non-default ``multi_view_attention: standard``
path (``src/model/denoiser/standard/transformer.py:45-136`` over the generic
ViT-style transformer in ``src/model/transformer/``): a PreNorm transformer
over all (view * h * w) tokens with optional conv down/up-scaling and DETR
sine position embeddings (``backbone/unimatch/position.py``). Registered
under ``name: standard`` in the attention factory, mirroring
``denoiser/attention.py:8-27``.

Note: unlike ``SpatialTransformer3D`` this block is NOT residual at the
module level and has no zero-init projection — faithful to the reference.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Literal, Optional

import flax.linen as nn
import jax.numpy as jnp
import numpy as np
from jax import Array

from ..ops.attention import attention


@dataclass
class CrossAttentionCfg:
    """Mirrors reference ``standard/transformer.py:14-22``."""

    name: Literal["standard"] = "standard"
    num_heads: int = 8
    num_layers: int = 1
    d_dot: Optional[int] = None
    d_mlp: Optional[int] = None
    d_mlp_multiplier: Optional[int] = 1
    downscale: int = 1
    pos_enc: bool = False


def position_embedding_sine(
    h: int, w: int, num_pos_feats: int, temperature: float = 10000.0
) -> np.ndarray:
    """DETR sine position embedding -> (h, w, 2*num_pos_feats), channels-last
    (reference ``unimatch/position.py:9-47``, normalized)."""
    scale = 2 * np.pi
    y_embed = np.cumsum(np.ones((h, w), dtype=np.float32), axis=0)
    x_embed = np.cumsum(np.ones((h, w), dtype=np.float32), axis=1)
    eps = 1e-6
    y_embed = y_embed / (y_embed[-1:, :] + eps) * scale
    x_embed = x_embed / (x_embed[:, -1:] + eps) * scale

    dim_t = np.arange(num_pos_feats, dtype=np.float32)
    dim_t = temperature ** (2 * (dim_t // 2) / num_pos_feats)
    pos_x = x_embed[:, :, None] / dim_t
    pos_y = y_embed[:, :, None] / dim_t
    pos_x = np.stack(
        (np.sin(pos_x[:, :, 0::2]), np.cos(pos_x[:, :, 1::2])), axis=3
    ).reshape(h, w, -1)
    pos_y = np.stack(
        (np.sin(pos_y[:, :, 0::2]), np.cos(pos_y[:, :, 1::2])), axis=3
    ).reshape(h, w, -1)
    return np.concatenate((pos_y, pos_x), axis=-1)


class ViTAttention(nn.Module):
    """Reference ``transformer/attention.py:31-100``: fused qkv projection
    (self-attention path), SDPA with fp32 softmax, output projection."""

    num_heads: int
    head_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, key_bias: Optional[Array] = None) -> Array:
        b, l, dim = x.shape
        inner = self.num_heads * self.head_dim
        qkv = nn.Dense(inner * 3, use_bias=False, dtype=self.dtype, name="to_qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, l, self.num_heads, self.head_dim).transpose(0, 2, 1, 3)
        k = k.reshape(b, l, self.num_heads, self.head_dim).transpose(0, 2, 1, 3)
        v = v.reshape(b, l, self.num_heads, self.head_dim).transpose(0, 2, 1, 3)
        out = attention(q, k, v, bias=key_bias)
        out = out.transpose(0, 2, 1, 3).reshape(b, l, inner)
        if self.num_heads == 1 and self.head_dim == dim:
            return out  # project_out is Identity in the reference
        return nn.Dense(dim, dtype=self.dtype, name="to_out")(out)


class ViTFeedForward(nn.Module):
    """Reference ``transformer/feed_forward.py``: Linear-GELU-Linear."""

    hidden_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        h = nn.Dense(self.hidden_dim, dtype=self.dtype, name="net_0")(x)
        h = nn.gelu(h, approximate=False)
        return nn.Dense(x.shape[-1], dtype=self.dtype, name="net_2")(h)


class ViTTransformer(nn.Module):
    """PreNorm transformer (reference ``transformer/transformer.py:33-72``)."""

    depth: int
    num_heads: int
    head_dim: int
    mlp_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, key_bias: Optional[Array] = None) -> Array:
        for i in range(self.depth):
            h = nn.LayerNorm(dtype=jnp.float32, name=f"norm_attn_{i}")(x)
            x = x + ViTAttention(
                self.num_heads, self.head_dim, dtype=self.dtype, name=f"attn_{i}"
            )(h, key_bias=key_bias)
            h = nn.LayerNorm(dtype=jnp.float32, name=f"norm_ff_{i}")(x)
            x = x + ViTFeedForward(
                self.mlp_dim, dtype=self.dtype, name=f"ff_{i}"
            )(h)
        return x


class StandardTransformer(nn.Module):
    """Cross-view attention over (b, v, h, w, c) via a joint ViT transformer.

    ``view_mask`` (b, v) excludes padded views from attention keys, same
    contract as ``SpatialTransformer3D``.
    """

    cfg: CrossAttentionCfg
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, view_mask: Optional[Array] = None) -> Array:
        cfg = self.cfg
        b, v, h, w, c = x.shape

        if cfg.pos_enc:
            pos = jnp.asarray(
                position_embedding_sine(h, w, c // 2), dtype=x.dtype
            )
            x = x + pos[None, None]

        if cfg.downscale > 1:
            x = x.reshape(b * v, h, w, c)
            x = nn.Conv(
                c,
                (cfg.downscale, cfg.downscale),
                strides=(cfg.downscale, cfg.downscale),
                padding="VALID",
                dtype=self.dtype,
                name="downscaler",
            )(x)
            hs, ws = h // cfg.downscale, w // cfg.downscale
            x = x.reshape(b, v, hs, ws, c)
        else:
            hs, ws = h, w

        tokens = x.reshape(b, v * hs * ws, c)
        key_bias = None
        if view_mask is not None:
            from ..ops.attention import NEG_INF

            key_bias = jnp.where(view_mask, 0.0, NEG_INF).astype(jnp.float32)
            key_bias = jnp.repeat(key_bias, hs * ws, axis=-1)
        tokens = ViTTransformer(
            cfg.num_layers,
            cfg.num_heads,
            cfg.d_dot or c // cfg.num_heads,
            cfg.d_mlp or c * (cfg.d_mlp_multiplier or 1),
            dtype=self.dtype,
            name="transformer",
        )(tokens, key_bias=key_bias)
        x = tokens.reshape(b, v, hs, ws, c)

        if cfg.downscale > 1:
            x = x.reshape(b * v, hs, ws, c)
            up = nn.ConvTranspose(
                c,
                (cfg.downscale, cfg.downscale),
                strides=(cfg.downscale, cfg.downscale),
                dtype=self.dtype,
                name="upscaler",
            )(x)
            ref = nn.Conv(c * 2, (7, 7), padding=3, dtype=self.dtype,
                          name="refine_0")(up)
            ref = nn.gelu(ref, approximate=False)
            ref = nn.Conv(c, (7, 7), padding=3, dtype=self.dtype,
                          name="refine_1")(ref)
            x = (ref + up).reshape(b, v, h, w, c)
        return x
