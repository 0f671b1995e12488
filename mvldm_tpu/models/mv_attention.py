"""Cross-view 3D attention blocks.

Re-creates the live cross-view attention path of the reference
(``SpatialTransformer3D`` / ``BasicTransformerBlock3D`` in
``src/model/denoiser/mvdream/attention.py:357-439``): GroupNorm -> 1x1-conv
proj_in -> [joint self-attention over all views' tokens, per-frame
self-attention, GEGLU FF] -> zero-initialized 1x1-conv proj_out -> residual.

TPU-first differences from the reference:
* tokens are NHWC and attention runs through the fused Pallas kernel
  (``ops/attention.py``) with fp32 softmax — the equivalent of the
  reference's fp32-forced QK matmul (``mvdream/attention.py:185-190``);
* an optional per-view key mask (``view_mask``) excludes padded views from
  the joint attention, enabling exact single-launch batched CFG
  (cond + uncond rows in one call) instead of the reference's two sequential
  UNet forwards (``diffusion_wrapper.py:435-441``).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Literal, Optional

import flax.linen as nn
import jax.numpy as jnp
from jax import Array

from ..ops.attention import NEG_INF, attention
from .layers import GroupNorm, ff_block, self_attn_block


@dataclass
class SpatialTransformer3DCfg:
    """Mirrors reference ``mvdream/attention.py:23-32``."""

    name: Literal["spatial_transformer_3d"] = "spatial_transformer_3d"
    num_heads: int = 8
    num_layers: int = 1
    d_dot: Optional[int] = None  # default d_in // num_heads
    d_mlp: Optional[int] = None
    d_mlp_multiplier: Optional[int] = None
    downscale: int = 1
    pos_enc: bool = False


class SelfAttention(nn.Module):
    """SD-convention self-attention (no-bias qkv, biased output)."""

    num_heads: int
    head_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, key_bias: Optional[Array] = None) -> Array:
        b, l, c = x.shape
        inner = self.num_heads * self.head_dim
        q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(x)
        k = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_k")(x)
        v = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_v")(x)
        q = q.reshape(b, l, self.num_heads, self.head_dim).transpose(0, 2, 1, 3)
        k = k.reshape(b, l, self.num_heads, self.head_dim).transpose(0, 2, 1, 3)
        v = v.reshape(b, l, self.num_heads, self.head_dim).transpose(0, 2, 1, 3)
        # Tensor parallelism (trainer.strategy=data_model): heads shard over
        # the mesh's model axis — see parallel/tp.py. No-op otherwise.
        from ..parallel.tp import (
            get_model_mesh,
            head_sharded_attention,
            use_head_sharding,
        )

        mesh = get_model_mesh()
        if use_head_sharding(q.shape, mesh):
            out = head_sharded_attention(mesh, q, k, v, bias=key_bias)
        else:
            out = attention(q, k, v, bias=key_bias)
        out = out.transpose(0, 2, 1, 3).reshape(b, l, inner)
        return nn.Dense(c, dtype=self.dtype, name="to_out")(out)


class BasicTransformerBlock3D(nn.Module):
    """attn1 = joint self-attention over (view * h * w) tokens;
    attn2 = per-frame self-attention; GEGLU FF. Reference
    ``mvdream/attention.py:357-368``."""

    num_heads: int
    head_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: Array, num_views: int, view_mask: Optional[Array] = None
    ) -> Array:
        bv, l, c = x.shape
        b = bv // num_views

        # attn1: joint over all views.
        joint = x.reshape(b, num_views * l, c)
        key_bias = None
        if view_mask is not None:
            # (b, v) -> additive (b, v*l) key bias masking padded views.
            key_bias = jnp.where(view_mask, 0.0, NEG_INF).astype(jnp.float32)
            key_bias = jnp.repeat(key_bias, l, axis=-1)
        h = nn.LayerNorm(dtype=jnp.float32, name="norm1")(joint)
        joint = joint + SelfAttention(
            self.num_heads, self.head_dim, dtype=self.dtype, name="attn1"
        )(h, key_bias=key_bias)
        x = joint.reshape(bv, l, c)

        # attn2: per-frame, through the fused LN+attention kernel.
        x = self_attn_block(
            x, c, self.num_heads, self.head_dim, self.dtype,
            norm_name="norm2", attn_name="attn2",
        )

        return ff_block(x, c, self.dtype)


class SpatialTransformer3D(nn.Module):
    """Cross-view attention over a (b, v, h, w, c) feature map."""

    cfg: SpatialTransformer3DCfg
    groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, view_mask: Optional[Array] = None) -> Array:
        b, v, h, w, c = x.shape
        num_heads = self.cfg.num_heads
        head_dim = self.cfg.d_dot or c // num_heads

        x_in = x.reshape(b * v, h, w, c)
        hidden = GroupNorm(self.groups, 1e-6, name="norm")(x_in)
        hidden = nn.Conv(c, (1, 1), dtype=self.dtype, name="proj_in")(hidden)
        hidden = hidden.reshape(b * v, h * w, c)

        for i in range(self.cfg.num_layers):
            hidden = BasicTransformerBlock3D(
                num_heads, head_dim, dtype=self.dtype, name=f"blocks_{i}"
            )(hidden, num_views=v, view_mask=view_mask)

        hidden = hidden.reshape(b * v, h, w, c)
        # Zero-initialized projection: the block is an identity at init, so a
        # freshly added cross-view path does not perturb pretrained features
        # (reference ``mvdream/attention.py:90-96,407-411``).
        hidden = nn.Conv(
            c,
            (1, 1),
            kernel_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="proj_out",
        )(hidden)
        return (hidden + x_in).reshape(b, v, h, w, c)
