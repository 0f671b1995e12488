"""Shared Flax building blocks for the VAE and UNet.

These re-create, TPU-first (NHWC layout, bf16-friendly compute with fp32
normalization statistics), the diffusers building blocks the reference model
is assembled from (``UNet2DConditionModel`` / ``AutoencoderKL``, loaded at
reference ``src/model/denoiser/mvunet.py:54-72`` and
``src/model/autoencoder/__init__.py:35-43``):

* :class:`ResnetBlock` — GroupNorm/SiLU/3x3-conv residual block with optional
  time-embedding injection.
* :class:`Downsample` / :class:`Upsample` — stride-2 conv / nearest-2x + conv.
* :class:`TransformerBlock2D` — SD-style spatial transformer (self-attn,
  text-cross-attn, GEGLU FF) over (h*w) tokens.
* :class:`AttnBlockVAE` — the single-head spatial attention in the VAE mid
  block.
* :func:`timestep_embedding` — sinusoidal timestep features.

All modules run in NHWC; weight conversion from torch checkpoints transposes
OIHW -> HWIO (see ``utils/weight_convert.py``).
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import Array

from ..ops.attention import attention


def timestep_embedding(
    timesteps: Array,
    dim: int,
    flip_sin_to_cos: bool = True,
    downscale_freq_shift: float = 0.0,
    max_period: int = 10000,
) -> Array:
    """Sinusoidal timestep features (diffusers ``Timesteps`` semantics with the
    SD2.1 UNet settings: flip_sin_to_cos=True, downscale_freq_shift=0)."""
    half_dim = dim // 2
    exponent = -math.log(max_period) * jnp.arange(half_dim, dtype=jnp.float32)
    exponent = exponent / (half_dim - downscale_freq_shift)
    emb = jnp.exp(exponent)
    emb = timesteps.astype(jnp.float32)[:, None] * emb[None, :]
    sin, cos = jnp.sin(emb), jnp.cos(emb)
    if flip_sin_to_cos:
        return jnp.concatenate([cos, sin], axis=-1)
    return jnp.concatenate([sin, cos], axis=-1)


class GroupNorm(nn.Module):
    """GroupNorm with fp32 statistics regardless of input dtype, with an
    optional fused activation.

    Compute goes through XLA's GroupNorm lowering: a Pallas alternative was
    built and measured SLOWER in-graph (the custom-call boundary blocks XLA
    from fusing the normalize pass with the surrounding residual/time-emb
    adds; negative result recorded in BENCHMARKS.md) and deleted. Params stay
    under ``GroupNorm_0`` (checkpoint-conversion contract)."""

    num_groups: int = 32
    epsilon: float = 1e-5
    act: Optional[str] = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        out = nn.GroupNorm(
            num_groups=self.num_groups,
            epsilon=self.epsilon,
            dtype=jnp.float32,
            param_dtype=jnp.float32,
        )(x.astype(jnp.float32))
        if self.act == "silu":
            out = nn.silu(out)
        return out.astype(x.dtype)


class ResnetBlock(nn.Module):
    """GroupNorm -> SiLU -> Conv3x3 (x2) with residual; optional time emb.

    Convs are XLA lowerings: two generations of a Pallas shifted-matmul
    3x3-conv kernel were qualified on hardware at 0.73x / 0.69x XLA and
    deleted (negative result in BENCHMARKS.md) — XLA's conv tiling plus its
    freedom to fuse the surrounding norm/residual work wins at every shape
    this model traces."""

    out_channels: int
    use_time_emb: bool = True
    groups: int = 32
    eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, temb: Optional[Array] = None) -> Array:
        in_channels = x.shape[-1]
        residual = x
        conv = functools.partial(
            nn.Conv, kernel_size=(3, 3), padding=1, dtype=self.dtype
        )

        h = GroupNorm(self.groups, self.eps, act="silu", name="norm1")(x)
        h = conv(self.out_channels, name="conv1")(h)

        if self.use_time_emb:
            assert temb is not None
            t = nn.Dense(self.out_channels, dtype=self.dtype, name="time_emb_proj")(
                nn.silu(temb)
            )
            h = h + t[:, None, None, :]

        h = GroupNorm(self.groups, self.eps, act="silu", name="norm2")(h)
        h = conv(self.out_channels, name="conv2")(h)

        if in_channels != self.out_channels:
            residual = nn.Conv(
                self.out_channels, (1, 1), dtype=self.dtype, name="conv_shortcut"
            )(residual)
        return residual + h


class Downsample(nn.Module):
    out_channels: int
    dtype: jnp.dtype = jnp.float32
    asymmetric_padding: bool = False  # VAE encoder pads (0,1,0,1)

    @nn.compact
    def __call__(self, x: Array) -> Array:
        if self.asymmetric_padding:
            pad = ((0, 0), (0, 1), (0, 1), (0, 0))
            x = jnp.pad(x, pad)
            padding = "VALID"
        else:
            padding = 1
        return nn.Conv(
            self.out_channels,
            (3, 3),
            strides=(2, 2),
            padding=padding,
            dtype=self.dtype,
            name="conv",
        )(x)


class Upsample(nn.Module):
    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b, h, w, c = x.shape
        x = jax.image.resize(x, (b, h * 2, w * 2, c), method="nearest")
        return nn.Conv(
            self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv"
        )(x)


class CrossAttention(nn.Module):
    """Multi-head attention with separate q and kv inputs (kv may be None for
    self-attention). Projections have no bias, output does — SD convention."""

    num_heads: int
    head_dim: int
    out_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: Array,
        context: Optional[Array] = None,
        key_bias: Optional[Array] = None,
        zero_context_dim: Optional[int] = None,
    ) -> Array:
        inner = self.num_heads * self.head_dim
        if zero_context_dim is not None:
            # The live model feeds all-zero text conditioning to the SD
            # cross-attention layers (reference ``mvunet.py:128,157,184``).
            # With bias-free k/v projections, v == 0 exactly, so the
            # attention output is 0 and the whole block reduces to its
            # to_out bias — computed below on a single zero token and
            # broadcast. Exact, and the parameter structure is unchanged
            # for checkpoint conversion (the dummy projections materialize
            # the same params; XLA dead-code-eliminates their compute).
            dummy_ctx = jnp.zeros((1, 1, zero_context_dim), self.dtype)
            nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(
                x[:1, :1]
            )
            nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_k")(
                dummy_ctx
            )
            nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_v")(
                dummy_ctx
            )
            out0 = nn.Dense(self.out_dim, dtype=self.dtype, name="to_out")(
                jnp.zeros((1, 1, inner), self.dtype)
            )
            b, lq, _ = x.shape
            return jnp.broadcast_to(out0, (b, lq, self.out_dim))

        context = x if context is None else context
        q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(x)
        k = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_k")(context)
        v = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_v")(context)

        b, lq, _ = q.shape
        lk = k.shape[1]
        q = q.reshape(b, lq, self.num_heads, self.head_dim).transpose(0, 2, 1, 3)
        k = k.reshape(b, lk, self.num_heads, self.head_dim).transpose(0, 2, 1, 3)
        v = v.reshape(b, lk, self.num_heads, self.head_dim).transpose(0, 2, 1, 3)

        out = attention(q, k, v, bias=key_bias)
        out = out.transpose(0, 2, 1, 3).reshape(b, lq, inner)
        return nn.Dense(self.out_dim, dtype=self.dtype, name="to_out")(out)


class _DenseParams(nn.Module):
    """Parameter holder with ``nn.Dense``'s tree ({kernel[, bias]})."""

    din: int
    dout: int
    use_bias: bool = True

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.din, self.dout),
            jnp.float32,
        )
        if not self.use_bias:
            return kernel, None
        bias = self.param(
            "bias", nn.initializers.zeros, (self.dout,), jnp.float32
        )
        return kernel, bias


class _LayerNormParams(nn.Module):
    """Parameter holder with ``nn.LayerNorm``'s tree ({scale, bias})."""

    features: int

    @nn.compact
    def __call__(self):
        scale = self.param(
            "scale", nn.initializers.ones, (self.features,), jnp.float32
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.features,), jnp.float32
        )
        return scale, bias


class _GEGLUParams(nn.Module):
    """Parameter tree of :class:`GEGLU` (child Dense named ``proj``)."""

    din: int
    inner: int

    @nn.compact
    def __call__(self):
        return _DenseParams(self.din, self.inner * 2, name="proj")()


class _FeedForwardParams(nn.Module):
    """Parameter tree of :class:`FeedForward` (net_0 GEGLU + net_2 Dense)."""

    dim: int
    mult: int = 4

    @nn.compact
    def __call__(self):
        inner = self.dim * self.mult
        w1, b1 = _GEGLUParams(self.dim, inner, name="net_0")()
        w2, b2 = _DenseParams(inner, self.dim, name="net_2")()
        return w1, b1, w2, b2


class _SelfAttnParams(nn.Module):
    """Parameter tree of the SD-convention self-attention modules
    (:class:`CrossAttention` / ``mv_attention.SelfAttention``): bias-free
    to_q/to_k/to_v, biased to_out."""

    din: int
    inner: int

    @nn.compact
    def __call__(self):
        wq, _ = _DenseParams(self.din, self.inner, use_bias=False,
                             name="to_q")()
        wk, _ = _DenseParams(self.din, self.inner, use_bias=False,
                             name="to_k")()
        wv, _ = _DenseParams(self.din, self.inner, use_bias=False,
                             name="to_v")()
        wo, bo = _DenseParams(self.inner, self.din, name="to_out")()
        return wq, wk, wv, wo, bo


def self_attn_block(x: Array, dim: int, num_heads: int, head_dim: int,
                    dtype, norm_name: str, attn_name: str) -> Array:
    """``x + Attn(LayerNorm(x))`` (per-token-sequence self-attention)
    through the fused TPU kernel (``ops/fused_attn.py``), with the
    parameter tree of the decomposed LayerNorm + attention modules. Falls
    back to the decomposed path (flash attention + separate projections)
    on CPU and for wide channels. Must be called inside ``nn.compact``."""
    from ..ops.fused_attn import _use_pallas, fused_ln_self_attention

    ln_scale, ln_bias = _LayerNormParams(dim, name=norm_name)()
    inner = num_heads * head_dim
    wq, wk, wv, wo, bo = _SelfAttnParams(dim, inner, name=attn_name)()

    # Byte-size gate: a float32 engine (e.g. the parity harness) halves the
    # fusable channel width so f32 weights never overflow scoped VMEM.
    use_fused = _use_pallas(dim, jnp.dtype(dtype))
    if use_fused:
        return fused_ln_self_attention(
            x, ln_scale, ln_bias,
            wq.astype(dtype), wk.astype(dtype), wv.astype(dtype),
            wo.astype(dtype), bo,
            num_heads=num_heads, head_dim=head_dim,
        )

    # Decomposed path, numerically the previous module stack.
    from ..ops.attention import attention

    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    h = ((xf - mu) * jax.lax.rsqrt(var + 1e-6) * ln_scale + ln_bias).astype(
        dtype
    )
    b, l, _ = h.shape
    q = jnp.dot(h, wq.astype(dtype)).reshape(b, l, num_heads, head_dim)
    k = jnp.dot(h, wk.astype(dtype)).reshape(b, l, num_heads, head_dim)
    v = jnp.dot(h, wv.astype(dtype)).reshape(b, l, num_heads, head_dim)
    out = attention(
        q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
        v.transpose(0, 2, 1, 3),
    )
    out = out.transpose(0, 2, 1, 3).reshape(b, l, inner)
    y = jnp.dot(out, wo.astype(dtype)) + bo.astype(dtype)
    return x + y.astype(x.dtype)


def ff_block(x: Array, dim: int, dtype, norm_name: str = "norm3",
             ff_name: str = "ff") -> Array:
    """``x + FeedForward(LayerNorm(x))`` through the fused TPU kernel
    (``ops/fused_ff.py``), with the parameter tree of the decomposed
    ``nn.LayerNorm(norm3)`` + ``FeedForward(ff)`` modules (checkpoint-
    conversion contract). Must be called inside a parent ``nn.compact``."""
    from ..ops.fused_ff import fused_ln_geglu_ff

    ln_scale, ln_bias = _LayerNormParams(dim, name=norm_name)()
    w1, b1, w2, b2 = _FeedForwardParams(dim, name=ff_name)()
    return fused_ln_geglu_ff(
        x, ln_scale, ln_bias,
        w1.astype(dtype), b1, w2.astype(dtype), b2,
    )


class GEGLU(nn.Module):
    dim_out: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        h = nn.Dense(self.dim_out * 2, dtype=self.dtype, name="proj")(x)
        h, gate = jnp.split(h, 2, axis=-1)
        # Exact (erf) gelu to match torch F.gelu default used by the reference.
        return h * nn.gelu(gate, approximate=False)


class FeedForward(nn.Module):
    """GEGLU feed-forward (reference ``mvdream/attention.py:70-87`` with
    glu=True, mult=4 — also the SD UNet FF)."""

    dim_out: int
    mult: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        inner = int(x.shape[-1] * self.mult)
        h = GEGLU(inner, dtype=self.dtype, name="net_0")(x)
        return nn.Dense(self.dim_out, dtype=self.dtype, name="net_2")(h)


class TransformerBlock2D(nn.Module):
    """SD BasicTransformerBlock: self-attn, cross-attn (text), GEGLU FF."""

    num_heads: int
    head_dim: int
    context_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, context: Optional[Array]) -> Array:
        """``context=None`` means the live model's all-zero text
        conditioning: attn2 collapses to its exact constant (see
        ``CrossAttention``)."""
        dim = x.shape[-1]
        x = self_attn_block(
            x, dim, self.num_heads, self.head_dim, self.dtype,
            norm_name="norm1", attn_name="attn1",
        )
        h = nn.LayerNorm(dtype=jnp.float32, name="norm2")(x)
        x = x + CrossAttention(
            self.num_heads, self.head_dim, dim, dtype=self.dtype, name="attn2"
        )(
            h,
            context,
            zero_context_dim=self.context_dim if context is None else None,
        )
        return ff_block(x, dim, self.dtype)


class Transformer2D(nn.Module):
    """SD spatial transformer: GroupNorm, linear proj_in, transformer blocks
    over (h*w) tokens, linear proj_out, residual. SD2.1 uses linear (not conv)
    projections (``use_linear_projection=True``)."""

    num_heads: int
    head_dim: int
    context_dim: int
    depth: int = 1
    groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, context: Optional[Array]) -> Array:
        b, h, w, c = x.shape
        residual = x
        hidden = GroupNorm(self.groups, 1e-6, name="norm")(x)
        hidden = hidden.reshape(b, h * w, c)
        hidden = nn.Dense(c, dtype=self.dtype, name="proj_in")(hidden)
        for i in range(self.depth):
            hidden = TransformerBlock2D(
                self.num_heads,
                self.head_dim,
                self.context_dim,
                dtype=self.dtype,
                name=f"blocks_{i}",
            )(hidden, context)
        hidden = nn.Dense(c, dtype=self.dtype, name="proj_out")(hidden)
        return hidden.reshape(b, h, w, c) + residual


class AttnBlockVAE(nn.Module):
    """Single-head spatial self-attention in the VAE mid block."""

    groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b, h, w, c = x.shape
        residual = x
        hidden = GroupNorm(self.groups, 1e-6, name="group_norm")(x).reshape(b, h * w, c)
        q = nn.Dense(c, dtype=self.dtype, name="to_q")(hidden)
        k = nn.Dense(c, dtype=self.dtype, name="to_k")(hidden)
        v = nn.Dense(c, dtype=self.dtype, name="to_v")(hidden)
        out = attention(q[:, None], k[:, None], v[:, None])[:, 0]
        out = nn.Dense(c, dtype=self.dtype, name="to_out")(out)
        return out.reshape(b, h, w, c) + residual
