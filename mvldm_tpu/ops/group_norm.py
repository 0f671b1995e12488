"""Fused GroupNorm (+ optional SiLU) for TPU — available op.

Keeps all reductions lane-aligned:

1. per-CHANNEL sums over the spatial axis — a clean sublane reduction;
2. channel->group mixing (and the broadcast back) as tiny matmuls with a
   0/1 group-membership matrix on the MXU;
3. one normalize (+affine, + optional SiLU) pass.

Statistics are f32 regardless of input dtype. Backward is analytic jnp in
the same lane-aligned formulation.

Measured outcome (BENCHMARKS.md "negative results"): standalone this kernel
MATCHES XLA's GroupNorm lowering on the bench chip — both sit at the chip's
~72 GB/s elementwise floor — and in-graph the custom-call boundary blocks
XLA from fusing the normalize pass with neighboring residual/time-emb adds,
so the model's ``models/layers.GroupNorm`` intentionally stays on flax's
inline lowering. The kernel remains exported for standalone use and as the
measured reference point for future norm-fusion work.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl

# Largest (L, C) block the kernel takes in one program. Pallas double-
# buffers the input AND output blocks against a 16 MB scoped-VMEM limit
# (measured: a 4.2M-elem bf16 block allocates 32 MB and fails to compile),
# and the kernel holds f32 temporaries besides — 512k elems (1 MB bf16
# block) keeps the total comfortably inside. The UNet's largest GroupNorm
# block is 327k elems (32x32 spatial x 320 ch); the VAE's big-spatial
# norms exceed the cap and fall back to the jnp path.
MAX_BLOCK_ELEMS = 512 * 1024


def _group_matrix(channels: int, groups: int) -> jnp.ndarray:
    """(C, G) 0/1 membership matrix: column g selects channels of group g."""
    c = jax.lax.broadcasted_iota(jnp.int32, (channels, groups), 0)
    g = jax.lax.broadcasted_iota(jnp.int32, (channels, groups), 1)
    return (c // (channels // groups) == g).astype(jnp.float32)


def _gn_kernel(x_ref, scale_ref, bias_ref, o_ref, *, groups: int, eps: float,
               act: Optional[str]):
    xf = x_ref[0].astype(jnp.float32)  # (L, C)
    l, c = xf.shape
    m = _group_matrix(c, groups)
    s1 = jnp.sum(xf, axis=0, keepdims=True)        # (1, C) lane-aligned
    s2 = jnp.sum(xf * xf, axis=0, keepdims=True)   # (1, C)
    n = l * (c // groups)
    sum_g = jax.lax.dot_general(
        s1, m, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # (1, G)
    sumsq_g = jax.lax.dot_general(
        s2, m, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    mean_g = sum_g / n
    var_g = jnp.maximum(sumsq_g / n - mean_g * mean_g, 0.0)
    rstd_g = jax.lax.rsqrt(var_g + eps)
    # Broadcast (1, G) -> (1, C) through the transposed membership matrix.
    mean_c = jax.lax.dot_general(
        mean_g, m, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    rstd_c = jax.lax.dot_general(
        rstd_g, m, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    y = (xf - mean_c) * (rstd_c * scale_ref[:]) + bias_ref[:]
    if act == "silu":
        y = y * jax.nn.sigmoid(y)
    o_ref[0] = y.astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("groups", "eps", "act", "interpret")
)
def _gn_pallas(x, scale, bias, groups: int, eps: float, act: Optional[str],
               interpret: bool = False):
    n, l, c = x.shape
    return pl.pallas_call(
        functools.partial(_gn_kernel, groups=groups, eps=eps, act=act),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, l, c), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, l, c), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, l, c), x.dtype),
        interpret=interpret,
    )(x, scale.reshape(1, c), bias.reshape(1, c))


def _stats_jnp(x3, groups: int):
    """Lane-aligned f32 group stats for the reference/backward path.
    x3: (N, L, C) -> mean_c, rstd-less var_c broadcast to channels."""
    n_, l, c = x3.shape
    xf = x3.astype(jnp.float32)
    m = _group_matrix(c, groups)
    s1 = jnp.sum(xf, axis=1)            # (N, C)
    s2 = jnp.sum(xf * xf, axis=1)       # (N, C)
    n = l * (c // groups)
    mean_g = (s1 @ m) / n               # (N, G)
    var_g = jnp.maximum((s2 @ m) / n - mean_g**2, 0.0)
    mean_c = mean_g @ m.T               # (N, C)
    var_c = var_g @ m.T
    return xf, mean_c[:, None, :], var_c[:, None, :]


def _gn_jnp(x3, scale, bias, groups: int, eps: float, act: Optional[str]):
    xf, mean_c, var_c = _stats_jnp(x3, groups)
    y = (xf - mean_c) * (jax.lax.rsqrt(var_c + eps) * scale) + bias
    if act == "silu":
        y = y * jax.nn.sigmoid(y)
    return y.astype(x3.dtype)


def _use_pallas(x3) -> bool:
    if jax.default_backend() in ("cpu",):
        return False
    return x3.shape[1] * x3.shape[2] <= MAX_BLOCK_ELEMS


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _gn_prim(x3, scale, bias, groups, eps, act):
    if _use_pallas(x3):
        return _gn_pallas(x3, scale, bias, groups, eps, act)
    return _gn_jnp(x3, scale, bias, groups, eps, act)


def _gn_fwd(x3, scale, bias, groups, eps, act):
    return _gn_prim(x3, scale, bias, groups, eps, act), (x3, scale, bias)


def _gn_bwd(groups, eps, act, res, g):
    """Analytic GroupNorm backward (lane-aligned: spatial sums then group
    mixing), with the SiLU chain rule applied first when fused."""
    x3, scale, bias = res
    xf, mean_c, var_c = _stats_jnp(x3, groups)
    rstd_c = jax.lax.rsqrt(var_c + eps)
    x_hat = (xf - mean_c) * rstd_c
    gf = g.astype(jnp.float32)

    if act == "silu":
        y = x_hat * scale + bias
        sig = jax.nn.sigmoid(y)
        gf = gf * (sig * (1.0 + y * (1.0 - sig)))

    dscale = jnp.sum(gf * x_hat, axis=(0, 1))
    dbias = jnp.sum(gf, axis=(0, 1))

    c = x3.shape[-1]
    n = x3.shape[1] * (c // groups)
    m = _group_matrix(c, groups)
    gs = gf * scale  # (N, L, C)
    # Group-means of gs and gs*x_hat, broadcast back to channels.
    mean_gs = ((jnp.sum(gs, axis=1) @ m) / n) @ m.T
    mean_gsx = ((jnp.sum(gs * x_hat, axis=1) @ m) / n) @ m.T
    dx = rstd_c * (gs - mean_gs[:, None, :] - x_hat * mean_gsx[:, None, :])
    return dx.astype(x3.dtype), dscale, dbias


_gn_prim.defvjp(_gn_fwd, _gn_bwd)


def group_norm(
    x: Array,
    scale: Array,
    bias: Array,
    num_groups: int = 32,
    eps: float = 1e-5,
    act: Optional[str] = None,
) -> Array:
    """Fused GroupNorm over the channel-last axis of (..., L-or-HW dims, C),
    with f32 statistics and optional fused SiLU. Differentiable."""
    shape = x.shape
    c = shape[-1]
    assert c % num_groups == 0, (c, num_groups)
    lead = shape[0]
    x3 = x.reshape(lead, -1, c)
    out = _gn_prim(
        x3,
        scale.astype(jnp.float32),
        bias.astype(jnp.float32),
        num_groups,
        eps,
        act,
    )
    return out.reshape(shape)
