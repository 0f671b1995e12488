"""Fused LayerNorm -> multi-head self-attention -> output projection ->
residual for TPU.

The per-frame self-attention sub-block (SD ``BasicTransformerBlock.attn1``
and the cross-view block's per-frame ``attn2``) streams its (tokens, C)
activation through HBM ~10 times when decomposed (f32 LayerNorm, three
projections, head split/merge transposes, attention in/out, output
projection) — on the bench chip's ~72 GB/s elementwise bandwidth that
dwarfs the matmul time. This kernel computes

    y = x + W_o MHA(LN(x)) + b_o

with ONE read and ONE write of x per row: LN, the q/k/v projections, the
per-head softmax(QK^T)V, and the output projection all stay in VMEM.

Head alignment: per-head slices at head_dim 40/64/80 would sit misaligned
in the 128-lane registers, so the projection weights are pre-padded — head
h's columns live at lanes [h*128, h*128 + D), zeros elsewhere (see
:func:`pad_heads`). Padded q/k lanes are zero on both sides, so QK^T over
the 128-lane slice is exact; the output projection uses the
correspondingly padded W_o rows (zero rows contribute nothing). The MXU
cost of the 128-padding equals what the unfused flash kernel already pays
for D < 128 contractions.

Used for C <= 640; the 1280-channel stages stream little and keep the
decomposed path. Softmax statistics are f32 (the reference's fp32-softmax
contract, ``mvdream/attention.py:185-190``). Backward recomputes through
the decomposed jnp path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl

# VMEM gate in BYTES per channel-row (see ops/fused_ff.py): a float32 engine
# halves the channel cap instead of overflowing scoped VMEM with f32 weights.
MAX_FUSED_CHANNEL_BYTES = 640 * 2
MAX_FUSED_CHANNELS = 640
LANE = 128


def pad_heads(w: Array, num_heads: int, head_dim: int, axis: int) -> Array:
    """(C, H*D) -> (C, H*128) with each head's D columns at its 128-lane
    slot (axis=1), or (H*D, C) -> (H*128, C) for the output projection
    (axis=0). Zero padding keeps the math exact."""
    if head_dim == LANE:
        return w
    assert head_dim < LANE
    if axis == 1:
        c = w.shape[0]
        w3 = w.reshape(c, num_heads, head_dim)
        w3 = jnp.pad(w3, ((0, 0), (0, 0), (0, LANE - head_dim)))
        return w3.reshape(c, num_heads * LANE)
    c = w.shape[1]
    w3 = w.reshape(num_heads, head_dim, c)
    w3 = jnp.pad(w3, ((0, 0), (0, LANE - head_dim), (0, 0)))
    return w3.reshape(num_heads * LANE, c)


def _attn_kernel(x_ref, lns_ref, lnb_ref, wq_ref, wk_ref, wv_ref, wo_ref,
                 bo_ref, o_ref, *, num_heads: int, scale: float, eps: float,
                 q_tile: int):
    l, c = x_ref.shape[1], x_ref.shape[2]

    xf = x_ref[0].astype(jnp.float32)  # (L, C)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu
    xn = ((xf - mu) * jax.lax.rsqrt(var + eps)) * lns_ref[:] + lnb_ref[:]
    xn = xn.astype(wq_ref.dtype)

    # Projections into the lane-padded head layout; scale folded into q.
    q = (
        jax.lax.dot_general(
            xn, wq_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        * scale
    ).astype(wq_ref.dtype)  # (L, H*128)
    k = jax.lax.dot_general(
        xn, wk_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(wq_ref.dtype)
    v = jax.lax.dot_general(
        xn, wv_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(wq_ref.dtype)

    head_cols = []
    for h in range(num_heads):
        qh = q[:, h * LANE:(h + 1) * LANE]
        kh = k[:, h * LANE:(h + 1) * LANE]
        vh = v[:, h * LANE:(h + 1) * LANE]
        cols = []
        for t in range(l // q_tile):
            qt = qh[t * q_tile:(t + 1) * q_tile, :]
            s = jax.lax.dot_general(
                qt, kh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (q_tile, L)
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
            linv = 1.0 / jnp.sum(p, axis=-1, keepdims=True)
            ot = jax.lax.dot_general(
                (p * linv).astype(vh.dtype), vh, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            cols.append(ot.astype(wq_ref.dtype))
        head_cols.append(
            cols[0] if len(cols) == 1 else jnp.concatenate(cols, axis=0)
        )
    out = (
        head_cols[0]
        if num_heads == 1
        else jnp.concatenate(head_cols, axis=1)
    )

    y = jax.lax.dot_general(
        out, wo_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bo_ref[:]
    o_ref[0] = (xf + y).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("num_heads", "head_dim", "eps", "interpret")
)
def _attn_pallas(x, ln_scale, ln_bias, wq, wk, wv, wo, bo, num_heads: int,
                 head_dim: int, eps: float = 1e-6, interpret: bool = False):
    n, l, c = x.shape
    hp = num_heads * LANE
    scale = 1.0 / (head_dim ** 0.5)
    # Scores tile: bound the (q_tile, L) f32 scores to ~2 MB.
    q_tile = l
    while q_tile * l > 512 * 1024 and q_tile % 2 == 0:
        q_tile //= 2
    return pl.pallas_call(
        functools.partial(
            _attn_kernel, num_heads=num_heads, scale=scale, eps=eps,
            q_tile=q_tile,
        ),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, l, c), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((c, hp), lambda i: (0, 0)),
            pl.BlockSpec((c, hp), lambda i: (0, 0)),
            pl.BlockSpec((c, hp), lambda i: (0, 0)),
            pl.BlockSpec((hp, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, l, c), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, l, c), x.dtype),
        interpret=interpret,
    )(x, ln_scale.reshape(1, c), ln_bias.reshape(1, c), wq, wk, wv, wo,
      bo.reshape(1, c))


def _attn_jnp(x, ln_scale, ln_bias, wq, wk, wv, wo, bo, num_heads: int,
              head_dim: int, eps: float = 1e-6):
    """Decomposed reference path on the PADDED weights (exact by zero
    padding); mirrors the previous module stack.

    The attention core goes through :func:`ops.attention.attention` (not the
    naive ``mha_reference``): this path is also what the fused kernel's
    backward differentiates through (see :func:`_attn_bwd`), and the
    dispatcher's query-chunked VJP keeps the recompute from materializing the
    (N, H, L, L) scores — at the C=320 stage (L = 64*64) that is a multi-GB
    f32 transient per train step otherwise."""
    from .attention import attention

    dtype = x.dtype
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    xn = ((xf - mu) * jax.lax.rsqrt(var + eps) * ln_scale + ln_bias).astype(
        dtype
    )
    n, l, c = x.shape
    q = jnp.dot(xn, wq.astype(dtype)).reshape(n, l, num_heads, LANE)
    k = jnp.dot(xn, wk.astype(dtype)).reshape(n, l, num_heads, LANE)
    v = jnp.dot(xn, wv.astype(dtype)).reshape(n, l, num_heads, LANE)
    q = q.transpose(0, 2, 1, 3)
    k = k.transpose(0, 2, 1, 3)
    v = v.transpose(0, 2, 1, 3)
    o = attention(q, k, v, scale=1.0 / (head_dim ** 0.5))
    o = o.transpose(0, 2, 1, 3).reshape(n, l, num_heads * LANE)
    y = jnp.dot(o, wo.astype(dtype), preferred_element_type=jnp.float32) + bo
    return (xf + y).astype(dtype)


def _use_pallas(c: int, dtype) -> bool:
    return (
        jax.default_backend() not in ("cpu",)
        and c * jnp.dtype(dtype).itemsize <= MAX_FUSED_CHANNEL_BYTES
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10))
def _attn_prim(x, ln_scale, ln_bias, wq, wk, wv, wo, bo, num_heads,
               head_dim, eps):
    # run_manual: under a published mesh the Pallas forward must live in a
    # shard_map (Mosaic kernels cannot be auto-partitioned); the batch rows
    # shard over data AND model when divisible — per-frame view parallelism
    # for trainer.strategy=data_model. Direct call when no mesh is active.
    from ..parallel.tp import run_manual

    if _use_pallas(x.shape[-1], wq.dtype):
        fn = functools.partial(
            _attn_pallas, num_heads=num_heads, head_dim=head_dim, eps=eps
        )
    else:
        fn = functools.partial(
            _attn_jnp, num_heads=num_heads, head_dim=head_dim, eps=eps
        )
    return run_manual(
        fn, batched=(x,),
        replicated=(ln_scale, ln_bias, wq, wk, wv, wo, bo),
    )


def _attn_fwd(x, ln_scale, ln_bias, wq, wk, wv, wo, bo, num_heads,
              head_dim, eps):
    out = _attn_prim(x, ln_scale, ln_bias, wq, wk, wv, wo, bo, num_heads,
                     head_dim, eps)
    return out, (x, ln_scale, ln_bias, wq, wk, wv, wo, bo)


def _attn_bwd(num_heads, head_dim, eps, res, g):
    x, ln_scale, ln_bias, wq, wk, wv, wo, bo = res

    def f(x, ln_scale, ln_bias, wq, wk, wv, wo, bo):
        return _attn_jnp(x, ln_scale, ln_bias, wq, wk, wv, wo, bo,
                         num_heads, head_dim, eps=eps)

    _, vjp = jax.vjp(f, x, ln_scale, ln_bias, wq, wk, wv, wo, bo)
    return vjp(g)


_attn_prim.defvjp(_attn_fwd, _attn_bwd)


def fused_ln_self_attention(
    x: Array,
    ln_scale: Array,
    ln_bias: Array,
    wq: Array,
    wk: Array,
    wv: Array,
    wo: Array,
    bo: Array,
    num_heads: int,
    head_dim: int,
    eps: float = 1e-6,
) -> Array:
    """x: (..., L, C) -> x + W_o MHA(LN(x)) + b_o.

    wq/wk/wv: (C, H*D) and wo: (H*D, C) in the standard module layout —
    padded to the lane-aligned head layout here (cheap; hoisted out of the
    sampling scan as a loop invariant). Differentiable."""
    shape = x.shape
    x3 = x.reshape(-1, shape[-2], shape[-1])
    wq = pad_heads(wq, num_heads, head_dim, axis=1)
    wk = pad_heads(wk, num_heads, head_dim, axis=1)
    wv = pad_heads(wv, num_heads, head_dim, axis=1)
    wo = pad_heads(wo, num_heads, head_dim, axis=0)
    out = _attn_prim(
        x3,
        ln_scale.astype(jnp.float32),
        ln_bias.astype(jnp.float32),
        wq, wk, wv, wo, bo,
        num_heads, head_dim, eps,
    )
    return out.reshape(shape)
