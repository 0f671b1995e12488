"""Fused LayerNorm -> GEGLU feed-forward -> residual for TPU.

The transformer FF chain (reference ``mvdream/attention.py:70-87`` /
SD ``BasicTransformerBlock``) is the single largest HBM-bandwidth consumer
in the UNet denoise step: decomposed, it streams the (tokens, C) activation
and its (tokens, 8C) GEGLU intermediate through HBM ~7 times (LayerNorm
read/write in f32, two projections, split/gelu/mul passes — profiled at
~20 ms/step for the 32x32 stages on the bench chip, whose effective
elementwise bandwidth is ~72 GB/s). This kernel computes

    y = x + W2( h * gelu_exact(g) ) + b2,   [h | g] = LN(x) @ W1 + b1

in ONE read and ONE write of x per token tile: the weights and the GEGLU
intermediate live in VMEM, the matmuls run on the MXU with f32
accumulation, LayerNorm statistics and the gelu gate are f32.

Used for C <= 640 (the bandwidth-heavy 32x32/16x16 stages); at C = 1280 the
W1 weight alone (1280 x 10240 bf16 = 26 MB) exceeds the 16 MB scoped-VMEM
budget, and those 8x8/4x4 streams are small — the decomposed path handles
them. Backward falls back to the decomposed formulation (recompute).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl

# Fuse only where the weights fit comfortably in scoped VMEM. The budget is
# expressed in BYTES per channel-row (cap derived from the bf16 C=640 case:
# W1 640x5120 + W2 2560x640 bf16 ~ 9.8 MB against the 16 MB scoped budget),
# so a float32 engine — e.g. the parity harness — halves the channel cap
# instead of compiling a kernel whose f32 weights overflow VMEM.
MAX_FUSED_CHANNEL_BYTES = 640 * 2
# Back-compat element-count cap for bf16 (used by tests/docs).
MAX_FUSED_CHANNELS = 640


def _token_tile(l: int, c: int) -> int:
    """Tile of tokens processed per inner iteration: the largest power of
    two that divides L and bounds the f32 (tile, 8C) GEGLU intermediate to
    ~2.6 MB."""
    budget = 650_000  # f32 elements
    t = min(l, max(budget // (8 * c), 8))
    t = 1 << (t.bit_length() - 1)  # floor to a power of two
    while l % t != 0 and t > 1:
        t //= 2
    return max(t, 1)


def _erf(x: Array) -> Array:
    """erf from Mosaic-supported primitives (no erf/erfc lowering exists):
    Abramowitz & Stegun 7.1.26 rational approximation, |abs err| < 1.5e-7 —
    far below bf16 resolution (2^-8)."""
    p = 0.3275911
    a1, a2, a3, a4, a5 = (
        0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429
    )
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    y = 1.0 - poly * jnp.exp(-ax * ax)
    return jnp.sign(x) * y


def _gelu_exact(x: Array) -> Array:
    """Exact (erf) gelu — matches torch F.gelu (not the tanh approximation
    flax defaults to)."""
    return 0.5 * x * (1.0 + _erf(x * 0.7071067811865476))


def _ff_kernel(x_ref, lns_ref, lnb_ref, w1_ref, b1_ref, w2_ref, b2_ref,
               o_ref, *, eps: float, tile: int):
    l, c = x_ref.shape[1], x_ref.shape[2]

    def body(i, _):
        xt = x_ref[0, pl.ds(i * tile, tile), :]
        xf = xt.astype(jnp.float32)
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu
        xn = (xf - mu) * jax.lax.rsqrt(var + eps)
        xn = xn * lns_ref[:] + lnb_ref[:]

        m1 = jax.lax.dot_general(
            xn.astype(w1_ref.dtype), w1_ref[:],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        ) + b1_ref[:]
        h, gate = jnp.split(m1, 2, axis=-1)
        act = h * _gelu_exact(gate)

        o = jax.lax.dot_general(
            act.astype(w2_ref.dtype), w2_ref[:],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        ) + b2_ref[:]
        o_ref[0, pl.ds(i * tile, tile), :] = (xf + o).astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, l // tile, body, 0)


@functools.partial(jax.jit, static_argnames=("eps", "interpret"))
def _ff_pallas(x, ln_scale, ln_bias, w1, b1, w2, b2, eps: float = 1e-6,
               interpret: bool = False):
    n, l, c = x.shape
    f2 = w1.shape[1]
    tile = _token_tile(l, c)
    return pl.pallas_call(
        functools.partial(_ff_kernel, eps=eps, tile=tile),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, l, c), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            # Constant index maps: Mosaic skips the re-DMA between
            # consecutive grid programs, so weights stream from HBM once.
            pl.BlockSpec((c, f2), lambda i: (0, 0)),
            pl.BlockSpec((1, f2), lambda i: (0, 0)),
            pl.BlockSpec((f2 // 2, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, l, c), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, l, c), x.dtype),
        interpret=interpret,
    )(x, ln_scale.reshape(1, c), ln_bias.reshape(1, c), w1,
      b1.reshape(1, f2), w2, b2.reshape(1, c))


def _ff_jnp(x, ln_scale, ln_bias, w1, b1, w2, b2, eps: float = 1e-6):
    """Decomposed reference path — mirrors the previous module stack
    (f32 LayerNorm, bf16-dtype projections, exact gelu)."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    xn = (xf - mu) * jax.lax.rsqrt(var + eps) * ln_scale + ln_bias
    h = jnp.dot(xn.astype(dtype), w1.astype(dtype),
                preferred_element_type=jnp.float32) + b1
    a, gate = jnp.split(h, 2, axis=-1)
    act = a * jax.nn.gelu(gate, approximate=False)
    o = jnp.dot(act.astype(dtype), w2.astype(dtype),
                preferred_element_type=jnp.float32) + b2
    return (xf + o).astype(dtype)


def _use_pallas(c: int, dtype) -> bool:
    return (
        jax.default_backend() not in ("cpu",)
        and c * jnp.dtype(dtype).itemsize <= MAX_FUSED_CHANNEL_BYTES
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def _ff_prim(x, ln_scale, ln_bias, w1, b1, w2, b2, eps):
    # run_manual: under a published mesh the Pallas forward must live in a
    # shard_map (Mosaic kernels cannot be auto-partitioned); the batch rows
    # shard over data AND model when divisible — per-frame view parallelism
    # for trainer.strategy=data_model. Direct call when no mesh is active.
    from ..parallel.tp import run_manual

    fn = _ff_pallas if _use_pallas(x.shape[-1], w1.dtype) else _ff_jnp
    return run_manual(
        functools.partial(fn, eps=eps),
        batched=(x,), replicated=(ln_scale, ln_bias, w1, b1, w2, b2),
    )


def _ff_fwd(x, ln_scale, ln_bias, w1, b1, w2, b2, eps):
    out = _ff_prim(x, ln_scale, ln_bias, w1, b1, w2, b2, eps)
    return out, (x, ln_scale, ln_bias, w1, b1, w2, b2)


def _ff_bwd(eps, res, g):
    x, ln_scale, ln_bias, w1, b1, w2, b2 = res

    def f(x, ln_scale, ln_bias, w1, b1, w2, b2):
        return _ff_jnp(x, ln_scale, ln_bias, w1, b1, w2, b2, eps=eps)

    _, vjp = jax.vjp(f, x, ln_scale, ln_bias, w1, b1, w2, b2)
    return vjp(g)


_ff_prim.defvjp(_ff_fwd, _ff_bwd)


def fused_ln_geglu_ff(
    x: Array,
    ln_scale: Array,
    ln_bias: Array,
    w1: Array,
    b1: Array,
    w2: Array,
    b2: Array,
    eps: float = 1e-6,
) -> Array:
    """x: (..., L, C) tokens -> x + FF(LN(x)). Differentiable; dispatches
    to the fused kernel on TPU for C <= 640."""
    shape = x.shape
    x3 = x.reshape(-1, shape[-2], shape[-1])
    out = _ff_prim(
        x3,
        ln_scale.astype(jnp.float32),
        ln_bias.astype(jnp.float32),
        w1, b1, w2, b2,
        eps,
    )
    return out.reshape(shape)
