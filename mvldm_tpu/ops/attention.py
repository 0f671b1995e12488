"""Fused multi-head attention for TPU.

This is the TPU-native replacement for the reference's attention backends
(torch SDPA at ``src/model/transformer/attention.py:96`` and the xformers /
einsum paths in ``src/model/denoiser/mvdream/attention.py:156-254``). Two
implementations with one contract:

* :func:`mha_reference` — pure-jnp, differentiable, used on CPU and as the
  numerical ground truth. Softmax statistics are computed in float32 even for
  bf16 inputs, matching the reference's fp32-forced QK matmul
  (``mvdream/attention.py:185-190``).
* :func:`flash_attention` — a Pallas kernel with online softmax (one pass over
  key blocks, no materialized L×L matrix in HBM).

:func:`attention` dispatches between them and wires a custom VJP so the Pallas
forward is usable in training (the backward recomputes attention weights with
jnp — fine at this model's sequence lengths of ≤ ~8k tokens).

An optional additive ``bias`` of shape (batch, kv_len) masks keys; the
multi-view UNet uses it to exclude padded views from cross-view attention,
which is what makes single-launch batched CFG exact (see
``models/mv_attention.py``).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30  # large finite negative; -inf breaks exp(m_prev - m_new) warm-up


def mha_reference(
    q: Array,
    k: Array,
    v: Array,
    bias: Array | None = None,
    scale: float | None = None,
) -> Array:
    """Plain attention. q/k/v: (B, H, Lq/Lk, D); bias: (B, Lk) additive."""
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    s = jnp.einsum(
        "bhqd,bhkd->bhqk",
        q.astype(jnp.float32),
        k.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    ) * scale
    if bias is not None:
        s = s + bias.astype(jnp.float32)[:, None, None, :]
    p = jax.nn.softmax(s, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", p, v.astype(jnp.float32))
    return out.astype(q.dtype)


def _flash_kernel(
    q_ref, k_ref, v_ref, *refs, scale: float, has_bias: bool
):
    """Performance notes (measured on v5e at this model's shapes):

    * Matmul inputs stay in their native dtype — bf16 inputs run the MXU at
      full rate, while upcasting to f32 halves it. Numerics are unchanged
      for QK^T: bf16xbf16 products are exact in the f32 accumulator
      (``preferred_element_type``), which is precisely the reference's
      fp32-softmax guarantee (``mvdream/attention.py:185-190``). P is cast
      to V's dtype for the PV matmul (the official JAX flash kernel's
      choice); softmax statistics m/l and the output accumulator remain
      f32.
    * The bias input (and its per-scores-tile add) is compiled out when no
      mask exists — the sequential-CFG sampling path runs maskless, and
      elementwise passes over the (block_q, block_k) tile are the marginal
      cost at small head dims.
    """
    if has_bias:
        bias_ref, o_ref, m_scr, l_scr, acc_scr = refs
    else:
        o_ref, m_scr, l_scr, acc_scr = refs
    k_idx = pl.program_id(2)

    @pl.when(k_idx == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    s = jax.lax.dot_general(
        q_ref[0], k_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (block_q, block_k) f32
    if scale != 1.0:
        s = s * scale
    if has_bias:
        s = s + bias_ref[0, 0].astype(jnp.float32)

    m_prev = m_scr[:]
    l_prev = l_scr[:]
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new)
    l_scr[:] = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
    m_scr[:] = m_new
    # Note: a transposed accumulator (acc = V^T P^T, putting block_q on the
    # lane dim for small head dims) was measured 3x SLOWER on v5e than this
    # straight form — Mosaic lowers the (d, block_k) x (block_k, block_q)
    # contraction poorly. Keep P @ V.
    acc_scr[:] = acc_scr[:] * alpha + jax.lax.dot_general(
        p.astype(v_ref.dtype),
        v_ref[0],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(k_idx == pl.num_programs(2) - 1)
    def _finalize():
        o_ref[0] = (acc_scr[:] / l_scr[:]).astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.partial(
    jax.jit, static_argnames=("scale", "block_q", "block_k", "interpret")
)
def flash_attention(
    q: Array,
    k: Array,
    v: Array,
    bias: Array | None = None,
    scale: float | None = None,
    block_q: int = 1024,
    block_k: int = 1024,
    interpret: bool = False,
) -> Array:
    """Pallas fused attention. q: (B, H, Lq, D); k/v: (B, H, Lk, D).

    Handles ragged lengths by padding to block multiples; padded keys get an
    additive NEG_INF bias, padded query rows are sliced off the output.
    """
    b, h, lq, d = q.shape
    lk = k.shape[2]
    if scale is None:
        scale = 1.0 / math.sqrt(d)

    # Large default blocks: at this model's head dims (40-160) each grid
    # program does little MXU work, so per-program overhead dominates with
    # small blocks (measured on v5e at L=5120, D=40: 256x512 blocks -> 11
    # TF/s, 1024x1024 -> 32 TF/s). Blocks clamp to the padded seq lengths.
    block_q = min(block_q, _round_up(lq, 128))
    block_k = min(block_k, _round_up(lk, 128))
    lq_pad = _round_up(lq, block_q)
    lk_pad = _round_up(lk, block_k)

    # Key padding requires a masking bias; otherwise the bias input (and its
    # per-scores-tile add) is compiled out entirely — the model's sequential-
    # CFG sampling path runs maskless (see kernel docstring).
    if bias is None and lk_pad != lk:
        bias = jnp.zeros((b, lk), dtype=jnp.float32)
    has_bias = bias is not None
    if has_bias and lk_pad != lk:
        bias = jnp.pad(bias, ((0, 0), (0, lk_pad - lk)), constant_values=NEG_INF)
    if lq_pad != lq:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, lq_pad - lq), (0, 0)))
    if lk_pad != lk:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, lk_pad - lk), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, lk_pad - lk), (0, 0)))

    bh = b * h
    q = q.reshape(bh, lq_pad, d)
    k = k.reshape(bh, lk_pad, d)
    v = v.reshape(bh, lk_pad, d)

    grid = (bh, lq_pad // block_q, lk_pad // block_k)

    in_specs = [
        pl.BlockSpec((1, block_q, d), lambda g, iq, ik: (g, iq, 0)),
        pl.BlockSpec((1, block_k, d), lambda g, iq, ik: (g, ik, 0)),
        pl.BlockSpec((1, block_k, d), lambda g, iq, ik: (g, ik, 0)),
    ]
    operands = [q, k, v]
    if has_bias:
        # (b, 1, lk): the singleton dim keeps the trailing-two-dims block
        # shape (1, block_k) legal under the TPU tiling rules. One bias row
        # per batch element, broadcast over heads and q blocks.
        operands.append(bias.reshape(b, 1, lk_pad))
        in_specs.append(
            pl.BlockSpec((1, 1, block_k), lambda g, iq, ik: (g // h, 0, ik))
        )

    out = pl.pallas_call(
        functools.partial(_flash_kernel, scale=scale, has_bias=has_bias),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, block_q, d), lambda g, iq, ik: (g, iq, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, lq_pad, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        interpret=interpret,
    )(*operands)

    out = out.reshape(b, h, lq_pad, d)
    if lq_pad != lq:
        out = out[:, :, :lq, :]
    return out


def _use_pallas() -> bool:
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:
        return False


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _attention_prim(q, k, v, bias, scale):
    if _use_pallas():
        return flash_attention(q, k, v, bias, scale=scale)
    return mha_reference(q, k, v, bias, scale=scale)


def _attention_fwd(q, k, v, bias, scale):
    return _attention_prim(q, k, v, bias, scale), (q, k, v, bias)


def _attention_bwd(scale, res, g):
    """Analytic attention backward with recomputed weights (fp32)."""
    q, k, v, bias = res
    qf = q.astype(jnp.float32)
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    gf = g.astype(jnp.float32)
    s = jnp.einsum("bhqd,bhkd->bhqk", qf, kf) * scale
    if bias is not None:
        s = s + bias.astype(jnp.float32)[:, None, None, :]
    p = jax.nn.softmax(s, axis=-1)
    dv = jnp.einsum("bhqk,bhqd->bhkd", p, gf)
    dp = jnp.einsum("bhqd,bhkd->bhqk", gf, vf)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq = jnp.einsum("bhqk,bhkd->bhqd", ds, kf) * scale
    dk = jnp.einsum("bhqk,bhqd->bhkd", ds, qf) * scale
    dbias = None
    if bias is not None:
        dbias = jnp.sum(ds, axis=(1, 2)).astype(bias.dtype)
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype), dbias


_attention_prim.defvjp(_attention_fwd, _attention_bwd)


def attention(
    q: Array,
    k: Array,
    v: Array,
    bias: Array | None = None,
    scale: float | None = None,
) -> Array:
    """Fused MHA with auto backend dispatch (Pallas on TPU, jnp on CPU).

    q: (B, H, Lq, D); k/v: (B, H, Lk, D); bias: optional (B, Lk) additive
    key bias (use large negatives to mask). Differentiable.
    """
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    return _attention_prim(q, k, v, bias, scale)
