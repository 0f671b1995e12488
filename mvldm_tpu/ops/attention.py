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
forward is usable in training. Two backward paths, selected by
``MVLDM_FLASH_BWD``:

* ``1`` (default on TPU) — :func:`flash_attention_bwd`, FlashAttention-2-style
  Pallas kernels: the forward additionally emits the row log-sum-exp, and two
  kernels (dK/dV/dbias with queries innermost; dQ with keys innermost)
  recompute probability tiles in VMEM from (q, k, v, lse). No L×L tile ever
  touches HBM in either direction — the XLA chunked backward below streams
  ~four f32 (chunk, Lk) score tiles through HBM per chunk, which is the
  dominant backward traffic at the joint cross-view shape (L = 5·1024).
* ``0`` — the XLA fallback: recompute attention weights in query chunks under
  ``lax.scan`` (see :func:`_attention_bwd`), bounding live score memory
  without Pallas (also the CPU path).
* ``interpret`` — the Pallas backward under the Pallas interpreter (CPU
  correctness tests).

An optional additive ``bias`` of shape (batch, kv_len) masks keys; the
multi-view UNet uses it to exclude padded views from cross-view attention,
which is what makes single-launch batched CFG exact (see
``models/mv_attention.py``).
"""

from __future__ import annotations

import functools
import math
import os

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
    q_ref, k_ref, v_ref, *refs, scale: float, has_bias: bool,
    return_lse: bool,
):
    """Performance notes (measured on v5e at this model's shapes, head dims
    40-160): the kernel is bound by elementwise passes over the f32
    (block_q, block_k) scores tile, not by MXU rate — padding D to 128
    (3.2x the matmul FLOPs) measures the same time, while native-bf16
    matmul inputs at D=40 hit a catastrophic Mosaic path (20x slower), so
    inputs are upcast to f32 (also the reference's fp32-softmax guarantee,
    ``mvdream/attention.py:185-190``). Passes are minimized:

    * the softmax row-sum is folded into the PV matmul by augmenting V with
      a ones column — the accumulator's last column carries the alpha-
      corrected l recurrence for free (no separate sum pass, no l scratch);
    * the running max is tracked UNSCALED and the scale is fused into the
      single exp pass, ``p = exp(scale * (s - m))`` (no scale pass over s);
      with a bias it is pre-divided by scale outside the kernel so the same
      identity holds;
    * the bias input (and its add pass) is compiled out when no mask
      exists — the sequential-CFG sampling path runs maskless.
    """
    rest = list(refs)
    bias_ref = rest.pop(0) if has_bias else None
    if return_lse:
        o_ref, lse_ref, m_scr, acc_scr = rest
    else:
        o_ref, m_scr, acc_scr = rest
    k_idx = pl.program_id(2)

    @pl.when(k_idx == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (block_q, block_k) f32, unscaled
    if has_bias:
        # bias was pre-divided by scale, so scale*(s+bias') == scale*s + bias.
        s = s + bias_ref[0, 0].astype(jnp.float32)

    m_prev = m_scr[:]
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp((m_prev - m_new) * scale)
    p = jnp.exp((s - m_new) * scale)
    m_scr[:] = m_new
    # V is augmented with a ones column in VMEM; PV then yields
    # [acc | l] in one matmul. Note: a transposed accumulator
    # (acc = V^T P^T) was measured 3x SLOWER on v5e — keep P @ V.
    d = v_ref.shape[-1]
    v_aug = jnp.concatenate(
        [
            v_ref[0].astype(jnp.float32),
            jnp.ones((v_ref.shape[1], 1), jnp.float32),
        ],
        axis=-1,
    )
    acc_scr[:] = acc_scr[:] * alpha + jax.lax.dot_general(
        p, v_aug, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(k_idx == pl.num_programs(2) - 1)
    def _finalize():
        o_ref[0] = (acc_scr[:, :d] / acc_scr[:, d:]).astype(o_ref.dtype)
        if return_lse:
            # m is tracked UNSCALED (max over s [+ bias/scale]); the true
            # row logits are scale*s [+ bias], so lse = scale*m + log(l).
            lse_ref[0] = m_scr[:] * scale + jnp.log(acc_scr[:, d:])


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.partial(
    jax.jit,
    static_argnames=("scale", "block_q", "block_k", "interpret", "return_lse"),
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
    return_lse: bool = False,
) -> Array:
    """Pallas fused attention. q: (B, H, Lq, D); k/v: (B, H, Lk, D).

    Handles ragged lengths by padding to block multiples; padded keys get an
    additive NEG_INF bias, padded query rows are sliced off the output.

    With ``return_lse`` returns ``(out, lse)`` where lse is the f32 row
    log-sum-exp of the scaled-and-biased logits, shape (B, H, Lq, 1) — the
    statistic :func:`flash_attention_bwd` needs to rebuild probability tiles
    without a second softmax pass.
    """
    b, h, lq, d = q.shape
    lk = k.shape[2]
    if scale is None:
        scale = 1.0 / math.sqrt(d)

    # Large default blocks: at this model's head dims (40-160) each grid
    # program does little MXU work, so per-program overhead dominates with
    # small blocks (measured on v5e at L=5120, D=40: 256x512 blocks -> 11
    # TF/s, 1024x1024 -> 32 TF/s). Blocks clamp to the padded seq lengths.
    # Wide heads (the VAE's single 512-dim head) shrink the blocks to stay
    # inside the 16 MB scoped-VMEM budget (double-buffered q/k/v blocks +
    # f32 scores + the [acc|l] accumulator).
    if d > 128:
        block_q = min(block_q, 512)
        block_k = min(block_k, 512)
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
    if has_bias:
        # The kernel applies scale inside its single exp pass; pre-divide the
        # bias so scale*(s + bias/scale) reproduces scale*s + bias exactly.
        bias = bias.astype(jnp.float32) * (1.0 / scale)
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

    out_specs = pl.BlockSpec((1, block_q, d), lambda g, iq, ik: (g, iq, 0))
    out_shape = jax.ShapeDtypeStruct((bh, lq_pad, d), q.dtype)
    if return_lse:
        out_specs = (
            out_specs,
            pl.BlockSpec((1, block_q, 1), lambda g, iq, ik: (g, iq, 0)),
        )
        out_shape = (
            out_shape,
            jax.ShapeDtypeStruct((bh, lq_pad, 1), jnp.float32),
        )

    out = pl.pallas_call(
        functools.partial(
            _flash_kernel, scale=scale, has_bias=has_bias,
            return_lse=return_lse,
        ),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),       # running max m
            pltpu.VMEM((block_q, d + 1), jnp.float32),   # [acc | l]
        ],
        interpret=interpret,
    )(*operands)

    lse = None
    if return_lse:
        out, lse = out
        lse = lse.reshape(b, h, lq_pad, 1)
        if lq_pad != lq:
            lse = lse[:, :, :lq]
    out = out.reshape(b, h, lq_pad, d)
    if lq_pad != lq:
        out = out[:, :, :lq, :]
    if return_lse:
        return out, lse
    return out


def _flash_bwd_dq_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, *refs,
    scale: float, has_bias: bool,
):
    """dQ accumulation, keys innermost. Rebuilds the probability tile from
    (q, k, lse) — p = exp(scale*s + bias - lse) row-normalizes exactly, so no
    running softmax state is needed — then ds = p ⊙ (dp - delta) and
    dq += ds @ k, all in VMEM. delta = rowsum(dO ⊙ O) is precomputed in jnp
    (a D-wide reduction, negligible traffic)."""
    if has_bias:
        bias_ref, dq_ref, dq_acc = refs
    else:
        dq_ref, dq_acc = refs
    ik = pl.program_id(2)

    @pl.when(ik == 0)
    def _init():
        dq_acc[:] = jnp.zeros_like(dq_acc)

    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    if has_bias:
        s = s + bias_ref[0, 0].astype(jnp.float32)
    p = jnp.exp(s - lse_ref[0])
    do = do_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    ds = p * (dp - delta_ref[0])
    dq_acc[:] += jax.lax.dot_general(
        ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(ik == pl.num_programs(2) - 1)
    def _fin():
        dq_ref[0] = (dq_acc[:] * scale).astype(dq_ref.dtype)


def _flash_bwd_dkv_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, *refs,
    scale: float, has_bias: bool,
):
    """dK/dV (and dbias) accumulation, queries innermost. Same p/ds rebuild
    as the dQ kernel; dv += pᵀ dO and — reusing the forward's ones-column
    trick — dk_db += dsᵀ [q | 1], whose last column is the per-key dbias row
    sum for free (no separate reduction pass over the ds tile)."""
    if has_bias:
        bias_ref, dk_ref, dv_ref, db_ref, dk_acc, dv_acc = refs
    else:
        dk_ref, dv_ref, dk_acc, dv_acc = refs
    iq = pl.program_id(2)

    @pl.when(iq == 0)
    def _init():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    if has_bias:
        s = s + bias_ref[0, 0].astype(jnp.float32)
    p = jnp.exp(s - lse_ref[0])
    do = do_ref[0].astype(jnp.float32)
    dv_acc[:] += jax.lax.dot_general(
        p, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    v = v_ref[0].astype(jnp.float32)
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    ds = p * (dp - delta_ref[0])
    if has_bias:
        q_in = jnp.concatenate(
            [q, jnp.ones((q.shape[0], 1), jnp.float32)], axis=-1
        )
    else:
        q_in = q
    dk_acc[:] += jax.lax.dot_general(
        ds, q_in, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(iq == pl.num_programs(2) - 1)
    def _fin():
        d = v_ref.shape[-1]
        dk_ref[0] = (dk_acc[:, :d] * scale).astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[:].astype(dv_ref.dtype)
        if has_bias:
            db_ref[0] = dk_acc[:, d:]  # dbias is unscaled: d(logits)/d(bias)=1


def flash_attention_bwd(
    q: Array,
    k: Array,
    v: Array,
    bias: Array | None,
    out: Array,
    lse: Array,
    g: Array,
    scale: float,
    block_q: int = 512,
    block_k: int = 1024,
    interpret: bool = False,
):
    """Pallas attention backward from forward residuals (out, lse).

    Returns ``(dq, dk, dv, dbias)``; dbias is None when ``bias`` is None,
    else f32 (B, 1, Lk, 1) summed over heads and query rows (4-D so a single
    leading-batch shard_map out_spec covers every output — see
    ``parallel.tp.run_manual``).

    Padding contract (mirrors :func:`flash_attention`): padded KEYS are
    masked by a NEG_INF bias column → p = 0 → zero dk/dv/dbias rows, sliced
    off. Padded QUERY rows get dO = 0 and lse = +inf → p = exp(-inf) = 0 and
    ds = p·(0 - 0) = 0 (never inf·0), so they contribute nothing to dk/dv
    and their dq rows are sliced off.
    """
    b, h, lq, d = q.shape
    lk = k.shape[2]
    needs_dbias = bias is not None
    bias_dtype = None if bias is None else bias.dtype

    # Same VMEM-pressure clamp as the forward, tighter: the backward keeps
    # three f32 (block_q, block_k) tiles (s/p, dp, ds) live per program.
    if d > 128:
        block_q = min(block_q, 256)
        block_k = min(block_k, 512)
    block_q = min(block_q, _round_up(lq, 128))
    block_k = min(block_k, _round_up(lk, 128))
    lq_pad = _round_up(lq, block_q)
    lk_pad = _round_up(lk, block_k)

    if bias is None and lk_pad != lk:
        bias = jnp.zeros((b, lk), dtype=jnp.float32)
    has_bias = bias is not None
    if has_bias:
        if lk_pad != lk:
            bias = jnp.pad(
                bias, ((0, 0), (0, lk_pad - lk)), constant_values=NEG_INF
            )
        # TRUE bias here (the forward pre-divides by scale; the backward
        # kernels apply scale to s before adding, so no pre-divide).
        bias = bias.astype(jnp.float32)

    delta = jnp.sum(out.astype(jnp.float32) * g.astype(jnp.float32), axis=-1)
    lse_v = lse.astype(jnp.float32).reshape(b, h, lq)

    if lq_pad != lq:
        pq = lq_pad - lq
        q = jnp.pad(q, ((0, 0), (0, 0), (0, pq), (0, 0)))
        g = jnp.pad(g, ((0, 0), (0, 0), (0, pq), (0, 0)))
        delta = jnp.pad(delta, ((0, 0), (0, 0), (0, pq)))
        lse_v = jnp.pad(
            lse_v, ((0, 0), (0, 0), (0, pq)), constant_values=float("inf")
        )
    if lk_pad != lk:
        pk = lk_pad - lk
        k = jnp.pad(k, ((0, 0), (0, 0), (0, pk), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, pk), (0, 0)))

    bh = b * h
    qr = q.reshape(bh, lq_pad, d)
    kr = k.reshape(bh, lk_pad, d)
    vr = v.reshape(bh, lk_pad, d)
    gr = g.reshape(bh, lq_pad, d)
    lse_r = lse_v.reshape(bh, lq_pad, 1)
    delta_r = delta.reshape(bh, lq_pad, 1)
    bias_r = None if not has_bias else bias.reshape(b, 1, lk_pad)

    nq = lq_pad // block_q
    nk = lk_pad // block_k
    operands = [qr, kr, vr, gr, lse_r, delta_r]
    if has_bias:
        operands.append(bias_r)

    # ---- dQ: grid (bh, q blocks, k blocks), keys innermost -------------
    in_specs = [
        pl.BlockSpec((1, block_q, d), lambda gi, iq, ik: (gi, iq, 0)),
        pl.BlockSpec((1, block_k, d), lambda gi, iq, ik: (gi, ik, 0)),
        pl.BlockSpec((1, block_k, d), lambda gi, iq, ik: (gi, ik, 0)),
        pl.BlockSpec((1, block_q, d), lambda gi, iq, ik: (gi, iq, 0)),
        pl.BlockSpec((1, block_q, 1), lambda gi, iq, ik: (gi, iq, 0)),
        pl.BlockSpec((1, block_q, 1), lambda gi, iq, ik: (gi, iq, 0)),
    ]
    if has_bias:
        in_specs.append(
            pl.BlockSpec((1, 1, block_k), lambda gi, iq, ik: (gi // h, 0, ik))
        )
    dq = pl.pallas_call(
        functools.partial(
            _flash_bwd_dq_kernel, scale=scale, has_bias=has_bias
        ),
        grid=(bh, nq, nk),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, block_q, d), lambda gi, iq, ik: (gi, iq, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, lq_pad, d), q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        interpret=interpret,
    )(*operands)

    # ---- dK/dV/dbias: grid (bh, k blocks, q blocks), queries innermost --
    in_specs = [
        pl.BlockSpec((1, block_q, d), lambda gi, ik, iq: (gi, iq, 0)),
        pl.BlockSpec((1, block_k, d), lambda gi, ik, iq: (gi, ik, 0)),
        pl.BlockSpec((1, block_k, d), lambda gi, ik, iq: (gi, ik, 0)),
        pl.BlockSpec((1, block_q, d), lambda gi, ik, iq: (gi, iq, 0)),
        pl.BlockSpec((1, block_q, 1), lambda gi, ik, iq: (gi, iq, 0)),
        pl.BlockSpec((1, block_q, 1), lambda gi, ik, iq: (gi, iq, 0)),
    ]
    out_specs = [
        pl.BlockSpec((1, block_k, d), lambda gi, ik, iq: (gi, ik, 0)),
        pl.BlockSpec((1, block_k, d), lambda gi, ik, iq: (gi, ik, 0)),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((bh, lk_pad, d), k.dtype),
        jax.ShapeDtypeStruct((bh, lk_pad, d), v.dtype),
    ]
    if has_bias:
        in_specs.append(
            pl.BlockSpec((1, 1, block_k), lambda gi, ik, iq: (gi // h, 0, ik))
        )
        out_specs.append(
            pl.BlockSpec((1, block_k, 1), lambda gi, ik, iq: (gi, ik, 0))
        )
        out_shape.append(jax.ShapeDtypeStruct((bh, lk_pad, 1), jnp.float32))
    outs = pl.pallas_call(
        functools.partial(
            _flash_bwd_dkv_kernel, scale=scale, has_bias=has_bias
        ),
        grid=(bh, nk, nq),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=[
            pltpu.VMEM((block_k, d + 1 if has_bias else d), jnp.float32),
            pltpu.VMEM((block_k, d), jnp.float32),
        ],
        interpret=interpret,
    )(*operands)
    dk, dv = outs[0], outs[1]

    dq = dq.reshape(b, h, lq_pad, d)[:, :, :lq]
    dk = dk.reshape(b, h, lk_pad, d)[:, :, :lk]
    dv = dv.reshape(b, h, lk_pad, d)[:, :, :lk]
    db = None
    if needs_dbias:
        db_bh = outs[2].reshape(b, h, lk_pad, 1)[:, :, :lk]
        db = jnp.sum(db_bh, axis=1, keepdims=True).astype(bias_dtype)
    return dq, dk, dv, db


def _flash_bwd_mode() -> str:
    """'1' (Pallas backward on TPU — the default; chip-qualified at 32.1x
    the XLA chunked backward on the joint cross-view shape and >=1.6x on
    every UNet attention shape, rel_err <= 0.5% vs the f32 reference, see
    tools/qualify_flash_bwd.py), '0' (XLA chunked), 'interpret' (Pallas
    backward under the interpreter — CPU correctness tests). On CPU the
    '1' default falls through to the XLA path via :func:`_use_pallas`."""
    return os.environ.get("MVLDM_FLASH_BWD", "1")


def _use_pallas() -> bool:
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:
        return False


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _attention_prim(q, k, v, bias, scale):
    # Under a published device mesh the forward MUST run inside a shard_map
    # (Mosaic custom calls cannot be auto-partitioned by XLA SPMD — the
    # lowering hard-fails on multi-device jit); run_manual shards the batch
    # dim as finely as divisibility allows and is a direct call otherwise.
    # The XLA path is wrapped too so the CPU mesh tests exercise the same
    # partitioning the TPU path gets. See parallel/tp.py.
    from ..parallel.tp import run_manual

    base = flash_attention if _use_pallas() else mha_reference
    if bias is None:
        return run_manual(
            lambda q_, k_, v_: base(q_, k_, v_, None, scale=scale),
            batched=(q, k, v),
        )
    return run_manual(
        lambda q_, k_, v_, b_: base(q_, k_, v_, b_, scale=scale),
        batched=(q, k, v, bias),
    )


def _attention_fwd(q, k, v, bias, scale):
    """VJP forward. In Pallas-backward mode the forward additionally emits
    the row log-sum-exp and saves (out, lse) residuals (FlashAttention-2
    bookkeeping); otherwise residuals carry None placeholders and the
    backward takes the XLA chunked path."""
    from ..parallel.tp import run_manual

    mode = _flash_bwd_mode()
    use_pallas_bwd = mode == "interpret" or (mode == "1" and _use_pallas())
    if not use_pallas_bwd:
        return _attention_prim(q, k, v, bias, scale), (q, k, v, bias, None, None)

    interp = mode == "interpret"
    if bias is None:
        out, lse = run_manual(
            lambda q_, k_, v_: flash_attention(
                q_, k_, v_, None, scale=scale, return_lse=True,
                interpret=interp,
            ),
            batched=(q, k, v),
        )
    else:
        out, lse = run_manual(
            lambda q_, k_, v_, b_: flash_attention(
                q_, k_, v_, b_, scale=scale, return_lse=True,
                interpret=interp,
            ),
            batched=(q, k, v, bias),
        )
    return out, (q, k, v, bias, out, lse)


# Query rows per backward chunk. 1024 bounds the live score tiles to
# (B, H, 1024, Lk) f32 — ~170 MB/batch-row at the joint cross-view training
# shape — while each chunk's matmuls stay MXU-sized.
_BWD_CHUNK = 1024


def _attention_bwd(scale, res, g):
    """Attention backward. With (out, lse) residuals present (Pallas mode,
    see :func:`_attention_fwd`) dispatch to :func:`flash_attention_bwd`
    under ``run_manual``; otherwise run the XLA query-chunked analytic
    backward below (fp32, exact).

    A naive backward materializes four (B, H, Lq, Lk) f32 score tensors —
    ~840 MB each per batch row at the joint cross-view training shape
    (H=8, L=5*1024), which is both an HBM-bandwidth sink and the single-chip
    OOM cliff at train batch >= 4. Chunking the queries under ``lax.scan``
    bounds live score memory to one (B, H, _BWD_CHUNK, Lk) tile per array
    while computing identical gradients (softmax statistics are per-row, so
    query chunking is exact; dk/dv accumulate across chunks in f32).
    """
    q, k, v, bias, out, lse = res
    if out is not None:
        from ..parallel.tp import run_manual

        interp = _flash_bwd_mode() == "interpret"
        if bias is None:
            def body(q_, k_, v_, o_, l_, g_):
                dq_, dk_, dv_, _ = flash_attention_bwd(
                    q_, k_, v_, None, o_, l_, g_, scale, interpret=interp
                )
                return dq_, dk_, dv_

            dq, dk, dv = run_manual(body, batched=(q, k, v, out, lse, g))
            return dq, dk, dv, None

        def body(q_, k_, v_, b_, o_, l_, g_):
            return flash_attention_bwd(
                q_, k_, v_, b_, o_, l_, g_, scale, interpret=interp
            )

        dq, dk, dv, db = run_manual(
            body, batched=(q, k, v, bias, out, lse, g)
        )
        return dq, dk, dv, db[:, 0, :, 0]
    b, h, lq, d = q.shape
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    bf = None if bias is None else bias.astype(jnp.float32)[:, None, None, :]

    def chunk_grads(q_c, g_c, dk, dv, db):
        """Gradients from one query chunk; accumulates dk/dv/dbias."""
        s = jnp.einsum(
            "bhqd,bhkd->bhqk", q_c, kf, preferred_element_type=jnp.float32
        ) * scale
        if bf is not None:
            s = s + bf
        p = jax.nn.softmax(s, axis=-1)
        dv = dv + jnp.einsum("bhqk,bhqd->bhkd", p, g_c)
        dp = jnp.einsum("bhqd,bhkd->bhqk", g_c, vf)
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        dq_c = jnp.einsum("bhqk,bhkd->bhqd", ds, kf) * scale
        dk = dk + jnp.einsum("bhqk,bhqd->bhkd", ds, q_c) * scale
        if db is not None:
            db = db + jnp.sum(ds, axis=(1, 2))
        return dq_c, dk, dv, db

    qf = q.astype(jnp.float32)
    gf = g.astype(jnp.float32)
    dk0 = jnp.zeros(k.shape, jnp.float32)
    dv0 = jnp.zeros(v.shape, jnp.float32)
    db0 = None if bias is None else jnp.zeros(bias.shape, jnp.float32)

    n = -(-lq // _BWD_CHUNK)
    if n == 1:
        dq, dk, dv, db = chunk_grads(qf, gf, dk0, dv0, db0)
    else:
        # Zero-pad queries to a whole number of chunks: zero-gradient rows
        # contribute nothing to dk/dv/dbias (dp == 0 -> ds == 0) and their
        # dq rows are sliced off below.
        pad = n * _BWD_CHUNK - lq
        if pad:
            qf = jnp.pad(qf, ((0, 0), (0, 0), (0, pad), (0, 0)))
            gf = jnp.pad(gf, ((0, 0), (0, 0), (0, pad), (0, 0)))
        qcs = qf.reshape(b, h, n, _BWD_CHUNK, d).transpose(2, 0, 1, 3, 4)
        gcs = gf.reshape(b, h, n, _BWD_CHUNK, d).transpose(2, 0, 1, 3, 4)

        def body(carry, inp):
            dk, dv, db = carry
            dq_c, dk, dv, db = chunk_grads(inp[0], inp[1], dk, dv, db)
            return (dk, dv, db), dq_c

        (dk, dv, db), dqs = jax.lax.scan(body, (dk0, dv0, db0), (qcs, gcs))
        dq = dqs.transpose(1, 2, 0, 3, 4).reshape(b, h, n * _BWD_CHUNK, d)
        dq = dq[:, :, :lq]

    dbias = None if bias is None else db.astype(bias.dtype)
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
