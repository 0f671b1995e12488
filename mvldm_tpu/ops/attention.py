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
forward is usable in training. The backward recomputes attention weights in
query chunks under ``lax.scan`` (see :func:`_attention_bwd`), so no full L×L
score tensor is ever materialized in either direction.

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
    if has_bias:
        bias_ref, o_ref, m_scr, acc_scr = refs
    else:
        o_ref, m_scr, acc_scr = refs
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

    out = pl.pallas_call(
        functools.partial(_flash_kernel, scale=scale, has_bias=has_bias),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, block_q, d), lambda g, iq, ik: (g, iq, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, lq_pad, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),       # running max m
            pltpu.VMEM((block_q, d + 1), jnp.float32),   # [acc | l]
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
    return _attention_prim(q, k, v, bias, scale), (q, k, v, bias)


# Query rows per backward chunk. 1024 bounds the live score tiles to
# (B, H, 1024, Lk) f32 — ~170 MB/batch-row at the joint cross-view training
# shape — while each chunk's matmuls stay MXU-sized.
_BWD_CHUNK = 1024


def _attention_bwd(scale, res, g):
    """Query-chunked analytic attention backward (fp32, exact).

    A naive backward materializes four (B, H, Lq, Lk) f32 score tensors —
    ~840 MB each per batch row at the joint cross-view training shape
    (H=8, L=5*1024), which is both an HBM-bandwidth sink and the single-chip
    OOM cliff at train batch >= 4. Chunking the queries under ``lax.scan``
    bounds live score memory to one (B, H, _BWD_CHUNK, Lk) tile per array
    while computing identical gradients (softmax statistics are per-row, so
    query chunking is exact; dk/dv accumulate across chunks in f32).
    """
    q, k, v, bias = res
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
