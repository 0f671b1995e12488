"""Microbenchmark: where does the flash-attention time go at the model's
cross-view shapes, and what do the MXU paths cost?

Run on the real TPU chip:  python tools/bench_attn_micro.py

Shapes: the joint cross-view attention (reference
``src/model/denoiser/mvdream/attention.py:362-365``) runs at
(b, h=8, L=v*hw, D=C/8) for C in {320, 640, 1280} and v~5; the per-frame
attention at L=hw. The fill phase batches b=16 rows.
"""

from __future__ import annotations

import functools
import math
import statistics
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timeit(fn, *args, reps=5, warmup=2, chains=(4, 44)):
    """Time fn on the tunneled bench chip, where both per-launch wall timing
    and block_until_ready under-report. Strategy: run a data-dependent chain
    of N applications inside one jit (defeats overlap/CSE), force a real
    device->host round-trip by fetching a scalar sum of the result, and
    measure at two chain lengths — the slope (t2-t1)/(n2-n1) cancels the
    constant tunnel RTT + dispatch + sum overhead. fn's output must have
    arg[0]'s shape (it is fed back as the first argument)."""

    def make(chain):
        @jax.jit
        def chained(first, *rest):
            def body(_, x):
                return fn(x, *rest)
            out = jax.lax.fori_loop(0, chain, body, first)
            return jnp.sum(out.astype(jnp.float32))
        return chained

    med = []
    for chain in chains:
        chained = make(chain)
        for _ in range(warmup):
            np.asarray(chained(*args))
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(chained(*args))
            ts.append(time.perf_counter() - t0)
        med.append(statistics.median(ts))
    return (med[1] - med[0]) / (chains[1] - chains[0])


# ---------------------------------------------------------------- raw matmul
def matmul_probe(m, k, dtype, bm=256):
    """(m,k)@(k,k) rate, gridded over M inside the 16MB scoped VMEM.
    Square B and output-dtype==input-dtype so timeit can chain a=f(a,b)."""
    a = jnp.ones((m, k), dtype)
    b = jnp.ones((k, k), dtype)
    bm = min(bm, m)

    def kern(a_ref, b_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(
            a_ref[:], b_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(o_ref.dtype)

    def f(a, b):
        return pl.pallas_call(
            kern,
            grid=(m // bm,),
            in_specs=[
                pl.BlockSpec((bm, k), lambda i: (i, 0)),
                pl.BlockSpec((k, k), lambda i: (0, 0)),
            ],
            out_specs=pl.BlockSpec((bm, k), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((m, k), dtype),
        )(a, b)

    t = timeit(f, a, b)
    tf = 2 * m * k * k / t / 1e12
    print(f"  matmul {m}x{k}x{k} {dtype.__name__}: {t*1e3:.3f} ms  {tf:.1f} TF/s")
    return tf


# ---------------------------------------- full-K single-pass softmax kernel
def _fullk_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, do_max, split_d):
    """One k block = the whole row: softmax computed exactly in one shot,
    no online-correction state. do_max=False drops the max-subtraction pass
    (numerically unsafe — headroom probe only)."""
    q = q_ref[0]
    k = k_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    if do_max == "none":
        # Pure matmul pair — isolates the MXU floor (wrong numerics).
        pv = jax.lax.dot_general(
            s.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[0] = (pv * scale).astype(o_ref.dtype)
        return
    if do_max:
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp((s - m) * scale)
    else:
        p = jnp.exp(s * scale)
    l = jnp.sum(p, axis=-1, keepdims=True)
    pv = jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0] = (pv / l).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "bq", "do_max"))
def fullk(q, k, v, scale, bq=256, do_max=True):
    b, h, lq, d = q.shape
    lk = k.shape[2]
    bq = min(bq, lq)
    bh = b * h
    q = q.reshape(bh, lq, d)
    k = k.reshape(bh, lk, d)
    v = v.reshape(bh, lk, d)
    out = pl.pallas_call(
        functools.partial(_fullk_kernel, scale=scale, do_max=do_max,
                          split_d=False),
        grid=(bh, lq // bq),
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda g, iq: (g, iq, 0)),
            pl.BlockSpec((1, lk, d), lambda g, iq: (g, 0, 0)),
            pl.BlockSpec((1, lk, d), lambda g, iq: (g, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bq, d), lambda g, iq: (g, iq, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, lq, d), q.dtype),
    )(q, k, v)
    return out.reshape(b, h, lq, d)


def fullk_probe(b, h, l, d, bq, do_max=True, label=""):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((b, h, l, d)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b, h, l, d)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, h, l, d)), jnp.bfloat16)
    scale = 1.0 / math.sqrt(d)
    t = timeit(functools.partial(fullk, scale=scale, bq=bq, do_max=do_max),
               q, k, v)
    useful = 4 * b * h * l * l * d
    print(f"  fullk b={b} h={h} L={l} D={d} bq={bq} max={do_max} {label}:"
          f" {t*1e3:.3f} ms  useful {useful/t/1e12:.1f} TF/s")
    return t


# ------------------------------------------------- flash variants (no bias)
NEG_INF = -1e30


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, m_scr, acc_scr, *, scale,
                  dot_dtype):
    k_idx = pl.program_id(2)

    @pl.when(k_idx == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0].astype(dot_dtype)
    k = k_ref[0].astype(dot_dtype)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    m_prev = m_scr[:]
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp((m_prev - m_new) * scale)
    p = jnp.exp((s - m_new) * scale)
    m_scr[:] = m_new
    d = v_ref.shape[-1]
    v_aug = jnp.concatenate(
        [v_ref[0].astype(jnp.float32),
         jnp.ones((v_ref.shape[1], 1), jnp.float32)], axis=-1
    ).astype(dot_dtype)
    acc_scr[:] = acc_scr[:] * alpha + jax.lax.dot_general(
        p.astype(dot_dtype), v_aug, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(k_idx == pl.num_programs(2) - 1)
    def _fin():
        o_ref[0] = (acc_scr[:, :d] / acc_scr[:, d:]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "bq", "bk", "dot_dtype"))
def flash(q, k, v, scale, bq=1024, bk=1024, dot_dtype=jnp.float32):
    b, h, lq, d = q.shape
    lk = k.shape[2]
    bq = min(bq, lq)
    bk = min(bk, lk)
    bh = b * h
    q = q.reshape(bh, lq, d)
    k = k.reshape(bh, lk, d)
    v = v.reshape(bh, lk, d)
    grid = (bh, lq // bq, lk // bk)
    out = pl.pallas_call(
        functools.partial(_flash_kernel, scale=scale, dot_dtype=dot_dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda g, iq, ik: (g, iq, 0)),
            pl.BlockSpec((1, bk, d), lambda g, iq, ik: (g, ik, 0)),
            pl.BlockSpec((1, bk, d), lambda g, iq, ik: (g, ik, 0)),
        ],
        out_specs=pl.BlockSpec((1, bq, d), lambda g, iq, ik: (g, iq, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, lq, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, d + 1), jnp.float32),
        ],
    )(q, k, v)
    return out.reshape(b, h, lq, d)


def flash_probe(b, h, l, d, dot_dtype, pad_to=None, label=""):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((b, h, l, d)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b, h, l, d)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, h, l, d)), jnp.bfloat16)
    scale = 1.0 / math.sqrt(d)
    dp = d
    if pad_to and pad_to > d:
        pad = ((0, 0), (0, 0), (0, 0), (0, pad_to - d))
        q, k, v = jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad)
        dp = pad_to
    t = timeit(functools.partial(flash, scale=scale, dot_dtype=dot_dtype),
               q, k, v)
    useful = 4 * b * h * l * l * d
    padded = 4 * b * h * l * l * dp
    print(f"  flash b={b} h={h} L={l} D={d}->{dp} dot={dot_dtype.__name__}"
          f" {label}: {t*1e3:.3f} ms  useful {useful/t/1e12:.1f} TF/s"
          f"  padded-equiv {padded/t/1e12:.1f} TF/s")
    return t


# ----------------------------------------------------------- exp-only probe
def exp_probe(l):
    x = jnp.ones((l, l), jnp.float32)

    def kern(x_ref, o_ref):
        o_ref[:] = jnp.exp(x_ref[:])

    f = jax.jit(lambda x: pl.pallas_call(
        kern, out_shape=jax.ShapeDtypeStruct((l, l), jnp.float32))(x))
    t = timeit(f, x)
    print(f"  exp {l}x{l} f32 in-VMEM: {t*1e3:.3f} ms "
          f"({l*l/t/1e9:.1f} Gelem/s)")


if __name__ == "__main__":
    import sys
    sections = set(sys.argv[1:]) or {"matmul", "exp", "flash", "fullk"}
    print(f"backend: {jax.default_backend()}, device: {jax.devices()[0]}")

    if "matmul" in sections:
        print("\nraw Pallas matmul rates:")
        matmul_probe(4096, 1024, jnp.bfloat16)
        matmul_probe(4096, 1024, jnp.float32)
        matmul_probe(8192, 512, jnp.bfloat16)
        matmul_probe(8192, 512, jnp.float32)

    if "exp" in sections:
        print("\nexp throughput (scores-tile pass):")
        exp_probe(1024)

    if "flash" in sections:
        print("\nflash variants at the joint cross-view shapes (fill b=16):")
        for (b, h, l, d) in [(16, 8, 5120, 40), (16, 8, 1280, 80),
                             (16, 8, 320, 160)]:
            flash_probe(b, h, l, d, jnp.float32, label="(current)")
            flash_probe(b, h, l, d, jnp.bfloat16, label="(bf16 native D)")
            flash_probe(b, h, l, d, jnp.bfloat16, pad_to=128,
                        label="(bf16 pad128)")
        print("\nper-frame shape (b*v=80, L=1024):")
        flash_probe(80, 8, 1024, 40, jnp.float32, label="(current)")
        flash_probe(80, 8, 1024, 40, jnp.bfloat16, pad_to=128,
                    label="(bf16 pad128)")

    if "fullk" in sections:
        print("\nfull-K single-pass softmax variants:")
        for bq in (256, 512):
            fullk_probe(16, 8, 5120, 40, bq)
        fullk_probe(16, 8, 5120, 40, 256, do_max=False, label="(headroom)")
        fullk_probe(16, 8, 1280, 80, 512)
        fullk_probe(80, 8, 1024, 40, 512)
        fullk_probe(80, 8, 1024, 40, 1024)

    if "floor" in sections:
        print("\npure-matmul floor (no softmax):")
        fullk_probe(16, 8, 5120, 40, 256, do_max="none", label="(floor)")
        fullk_probe(16, 8, 5120, 40, 512, do_max="none", label="(floor)")
        fullk_probe(80, 8, 1024, 40, 512, do_max="none", label="(floor)")
        fullk_probe(16, 8, 1280, 80, 512, do_max="none", label="(floor)")
