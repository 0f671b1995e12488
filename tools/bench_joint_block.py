"""How much of the joint cross-view attn1 sub-block is glue (LN,
projections, head transposes, residual) vs the flash attention itself?

Decides whether a fused joint-attn kernel (VERDICT #2) is worth building.
"""

from __future__ import annotations

import functools
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, reps=5, warmup=2, chains=(2, 12)):
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


def joint_block(x, ln_scale, ln_bias, wq, wk, wv, wo, bo, num_heads,
                head_dim):
    """The current decomposed joint attn1 path (mv_attention.py:84-95):
    f32 LN -> q/k/v projections -> head split -> flash -> merge -> out
    projection -> residual."""
    from mvldm_tpu.ops.attention import attention

    b, l, c = x.shape
    dtype = x.dtype
    h32 = x.astype(jnp.float32)
    mu = jnp.mean(h32, axis=-1, keepdims=True)
    var = jnp.var(h32, axis=-1, keepdims=True)
    h = ((h32 - mu) * jax.lax.rsqrt(var + 1e-5) * ln_scale + ln_bias).astype(
        dtype
    )
    inner = num_heads * head_dim
    q = jnp.dot(h, wq).reshape(b, l, num_heads, head_dim).transpose(0, 2, 1, 3)
    k = jnp.dot(h, wk).reshape(b, l, num_heads, head_dim).transpose(0, 2, 1, 3)
    v = jnp.dot(h, wv).reshape(b, l, num_heads, head_dim).transpose(0, 2, 1, 3)
    out = attention(q, k, v)
    out = out.transpose(0, 2, 1, 3).reshape(b, l, inner)
    return x + (jnp.dot(out, wo) + bo).astype(dtype)


def joint_block_qkv_concat(x, ln_scale, ln_bias, wq, wk, wv, wo, bo,
                           num_heads, head_dim):
    """Variant: one (C, 3C) projection matmul (wider N uses the MXU better
    than three narrow-N=C dots); weight concat is loop-invariant and
    hoisted by XLA."""
    from mvldm_tpu.ops.attention import attention

    b, l, c = x.shape
    dtype = x.dtype
    h32 = x.astype(jnp.float32)
    mu = jnp.mean(h32, axis=-1, keepdims=True)
    var = jnp.var(h32, axis=-1, keepdims=True)
    h = ((h32 - mu) * jax.lax.rsqrt(var + 1e-5) * ln_scale + ln_bias).astype(
        dtype
    )
    inner = num_heads * head_dim
    wqkv = jnp.concatenate([wq, wk, wv], axis=1)  # (C, 3*inner)
    qkv = jnp.dot(h, wqkv).reshape(b, l, 3, num_heads, head_dim)
    q = qkv[:, :, 0].transpose(0, 2, 1, 3)
    k = qkv[:, :, 1].transpose(0, 2, 1, 3)
    v = qkv[:, :, 2].transpose(0, 2, 1, 3)
    out = attention(q, k, v)
    out = out.transpose(0, 2, 1, 3).reshape(b, l, inner)
    return x + (jnp.dot(out, wo) + bo).astype(dtype)


def flash_only(q, k, v):
    from mvldm_tpu.ops.attention import attention

    return attention(q, k, v)


if __name__ == "__main__":
    print(f"backend: {jax.default_backend()}")
    rng = np.random.default_rng(0)
    B, V, HW, C, H = 16, 5, 1024, 320, 8
    D = C // H
    L = V * HW
    x = jnp.asarray(rng.standard_normal((B, L, C)) * 0.1, jnp.bfloat16)
    mk = lambda *s: jnp.asarray(rng.standard_normal(s) * 0.05, jnp.bfloat16)
    wq, wk, wv = mk(C, C), mk(C, C), mk(C, C)
    wo, bo = mk(C, C), mk(C)
    lns = jnp.ones((C,), jnp.float32)
    lnb = jnp.zeros((C,), jnp.float32)

    t_block = timeit(
        functools.partial(joint_block, num_heads=H, head_dim=D),
        x, lns, lnb, wq, wk, wv, wo, bo,
    )
    print(f"joint sub-block (B={B} L={L} C={C}): {t_block*1e3:.3f} ms")

    q = jnp.asarray(rng.standard_normal((B, H, L, D)) * 0.1, jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, H, L, D)) * 0.1, jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, H, L, D)) * 0.1, jnp.bfloat16)
    t_flash = timeit(flash_only, q, k, v)
    print(f"flash only:                      {t_flash*1e3:.3f} ms")
    print(f"glue: {(t_block-t_flash)*1e3:.3f} ms "
          f"({(t_block-t_flash)/t_block:.1%} of the sub-block)")

    t_cat = timeit(
        functools.partial(joint_block_qkv_concat, num_heads=H, head_dim=D),
        x, lns, lnb, wq, wk, wv, wo, bo,
    )
    print(f"qkv-concat variant:              {t_cat*1e3:.3f} ms "
          f"(delta {(t_block-t_cat)*1e3:+.3f} ms)")
