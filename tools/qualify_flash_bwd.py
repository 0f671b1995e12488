"""Qualify the Pallas flash-attention backward on the real chip.

Decides MVLDM_FLASH_BWD's default (see ``ops/attention.py``): the Pallas
backward (FlashAttention-2 two-kernel rebuild, zero L×L HBM traffic) must
(a) match the XLA query-chunked backward's gradients and (b) beat it at the
model's training shapes. Run on the chip:

    python tools/qualify_flash_bwd.py

Shapes measured (SD2.1 UNet @ 256px, 5 views, reference
``mvdream/attention.py:362-365``):
  joint cross-view  (B, 8, 5·hw, C/8) with a view-mask bias, for the three
                    attention stages C∈{320, 640, 1280} (L = 5120/1280/320)
  per-frame         (B·5, 8, hw, C/8) maskless (the fused block's backward
                    differentiates through ops.attention too)

Timing: data-dependent chain of grad applications inside one jit (the
normalized dq feeds back as q), device→host scalar fetch at the end, two
chain lengths — the slope cancels tunnel RTT + dispatch (BENCHMARKS.md
"timing methodology").
"""

from __future__ import annotations

import json
import math
import os
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    str(Path(__file__).parent.parent / ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np


def make_inputs(key, b, h, l, d, with_bias, dtype=jnp.bfloat16):
    k1, k2, k3 = jax.random.split(key, 3)
    q = jax.random.normal(k1, (b, h, l, d), dtype=dtype)
    k = jax.random.normal(k2, (b, h, l, d), dtype=dtype)
    v = jax.random.normal(k3, (b, h, l, d), dtype=dtype)
    bias = None
    if with_bias:
        bias = jnp.zeros((b, l), jnp.float32)  # all-valid view mask (train)
    return q, k, v, bias


def build_grad(mode: str, bias_present: bool):
    """Trace a jitted chained-grad step under MVLDM_FLASH_BWD=mode.

    Separate closures per mode — the env var is read at trace time, so each
    mode needs its own jit cache entry.
    """
    from mvldm_tpu.ops.attention import attention

    os.environ["MVLDM_FLASH_BWD"] = mode

    def loss(q, k, v, bias):
        return jnp.sum(attention(q, k, v, bias).astype(jnp.float32) ** 2)

    grad = jax.grad(loss, argnums=(0, 1, 2))

    def chained(chain):
        @jax.jit
        def run(q, k, v, bias):
            def body(_, x):
                dq, _, _ = grad(x, k, v, bias)
                # renormalize so the chain neither explodes nor vanishes;
                # dq depends on x, so iterations cannot be CSE'd or hoisted
                scale = jax.lax.rsqrt(jnp.mean(dq.astype(jnp.float32) ** 2) + 1e-8)
                return (dq.astype(jnp.float32) * scale).astype(x.dtype)

            out = jax.lax.fori_loop(0, chain, body, q)
            return jnp.sum(out.astype(jnp.float32))

        return run

    def grads_once(q, k, v, bias):
        return jax.jit(grad)(q, k, v, bias)

    return chained, grads_once


def time_chained(make, q, k, v, bias, chains=(4, 24), reps=3):
    med = []
    for chain in chains:
        fn = make(chain)
        for _ in range(2):
            np.asarray(fn(q, k, v, bias))
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(fn(q, k, v, bias))
            ts.append(time.perf_counter() - t0)
        med.append(statistics.median(ts))
    return (med[1] - med[0]) / (chains[1] - chains[0])


def main():
    results = []
    cases = [
        # (label, b, h, l, d, with_bias)
        ("joint_c320_L5120", 8, 8, 5 * 1024, 40, True),
        ("joint_c640_L1280", 8, 8, 5 * 256, 80, True),
        ("joint_c1280_L320", 8, 8, 5 * 64, 160, True),
        ("frame_c320_L1024", 40, 8, 1024, 40, False),
    ]
    for label, b, h, l, d, with_bias in cases:
        q, k, v, bias = make_inputs(jax.random.PRNGKey(0), b, h, l, d, with_bias)

        # parity first: grads of both paths on identical inputs
        _, once_xla = build_grad("0", with_bias)
        gx = [np.asarray(x, dtype=np.float32) for x in once_xla(q, k, v, bias)]
        _, once_pl = build_grad("1", with_bias)
        gp = [np.asarray(x, dtype=np.float32) for x in once_pl(q, k, v, bias)]
        err = max(
            float(np.max(np.abs(a - b)) / (np.max(np.abs(a)) + 1e-9))
            for a, b in zip(gx, gp)
        )
        parity_ok = err < 5e-2  # bf16 inputs; both paths compute f32 inside

        make_xla, _ = build_grad("0", with_bias)
        t_xla = time_chained(make_xla, q, k, v, bias)
        make_pl, _ = build_grad("1", with_bias)
        t_pl = time_chained(make_pl, q, k, v, bias)

        rec = {
            "case": label,
            "shape": [b, h, l, d],
            "bias": with_bias,
            "rel_err": round(err, 5),
            "parity_ok": parity_ok,
            "xla_chunked_ms": round(t_xla * 1e3, 3),
            "pallas_flash_ms": round(t_pl * 1e3, 3),
            "speedup": round(t_xla / t_pl, 4),
        }
        print(json.dumps(rec), flush=True)
        results.append(rec)

    ok = all(r["parity_ok"] for r in results)
    # enable if the big joint shape wins and nothing regresses badly
    joint = results[0]["speedup"]
    worst = min(r["speedup"] for r in results)
    print(json.dumps({
        "verdict": {
            "parity": ok,
            "joint_speedup": joint,
            "worst_speedup": worst,
            "enable": bool(ok and joint > 1.05 and worst > 0.9),
        }
    }), flush=True)


if __name__ == "__main__":
    main()
