"""Honest (dependency-chained) timing of the UNet's hot convolutions.

The tunneled bench chip over-reports completion for independent launches;
this probe chains data-dependent applications and measures the slope
between two chain lengths (see tools/bench_attn_micro.py).

Shapes: SD2.1 UNet at 32x32 latents, fill batch 16 x 5 views = 80 frames:
3x3 convs at (80, 32, 32, 320), (80, 16, 16, 640), (80, 8, 8, 1280),
plus the VAE decoder's (N, 256, 256, 128) stages.
"""

from __future__ import annotations

import functools
import statistics
import time

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


def conv_probe(n, hw, cin, cout, ksize=3, dtype=jnp.bfloat16, label=""):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((n, hw, hw, cin)) * 0.1, dtype)
    w = jnp.asarray(
        rng.standard_normal((ksize, ksize, cin, cout)) * 0.01, dtype)

    def f(x, w):
        out = jax.lax.conv_general_dilated(
            x, w, window_strides=(1, 1), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        )
        # Keep the chain shape-stable: cast back and (if cout != cin)
        # project back cheaply by slicing/tiling.
        out = out.astype(x.dtype)
        if cout == cin:
            return out
        if cout > cin:
            return out[..., :cin]
        reps = cin // cout
        return jnp.tile(out, (1, 1, 1, reps))

    t = timeit(f, x, w)
    flops = 2 * n * hw * hw * ksize * ksize * cin * cout
    print(f"  conv {n}x{hw}x{hw}x{cin}->{cout} k{ksize} "
          f"{jnp.dtype(dtype).name} {label}: {t*1e3:.3f} ms  "
          f"{flops/t/1e12:.1f} TF/s")
    return t


def pallas_conv_probe(n, hw, cin, cout, dtype=jnp.bfloat16):
    """ops.conv3x3 Pallas kernel vs the XLA lowering at the same shape."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).parent.parent))
    from mvldm_tpu.ops.conv3x3 import _conv3x3_pallas, supported

    if not supported((n, hw, hw, cin), cin, cout, dtype):
        print(f"  pallas conv {n}x{hw}x{hw}x{cin}->{cout}: unsupported shape")
        return
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((n, hw, hw, cin)) * 0.1, dtype)
    w = jnp.asarray(rng.standard_normal((3, 3, cin, cout)) * 0.01, dtype)
    b = jnp.zeros((cout,), dtype)

    def f(x, w, b):
        out = _conv3x3_pallas(x, w, b)
        if cout == cin:
            return out
        if cout > cin:
            return out[..., :cin]
        return jnp.tile(out, (1, 1, 1, cin // cout))

    t = timeit(f, x, w, b)
    flops = 2 * n * hw * hw * 9 * cin * cout
    print(f"  pallas conv {n}x{hw}x{hw}x{cin}->{cout} "
          f"{jnp.dtype(dtype).name}: {t*1e3:.3f} ms  {flops/t/1e12:.1f} TF/s")
    return t


def matmul_xla_probe(m, k, n, dtype=jnp.bfloat16):
    """XLA (non-Pallas) matmul rate for comparison; n == k for chaining."""
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal((m, k)) * 0.1, dtype)
    b = jnp.asarray(rng.standard_normal((k, n)) * 0.01, dtype)

    def f(a, b):
        return jnp.dot(a, b, preferred_element_type=jnp.float32).astype(
            a.dtype)[:, :k]

    t = timeit(f, a, b)
    print(f"  xla matmul {m}x{k}x{n} {jnp.dtype(dtype).name}: "
          f"{t*1e3:.3f} ms  {2*m*k*n/t/1e12:.1f} TF/s")
    return t


if __name__ == "__main__":
    import sys
    sections = set(sys.argv[1:]) or {"conv", "xmm"}
    print(f"backend: {jax.default_backend()}, device: {jax.devices()[0]}")

    if "xmm" in sections:
        print("\nXLA matmul reference rates:")
        matmul_xla_probe(8192, 2048, 2048)
        matmul_xla_probe(81920, 320, 320)
        matmul_xla_probe(81920, 2880, 2880)

    if "conv1" in sections or "conv" in sections:
        print("\nUNet hot convs (bf16, f32 accum):")
        conv_probe(80, 32, 320, 320)
    if "conv2" in sections or "conv" in sections:
        conv_probe(80, 16, 640, 640)
        conv_probe(80, 8, 1280, 1280)
    if "conv3" in sections or "conv" in sections:
        print("\nVAE decoder convs:")
        conv_probe(4, 256, 128, 128)
        conv_probe(4, 128, 256, 256)
    if "pallas" in sections:
        print("\nPallas conv3x3 vs XLA (VAE decoder shapes):")
        pallas_conv_probe(4, 256, 128, 128)
        pallas_conv_probe(4, 256, 256, 128)
        pallas_conv_probe(4, 128, 256, 256)
        pallas_conv_probe(4, 128, 512, 256)
        pallas_conv_probe(4, 64, 512, 512)
        pallas_conv_probe(4, 32, 512, 512)
        pallas_conv_probe(80, 32, 320, 320)
