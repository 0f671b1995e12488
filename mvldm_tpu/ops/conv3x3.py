"""Pallas 3x3 stride-1 SAME convolution for TPU (NHWC).

XLA's conv lowering leaves large-spatial / lane-aligned-channel shapes well
under the MXU rate: the VAE decoder's (N, 256, 256, 128) stage measures
79 TF/s and the (N, 128, 128, 256+) stages ~133 TF/s on the bench chip
(tools/bench_conv_micro.py), against a ~290 TF/s bf16 practical matmul
ceiling — and at 16.8 MB of input the op is compute-bound, so the gap is
pure lowering slack. This kernel recovers it by computing the convolution
as nine shifted matmuls accumulated in VMEM:

    out[n, y, x, :] = bias + sum_{dy,dx} x_pad[n, y+dy, x+dx, :] @ w[dy, dx]

Halo handling via overlapping `pl.Element` row bands: the padded input is
a single BlockSpec operand whose row dimension is indexed in ELEMENTS
(``pl.Element(bh + 2)``, start ``hi * bh``), so consecutive grid steps
fetch (bh+2)-row bands that overlap by the 2 halo rows — Pallas's standard
pipelining double-buffers the fetches, no manual DMA and no materialized
shifted copies. The dy row shifts and dx column shifts are static slices
of the in-VMEM band. Each band's nine (bh*W, Cin) @ (Cin, Cout) matmuls
accumulate into one f32 register tile, so HBM sees ~one read of x
((bh+2)/bh including halos) and one write of out. (A first version fed
three row-shifted padded COPIES as separate non-overlapping operands;
on-chip it lost to XLA's conv lowering (0.74x) because materializing and
re-reading 3x the input made it bandwidth-bound.)

Scope: stride 1, SAME padding, 3x3, lane-aligned channels
(Cin % 128 == Cout % 128 == 0) — the VAE's hot resnet convs. Everything
else (RGB stems, stride-2 downsamples, upsample convs) stays on XLA's
lowering, which is already at or near its ceiling for those shapes.
Replaces the conv backend the reference gets from cuDNN via torch
(``src/model/autoencoder/autoencoder_kl.py``; diffusers VAE resnets).

Differentiable: the VJP recomputes through ``lax.conv_general_dilated``
(the VAE is frozen in this pipeline, so the backward is a correctness
fallback, not a hot path).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl

# Opt-in until the kernel has been Mosaic-validated on real hardware in
# this environment (the sublane-offset dx slices are the risk point);
# the XLA fallback is numerically identical. Set MVLDM_PALLAS_CONV=1 to
# enable on TPU; flip the default after an on-chip parity + perf run.
PALLAS_CONV_ENABLED = os.environ.get("MVLDM_PALLAS_CONV", "0") == "1"

LANE = 128
# Scoped-VMEM budget check: double-buffered row bands + weights + f32
# accumulator must stay inside ~16 MB (see _vmem_bytes).
VMEM_BUDGET = 14 * 1024 * 1024


def _conv_kernel(x_ref, w_ref, b_ref, o_ref):
    """One (1, bh, W, Cout) output band. x_ref: (1, bh+2, W+2, Cin) halo
    band of the padded input; w_ref: (9, Cin, Cout); b_ref: (1, Cout)."""
    wp, cin = x_ref.shape[2], x_ref.shape[3]
    w = wp - 2
    bh = o_ref.shape[1]
    cout = o_ref.shape[3]

    acc = jnp.zeros((bh, w, cout), jnp.float32)
    xb = x_ref[0]  # (bh+2, W+2, Cin)
    for dy in range(3):
        for dx in range(3):
            xs = xb[dy:dy + bh, dx:dx + w, :]
            acc = acc + jax.lax.dot_general(
                xs, w_ref[dy * 3 + dx],
                (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    o_ref[0] = (acc + b_ref[0].astype(jnp.float32)).astype(o_ref.dtype)


def _vmem_bytes(bh: int, w: int, cin: int, cout: int, itemsize: int) -> int:
    bands = (bh + 2) * (w + 2) * cin * itemsize * 2  # double-buffered
    weights = 9 * cin * cout * itemsize
    acc = bh * w * cout * 4
    out = bh * w * cout * itemsize * 2
    return bands + weights + acc + out


def _pick_band(h: int, w: int, cin: int, cout: int, itemsize: int) -> int:
    """Largest power-of-two row band that divides H and fits VMEM."""
    bh = min(16, h)
    while bh > 1 and (
        h % bh != 0 or _vmem_bytes(bh, w, cin, cout, itemsize) > VMEM_BUDGET
    ):
        bh //= 2
    return bh


def supported(x_shape, cin: int, cout: int, dtype) -> bool:
    """Shape gate for the Pallas path (see module docstring)."""
    n, h, w, _ = x_shape
    if cin % LANE or cout % LANE or h < 8 or w < 8:
        return False
    itemsize = jnp.dtype(dtype).itemsize
    bh = _pick_band(h, w, cin, cout, itemsize)
    return bh >= 2 and h % bh == 0 and _vmem_bytes(
        bh, w, cin, cout, itemsize
    ) <= VMEM_BUDGET


@functools.partial(jax.jit, static_argnames=("interpret",))
def _conv3x3_pallas(x: Array, w: Array, b: Array, interpret: bool = False):
    n, h, wd, cin = x.shape
    cout = w.shape[-1]
    itemsize = jnp.dtype(x.dtype).itemsize
    bh = _pick_band(h, wd, cin, cout, itemsize)

    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    w9 = w.reshape(9, cin, cout)

    # Overlapping (bh+2)-row halo bands of the single padded array: the row
    # dimension is indexed in elements (start hi*bh), so band hi covers
    # padded rows [hi*bh, hi*bh + bh + 2) and adjacent bands share the two
    # halo rows. The final band ends at (h//bh - 1)*bh + bh + 2 = h + 2,
    # exactly the padded height — never out of bounds.
    # Mosaic requires every dim of an Element-indexed spec to be Element;
    # the index_map therefore returns ELEMENT offsets for all four dims.
    band_spec = pl.BlockSpec(
        (
            pl.Element(1),
            pl.Element(bh + 2),
            pl.Element(wd + 2),
            pl.Element(cin),
        ),
        lambda ni, hi: (ni, hi * bh, 0, 0),
    )
    return pl.pallas_call(
        _conv_kernel,
        grid=(n, h // bh),
        in_specs=[
            band_spec,
            pl.BlockSpec((9, cin, cout), lambda ni, hi: (0, 0, 0)),
            pl.BlockSpec((1, cout), lambda ni, hi: (0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, bh, wd, cout), lambda ni, hi: (ni, hi, 0, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((n, h, wd, cout), x.dtype),
        interpret=interpret,
    )(xp, w9, b.reshape(1, cout))


def _conv3x3_xla(x: Array, w: Array, b: Array) -> Array:
    out = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    return (out + b.astype(jnp.float32)).astype(x.dtype)


def _use_pallas(x_shape, cout: int, dtype) -> bool:
    """Dispatch gate, separated so the qualification harness
    (tools/qualify_pallas_conv.py) can exercise the Pallas branch in
    interpret mode on CPU. Reads PALLAS_CONV_ENABLED dynamically: bench.py
    flips it at runtime after on-chip qualification."""
    return (
        PALLAS_CONV_ENABLED
        and jax.default_backend() not in ("cpu",)
        and supported(x_shape, x_shape[-1], cout, dtype)
    )


@jax.custom_vjp
def _conv_prim(x, w, b):
    # run_manual: under a published mesh the Pallas forward must live in a
    # shard_map (Mosaic kernels cannot be auto-partitioned); the frame batch
    # shards over the mesh when divisible. Direct call when no mesh is
    # active. See parallel/tp.py.
    from ..parallel.tp import run_manual

    if _use_pallas(x.shape, w.shape[-1], x.dtype):
        fn = lambda x_, w_, b_: _conv3x3_pallas(x_, w_.astype(x_.dtype), b_)
    else:
        fn = _conv3x3_xla
    return run_manual(fn, batched=(x,), replicated=(w, b))


def _conv_fwd(x, w, b):
    return _conv_prim(x, w, b), (x, w, b)


def _conv_bwd(res, g):
    x, w, b = res
    _, vjp = jax.vjp(_conv3x3_xla, x, w, b)
    return vjp(g)


_conv_prim.defvjp(_conv_fwd, _conv_bwd)


def conv3x3(x: Array, w: Array, b: Array) -> Array:
    """3x3 stride-1 SAME conv. x: (N, H, W, Cin); w: (3, 3, Cin, Cout);
    b: (Cout,). Pallas on TPU for lane-aligned channels, XLA otherwise."""
    assert w.shape[:2] == (3, 3), w.shape
    return _conv_prim(x, w, b)
