"""Differentiable line/point rendering in jnp.

Re-creates the reference's drawing library
(``src/visualization/drawing/{lines,points,rendering}.py``): anti-aliased
lines and points rendered via signed-distance falloff. Because the renderer
is a pure jnp distance-field composition, it is differentiable end-to-end
for free (the property the reference engineered with torch) and jit/vmap
friendly.

Coordinates are normalized (0..1, x right, y down) like the reference's
"relative" coordinate system (``drawing/coordinate_conversion.py``).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from jax import Array


def _pixel_grid(shape: Tuple[int, int]) -> Array:
    h, w = shape
    ys = (jnp.arange(h) + 0.5) / h
    xs = (jnp.arange(w) + 0.5) / w
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    return jnp.stack([gx, gy], axis=-1)  # (h, w, 2), xy order


def render_lines(
    image: Array,
    start: Array,
    end: Array,
    color: Array,
    width: float = 0.004,
) -> Array:
    """Composite anti-aliased line segments onto (h, w, 3).

    start/end: (n, 2) normalized xy; color: (n, 3) or (3,); width in
    normalized units. Differentiable w.r.t. endpoints and colors.
    """
    h, w, _ = image.shape
    grid = _pixel_grid((h, w))  # (h, w, 2)
    color = jnp.broadcast_to(jnp.asarray(color), (start.shape[0], 3))

    d = end - start  # (n, 2)
    norm2 = jnp.sum(d * d, axis=-1) + 1e-12
    # (h, w, n): projection parameter clamped to the segment.
    rel = grid[:, :, None, :] - start[None, None]  # (h, w, n, 2)
    t = jnp.clip(jnp.sum(rel * d[None, None], axis=-1) / norm2, 0.0, 1.0)
    closest = start[None, None] + t[..., None] * d[None, None]
    dist = jnp.linalg.norm(grid[:, :, None, :] - closest, axis=-1)

    feather = 1.0 / max(h, w)
    alpha = jnp.clip((width / 2 + feather - dist) / feather, 0.0, 1.0)

    out = image
    # Iterative over-composite preserves draw order like the reference.
    n = start.shape[0]
    for i in range(n):
        a = alpha[..., i : i + 1]
        out = out * (1 - a) + color[i] * a
    return out


def render_points(
    image: Array,
    points: Array,
    color: Array,
    radius: float = 0.006,
) -> Array:
    """Composite anti-aliased discs onto (h, w, 3). points: (n, 2)."""
    h, w, _ = image.shape
    grid = _pixel_grid((h, w))
    color = jnp.broadcast_to(jnp.asarray(color), (points.shape[0], 3))
    dist = jnp.linalg.norm(grid[:, :, None, :] - points[None, None], axis=-1)
    feather = 1.0 / max(h, w)
    alpha = jnp.clip((radius + feather - dist) / feather, 0.0, 1.0)
    out = image
    for i in range(points.shape[0]):
        a = alpha[..., i : i + 1]
        out = out * (1 - a) + color[i] * a
    return out


def project_points(
    points_world: Array, extrinsics: Array, intrinsics: Array
) -> Tuple[Array, Array]:
    """World points -> normalized image xy + validity (in front of camera);
    convenience wrapper over the geometry layer for drawing overlays."""
    from ..geometry.projection import project

    return project(points_world, extrinsics, intrinsics)
