"""Pose utilities (reference ``src/misc/camera_utils.py:5-26``)."""

from __future__ import annotations

import jax.numpy as jnp
from jax import Array


def absolute_to_relative_camera(tform: Array, index: int | Array) -> Array:
    """Express all c2w poses relative to the pose at ``index``.

    tform: (..., v, 4, 4) camera-to-world matrices.
    Returns inv(tform[index]) @ tform, broadcast over the view axis — the
    reference's left-multiplication by the inverse reference pose.
    """
    ref_tform = jnp.take(tform, jnp.asarray(index), axis=-3)[..., None, :, :]
    return jnp.linalg.inv(ref_tform) @ tform
