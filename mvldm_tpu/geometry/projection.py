"""Camera projection math in pure jnp.

Functional port of the reference geometry layer (see reference
``src/geometry/projection.py:9-248``): pixel-grid sampling, world-ray
generation from OpenCV-style normalized intrinsics + c2w extrinsics, and FOV
computation. Everything here is shape-polymorphic over leading batch dims and
safe to call inside ``jax.jit``.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import Array


def homogenize_points(points: Array) -> Array:
    """Convert batched points (..., xyz) to (..., xyz1)."""
    return jnp.concatenate([points, jnp.ones_like(points[..., :1])], axis=-1)


def homogenize_vectors(vectors: Array) -> Array:
    """Convert batched vectors (..., xyz) to (..., xyz0)."""
    return jnp.concatenate([vectors, jnp.zeros_like(vectors[..., :1])], axis=-1)


def transform_rigid(homogeneous_coordinates: Array, transformation: Array) -> Array:
    """Apply a rigid-body transform to homogeneous points or vectors."""
    return jnp.einsum("...ij,...j->...i", transformation, homogeneous_coordinates)


def transform_cam2world(homogeneous_coordinates: Array, extrinsics: Array) -> Array:
    """Camera space -> world space (extrinsics are c2w)."""
    return transform_rigid(homogeneous_coordinates, extrinsics)


def transform_world2cam(homogeneous_coordinates: Array, extrinsics: Array) -> Array:
    """World space -> camera space (extrinsics are c2w; inverted here)."""
    return transform_rigid(homogeneous_coordinates, jnp.linalg.inv(extrinsics))


def project_camera_space(
    points: Array,
    intrinsics: Array,
    epsilon: float = float(jnp.finfo(jnp.float32).eps),
    infinity: float = 1e8,
) -> Array:
    points = points / (points[..., -1:] + epsilon)
    points = jnp.nan_to_num(points, posinf=infinity, neginf=-infinity)
    points = jnp.einsum("...ij,...j->...i", intrinsics, points)
    return points[..., :-1]


def project(
    points: Array,
    extrinsics: Array,
    intrinsics: Array,
    epsilon: float = float(jnp.finfo(jnp.float32).eps),
) -> tuple[Array, Array]:
    """Project world points through a camera.

    Returns (xy coordinates, in-front-of-camera mask).
    """
    points = homogenize_points(points)
    points = transform_world2cam(points, extrinsics)[..., :-1]
    in_front_of_camera = points[..., -1] >= 0
    return project_camera_space(points, intrinsics, epsilon=epsilon), in_front_of_camera


def unproject(coordinates: Array, z: Array, intrinsics: Array) -> Array:
    """Unproject normalized 2D camera coordinates with the given Z values."""
    coordinates = homogenize_points(coordinates)
    ray_directions = jnp.einsum(
        "...ij,...j->...i", jnp.linalg.inv(intrinsics), coordinates
    )
    return ray_directions * z[..., None]


def get_world_rays(
    coordinates: Array,
    extrinsics: Array,
    intrinsics: Array,
) -> tuple[Array, Array]:
    """Normalized pixel coordinates -> (ray origins, unit ray directions) in world.

    Matches reference ``projection.py:91-114``: camera-space directions from the
    inverse intrinsics at unit depth, L2-normalized, rotated into world space;
    origins are the camera centers broadcast to the ray shape.
    """
    directions = unproject(coordinates, jnp.ones_like(coordinates[..., 0]), intrinsics)
    directions = directions / jnp.linalg.norm(directions, axis=-1, keepdims=True)
    directions = homogenize_vectors(directions)
    directions = transform_cam2world(directions, extrinsics)[..., :-1]
    origins = jnp.broadcast_to(extrinsics[..., :-1, -1], directions.shape)
    return origins, directions


def sample_image_grid(
    shape: tuple[int, ...],
    dtype: jnp.dtype = jnp.float32,
) -> tuple[Array, Array]:
    """Pixel-center normalized coordinates + integer indices for an image grid.

    Matches reference ``projection.py:117-138``: coordinates are (x, y) in
    (0, 1) at pixel centers ((i + 0.5) / n); indices are (row, col) ints.
    """
    indices = [jnp.arange(length) for length in shape]
    stacked_indices = jnp.stack(jnp.meshgrid(*indices, indexing="ij"), axis=-1)

    coordinates = [
        ((idx + 0.5) / length).astype(dtype) for idx, length in zip(indices, shape)
    ]
    coordinates = list(reversed(coordinates))
    coordinates = jnp.stack(jnp.meshgrid(*coordinates, indexing="xy"), axis=-1)
    return coordinates, stacked_indices


def get_fov(intrinsics: Array) -> Array:
    """Horizontal/vertical FOV (radians) from normalized intrinsics.

    Matches reference ``projection.py:234-248``.
    """
    intrinsics_inv = jnp.linalg.inv(intrinsics)

    def process_vector(vector):
        vector = jnp.asarray(vector, dtype=jnp.float32)
        vector = jnp.einsum("...ij,j->...i", intrinsics_inv, vector)
        return vector / jnp.linalg.norm(vector, axis=-1, keepdims=True)

    left = process_vector([0.0, 0.5, 1.0])
    right = process_vector([1.0, 0.5, 1.0])
    top = process_vector([0.5, 0.0, 1.0])
    bottom = process_vector([0.5, 1.0, 1.0])
    fov_x = jnp.arccos(jnp.sum(left * right, axis=-1))
    fov_y = jnp.arccos(jnp.sum(top * bottom, axis=-1))
    return jnp.stack((fov_x, fov_y), axis=-1)
