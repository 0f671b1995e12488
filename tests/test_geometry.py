import jax.numpy as jnp
import numpy as np
import pytest

from mvldm_tpu.geometry import (
    absolute_to_relative_camera,
    get_fov,
    get_world_rays,
    project,
    sample_image_grid,
    unproject,
)


def make_intrinsics(fx=1.0, fy=1.0, cx=0.5, cy=0.5):
    k = np.eye(3, dtype=np.float32)
    k[0, 0], k[1, 1], k[0, 2], k[1, 2] = fx, fy, cx, cy
    return jnp.asarray(k)


def make_pose(rotation=None, translation=(0.0, 0.0, 0.0)):
    pose = np.eye(4, dtype=np.float32)
    if rotation is not None:
        pose[:3, :3] = rotation
    pose[:3, 3] = translation
    return jnp.asarray(pose)


class TestSampleImageGrid:
    def test_pixel_centers(self):
        coords, indices = sample_image_grid((2, 4))
        assert coords.shape == (2, 4, 2)
        assert indices.shape == (2, 4, 2)
        # Coordinates are (x, y) at pixel centers.
        np.testing.assert_allclose(coords[0, 0], [1 / 8, 1 / 4])
        np.testing.assert_allclose(coords[1, 3], [7 / 8, 3 / 4])
        np.testing.assert_array_equal(indices[1, 3], [1, 3])

    def test_range_open_unit_interval(self):
        coords, _ = sample_image_grid((32, 32))
        assert float(coords.min()) > 0.0
        assert float(coords.max()) < 1.0


class TestWorldRays:
    def test_identity_camera_center_ray(self):
        intrinsics = make_intrinsics()
        extrinsics = make_pose()
        xy = jnp.asarray([[0.5, 0.5]])
        origins, directions = get_world_rays(xy, extrinsics, intrinsics)
        np.testing.assert_allclose(origins[0], [0, 0, 0], atol=1e-6)
        np.testing.assert_allclose(directions[0], [0, 0, 1], atol=1e-6)

    def test_translated_camera_origins(self):
        intrinsics = make_intrinsics()
        extrinsics = make_pose(translation=(1.0, 2.0, 3.0))
        xy = jnp.asarray([[0.5, 0.5], [0.25, 0.75]])
        origins, directions = get_world_rays(xy, extrinsics, intrinsics)
        np.testing.assert_allclose(origins, [[1, 2, 3], [1, 2, 3]], atol=1e-6)
        np.testing.assert_allclose(
            np.linalg.norm(directions, axis=-1), [1, 1], atol=1e-6
        )

    def test_project_unproject_roundtrip(self):
        intrinsics = make_intrinsics(fx=0.8, fy=0.9, cx=0.45, cy=0.55)
        extrinsics = make_pose(translation=(0.3, -0.2, 0.1))
        xy = jnp.asarray([[0.3, 0.7], [0.6, 0.2]])
        origins, directions = get_world_rays(xy, extrinsics, intrinsics)
        points = origins + 2.5 * directions
        xy_reproj, in_front = project(points, extrinsics, intrinsics)
        assert bool(in_front.all())
        np.testing.assert_allclose(xy_reproj, xy, atol=1e-5)

    def test_rotated_camera(self):
        # 90 degree rotation about y: camera +z maps to world +x.
        rot = np.array([[0, 0, 1], [0, 1, 0], [-1, 0, 0]], dtype=np.float32)
        extrinsics = make_pose(rotation=rot)
        intrinsics = make_intrinsics()
        xy = jnp.asarray([[0.5, 0.5]])
        _, directions = get_world_rays(xy, extrinsics, intrinsics)
        np.testing.assert_allclose(directions[0], [1, 0, 0], atol=1e-6)


class TestFov:
    def test_90_degree_fov(self):
        # Normalized fx = 0.5 -> half-width 1 at unit depth -> fov = 2*atan(1) = 90 deg.
        intrinsics = make_intrinsics(fx=0.5, fy=0.5)[None]
        fov = np.rad2deg(np.asarray(get_fov(intrinsics)))
        np.testing.assert_allclose(fov[0], [90.0, 90.0], atol=1e-4)

    def test_narrow_fov(self):
        intrinsics = make_intrinsics(fx=2.0, fy=2.0)[None]
        fov = np.rad2deg(np.asarray(get_fov(intrinsics)))
        expected = 2 * np.rad2deg(np.arctan(0.25))
        np.testing.assert_allclose(fov[0], [expected, expected], atol=1e-4)


class TestRelativeCamera:
    def test_reference_pose_becomes_identity(self):
        rng = np.random.default_rng(0)
        poses = np.stack([np.eye(4, dtype=np.float32) for _ in range(4)])
        for i in range(4):
            # Random rotations via QR, random translations.
            q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
            poses[i, :3, :3] = q * np.sign(np.linalg.det(q))
            poses[i, :3, 3] = rng.normal(size=3)
        poses = jnp.asarray(poses)[None]  # (1, 4, 4, 4)
        rel = absolute_to_relative_camera(poses, 2)
        np.testing.assert_allclose(rel[0, 2], np.eye(4), atol=1e-5)

    def test_relative_transform_preserved(self):
        rng = np.random.default_rng(1)
        poses = rng.normal(size=(1, 3, 4, 4)).astype(np.float32)
        poses[..., 3, :] = [0, 0, 0, 1]
        poses[..., :3, :3] += 3 * np.eye(3)  # keep invertible
        rel = absolute_to_relative_camera(jnp.asarray(poses), 0)
        # Relative pose between view 1 and 2 must be unchanged.
        orig = np.linalg.inv(poses[0, 1]) @ poses[0, 2]
        new = np.linalg.inv(np.asarray(rel[0, 1])) @ np.asarray(rel[0, 2])
        np.testing.assert_allclose(new, orig, atol=1e-4)
