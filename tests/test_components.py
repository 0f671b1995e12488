"""Tests for auxiliary components: StandardTransformer, rotation utils,
camera visualization, trajectories, FID math, map-style dataset."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mvldm_tpu.models.standard_transformer import (
    CrossAttentionCfg,
    StandardTransformer,
    position_embedding_sine,
)
from mvldm_tpu.utils.rotation_utils import (
    IsotropicGaussianSO3,
    axis_angle_to_matrix,
    matrix_to_axis_angle,
    matrix_to_quaternion,
    quaternion_to_matrix,
)
from mvldm_tpu.visualization.cameras import draw_cameras
from mvldm_tpu.visualization.camera_trajectory import (
    generate_spin,
    generate_wobble,
    interpolate_pose,
)
from mvldm_tpu.evaluation.fid import frechet_distance, kernel_distance


class TestStandardTransformer:
    def test_forward_shape(self):
        cfg = CrossAttentionCfg(num_heads=4, d_mlp_multiplier=1)
        block = StandardTransformer(cfg)
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 3, 8, 8, 16))
        params = block.init(jax.random.PRNGKey(1), x)
        out = block.apply(params, x)
        assert out.shape == x.shape

    def test_views_interact(self):
        cfg = CrossAttentionCfg(num_heads=4, d_mlp_multiplier=1)
        block = StandardTransformer(cfg)
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 3, 4, 4, 16))
        params = block.init(jax.random.PRNGKey(1), x)
        out1 = block.apply(params, x)
        out2 = block.apply(params, x.at[:, 2].add(1.0))
        assert not np.allclose(np.asarray(out1[:, 0]), np.asarray(out2[:, 0]))

    @pytest.mark.slow
    def test_downscale_roundtrip_shape(self):
        cfg = CrossAttentionCfg(num_heads=4, d_mlp_multiplier=1, downscale=2)
        block = StandardTransformer(cfg)
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 2, 8, 8, 16))
        params = block.init(jax.random.PRNGKey(1), x)
        out = block.apply(params, x)
        assert out.shape == x.shape

    def test_pos_embedding_matches_torch_reference(self):
        """Golden check against the DETR formula the reference vendors
        (unimatch/position.py)."""
        import torch

        h, w, c = 6, 5, 16
        pos = position_embedding_sine(h, w, c // 2)
        # torch reference
        mask = torch.ones((1, h, w))
        y_embed = mask.cumsum(1, dtype=torch.float32)
        x_embed = mask.cumsum(2, dtype=torch.float32)
        eps = 1e-6
        scale = 2 * np.pi
        y_embed = y_embed / (y_embed[:, -1:, :] + eps) * scale
        x_embed = x_embed / (x_embed[:, :, -1:] + eps) * scale
        npf = c // 2
        dim_t = torch.arange(npf, dtype=torch.float32)
        dim_t = 10000 ** (2 * (dim_t // 2) / npf)
        pos_x = x_embed[:, :, :, None] / dim_t
        pos_y = y_embed[:, :, :, None] / dim_t
        pos_x = torch.stack(
            (pos_x[:, :, :, 0::2].sin(), pos_x[:, :, :, 1::2].cos()), dim=4
        ).flatten(3)
        pos_y = torch.stack(
            (pos_y[:, :, :, 0::2].sin(), pos_y[:, :, :, 1::2].cos()), dim=4
        ).flatten(3)
        expected = torch.cat((pos_y, pos_x), dim=3)[0].numpy()
        np.testing.assert_allclose(pos, expected, atol=1e-5)


class TestRotationUtils:
    def test_axis_angle_roundtrip(self):
        rng = np.random.default_rng(0)
        aa = rng.normal(size=(10, 3)) * 0.8
        rot = axis_angle_to_matrix(aa)
        back = matrix_to_axis_angle(rot)
        np.testing.assert_allclose(back, aa, atol=1e-5)

    def test_rotation_matrices_valid(self):
        rng = np.random.default_rng(1)
        rot = axis_angle_to_matrix(rng.normal(size=(5, 3)))
        eye = np.einsum("bij,bkj->bik", rot, rot)
        np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), (5, 3, 3)), atol=1e-6)
        np.testing.assert_allclose(np.linalg.det(rot), 1.0, atol=1e-6)

    def test_quaternion_roundtrip(self):
        rng = np.random.default_rng(2)
        rot = axis_angle_to_matrix(rng.normal(size=(8, 3)))
        quat = matrix_to_quaternion(rot)
        back = quaternion_to_matrix(quat)
        np.testing.assert_allclose(back, rot, atol=1e-5)

    def test_igso3_concentration(self):
        rng = np.random.default_rng(3)
        small = IsotropicGaussianSO3(0.05).sample_angle(rng, 500)
        large = IsotropicGaussianSO3(1.5).sample_angle(rng, 500)
        assert small.mean() < 0.3
        assert large.mean() > 1.0


class TestCameraVisualization:
    def test_draw_cameras(self):
        extr = np.stack([np.eye(4, dtype=np.float32) for _ in range(3)])
        extr[:, 0, 3] = [0.0, 0.5, 1.0]
        intr = np.broadcast_to(np.eye(3, dtype=np.float32), (3, 3, 3)).copy()
        intr[:, 0, 2] = intr[:, 1, 2] = 0.5
        images = draw_cameras(64, extr, intr)
        assert len(images) == 3
        for img in images:
            assert img.shape == (64, 64, 3)
            assert img.min() < 1.0  # something was drawn


class TestCameraTrajectory:
    def test_interpolate_endpoints(self):
        a = np.eye(4, dtype=np.float32)
        b = np.eye(4, dtype=np.float32)
        b[:3, 3] = [1, 2, 3]
        b[:3, :3] = axis_angle_to_matrix(np.asarray([0.0, 0.5, 0.0]))
        poses = interpolate_pose(a, b, np.asarray([0.0, 0.5, 1.0]))
        np.testing.assert_allclose(poses[0], a, atol=1e-5)
        np.testing.assert_allclose(poses[2], b, atol=1e-5)
        np.testing.assert_allclose(poses[1, :3, 3], [0.5, 1.0, 1.5], atol=1e-5)

    def test_wobble_returns_to_start(self):
        base = np.eye(4, dtype=np.float32)
        traj = generate_wobble(base, radius=0.1, num_frames=8)
        assert traj.shape == (8, 4, 4)
        np.testing.assert_allclose(traj[0, :3, 3], [0, 0, 0], atol=1e-6)

    def test_spin_orbits_origin(self):
        traj = generate_spin(12, elevation_deg=20.0, radius=2.0)
        assert traj.shape == (12, 4, 4)
        np.testing.assert_allclose(
            np.linalg.norm(traj[:, :3, 3], axis=-1), 2.0, atol=1e-5
        )
        # Forward axis points at the origin.
        fwd = traj[:, :3, 2]
        to_origin = -traj[:, :3, 3] / 2.0
        np.testing.assert_allclose(fwd, to_origin, atol=1e-5)


class TestFidMath:
    def test_identical_distributions_zero(self):
        rng = np.random.default_rng(0)
        feats = rng.normal(size=(500, 16))
        assert frechet_distance(feats, feats) == pytest.approx(0.0, abs=1e-6)
        # The unbiased KID estimator may be slightly negative on identical
        # sample sets (diagonal terms included in kxy).
        assert kernel_distance(feats, feats) == pytest.approx(0.0, abs=0.05)

    def test_shifted_distribution_positive(self):
        rng = np.random.default_rng(0)
        a = rng.normal(size=(500, 16))
        b = rng.normal(size=(500, 16)) + 2.0
        assert frechet_distance(a, b) > 1.0
        assert kernel_distance(a, b) > 0.1

    def test_tiny_n_singular_covariance(self):
        # N < d makes the covariance rank-deficient (the fixture-weight
        # eval sweep's regime); the eps*I regularization must produce a
        # finite real result with no LinAlgWarning leaking to the caller.
        import warnings

        import scipy.linalg

        rng = np.random.default_rng(0)
        a = rng.normal(size=(5, 64))
        b = rng.normal(size=(5, 64)) + 1.0
        with warnings.catch_warnings():
            warnings.simplefilter("error", scipy.linalg.LinAlgWarning)
            d = frechet_distance(a, b)
        assert np.isfinite(d) and d > 0.0


class TestDatasetV2:
    def test_getitem(self, tmp_path):
        from synthetic_data import write_synthetic_dataset
        from mvldm_tpu.data.dataset_re10k import DatasetRE10kCfg
        from mvldm_tpu.data.dataset_re10kv2 import DatasetRE10kV2
        from mvldm_tpu.data.view_samplers import (
            ViewSamplerBounded,
            ViewSamplerBoundedCfg,
        )

        root = write_synthetic_dataset(tmp_path, frames_per_scene=30)
        cfg = DatasetRE10kCfg(name="re10k_non_iter", root=root)
        sampler = ViewSamplerBounded(
            ViewSamplerBoundedCfg(
                num_context_views=2,
                num_target_views=3,
                min_distance_between_context_views=5,
                max_distance_between_context_views=15,
            ),
            "test", False, False, None, rng=np.random.default_rng(0),
        )
        ds = DatasetRE10kV2(cfg, "test", sampler, rng=np.random.default_rng(0))
        assert len(ds) == 2
        ex = ds[0]
        assert ex.context.image.shape == (2, 256, 256, 3)
