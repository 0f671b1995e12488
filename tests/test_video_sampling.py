import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mvldm_tpu.diffusion.video_sampling import SceneViews, VideoSampler

from test_engine import tiny_engine  # fixture

pytestmark = pytest.mark.slow  # multi-minute XLA compiles


def make_scene(n_context=1, n_target=11, hw=32):
    rng = np.random.default_rng(0)
    n = n_context + n_target
    images = rng.uniform(size=(n, hw, hw, 3)).astype(np.float32)
    extr = np.repeat(np.eye(4, dtype=np.float32)[None], n, axis=0)
    extr[:, 0, 3] = np.linspace(0, 1, n)
    intr = np.repeat(np.eye(3, dtype=np.float32)[None], n, axis=0)
    intr[:, 0, 2] = intr[:, 1, 2] = 0.5
    ctx = SceneViews(
        images=images[:n_context],
        extrinsics=extr[:n_context],
        intrinsics=intr[:n_context],
        index=np.arange(n_context, dtype=np.int64),
    )
    tgt = SceneViews(
        images=images[n_context:],
        extrinsics=extr[n_context:],
        intrinsics=intr[n_context:],
        index=np.arange(n_context, n, dtype=np.int64),
    )
    return ctx, tgt


class TestAnchoredSampling:
    def test_generates_every_frame(self, tiny_engine):
        engine, unet_params, vae_params = tiny_engine
        sampler = VideoSampler(engine, unet_params, vae_params)
        ctx, tgt = make_scene(n_target=11)
        results = sampler.sample_anchored(ctx, tgt, jax.random.PRNGKey(0))
        # Every requested target frame is produced (incl. ragged tail),
        # already quantized to uint8 on device (4x less tunnel traffic).
        assert sorted(results.keys()) == tgt.index.tolist()
        for img in results.values():
            assert img.shape == (32, 32, 3)
            assert img.dtype == np.uint8

    def test_chained_anchors_beyond_four(self, tiny_engine):
        """num_anchors_views > 4: first window of 4 from the context, then
        chained windows of 3 conditioned on [ctx0, previous anchor]
        (reference diffusion_wrapper.py:744-792)."""
        engine, unet_params, vae_params = tiny_engine
        sampler = VideoSampler(
            engine, unet_params, vae_params, num_anchors_views=8
        )
        run_shapes = []
        orig_run = sampler._run

        def spy_run(context, target, rel_index, rng):
            run_shapes.append(
                (context.images.shape[0], target.extrinsics.shape[0], rel_index)
            )
            return orig_run(context, target, rel_index, rng)

        sampler._run = spy_run
        ctx, tgt = make_scene(n_target=17)
        results = sampler.sample_anchored(ctx, tgt, jax.random.PRNGKey(0))
        assert sorted(results.keys()) == tgt.index.tolist()
        # anchor_step = 17//8 = 2 -> anchors at positions 2,4,...,16 (8 of
        # them): one (1 ctx, 4 tgt) window then two chained (2 ctx, 3 tgt)
        # windows (the second padded: 8-4-3 = 1 real anchor).
        assert run_shapes[0] == (1, 4, 0)
        assert run_shapes[1] == (2, 3, 1)
        assert run_shapes[2] == (2, 3, 1)

    def test_limit_frames(self, tiny_engine):
        engine, unet_params, vae_params = tiny_engine
        sampler = VideoSampler(engine, unet_params, vae_params)
        ctx, tgt = make_scene(n_target=11)
        results = sampler.sample_anchored(
            ctx, tgt, jax.random.PRNGKey(0), limit_frames=8
        )
        assert sorted(results.keys()) == tgt.index[:8].tolist()


class TestAutoregressiveSampling:
    def test_generates_every_frame(self, tiny_engine):
        engine, unet_params, vae_params = tiny_engine
        sampler = VideoSampler(engine, unet_params, vae_params)
        ctx, tgt = make_scene(n_target=9)
        results = sampler.sample_autoregressive(ctx, tgt, jax.random.PRNGKey(0))
        assert sorted(results.keys()) == tgt.index.tolist()
        for img in results.values():
            assert img.shape == (32, 32, 3)
            assert img.dtype == np.uint8
