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
        launches = []
        orig_sample = sampler._sample

        def spy_sample(unet_params, vae_params, ctx_u8, extr, intr,
                       num_target_views, rng):
            # Record (v_c, v_t, index of the view the poses are relative
            # to). The relative view's extrinsics are exactly identity.
            extr_np = np.asarray(extr)
            rel = [
                i for i in range(extr_np.shape[1])
                if np.allclose(extr_np[0, i], np.eye(4), atol=1e-5)
            ]
            launches.append(
                (ctx_u8.shape[1], num_target_views, rel[0] if rel else None)
            )
            return orig_sample(
                unet_params, vae_params, ctx_u8, extr, intr,
                num_target_views=num_target_views, rng=rng,
            )

        sampler._sample = spy_sample
        ctx, tgt = make_scene(n_target=17)
        results = sampler.sample_anchored(ctx, tgt, jax.random.PRNGKey(0))
        assert sorted(results.keys()) == tgt.index.tolist()
        # anchor_step = 17//8 = 2 -> anchors at positions 2,4,...,16 (8 of
        # them): one (1 ctx, 4 tgt) window relative to the context, then two
        # chained (2 ctx, 3 tgt) windows relative to the previous anchor
        # (view 1; the second window is padded: 8-4-3 = 1 real anchor).
        assert launches[0] == (1, 4, 0)
        assert launches[1] == (2, 3, 1)
        assert launches[2] == (2, 3, 1)

    def test_limit_frames(self, tiny_engine):
        engine, unet_params, vae_params = tiny_engine
        sampler = VideoSampler(engine, unet_params, vae_params)
        ctx, tgt = make_scene(n_target=11)
        results = sampler.sample_anchored(
            ctx, tgt, jax.random.PRNGKey(0), limit_frames=8
        )
        assert sorted(results.keys()) == tgt.index[:8].tolist()

    def test_single_target_frame(self, tiny_engine):
        """n_t == 1 leaves the strided anchor grid empty; the single frame
        must become its own anchor rather than crash (anchor_pos fallback
        in dispatch_anchored_many)."""
        engine, unet_params, vae_params = tiny_engine
        sampler = VideoSampler(engine, unet_params, vae_params)
        ctx, tgt = make_scene(n_target=5)
        results = sampler.sample_anchored(
            ctx, tgt, jax.random.PRNGKey(0), limit_frames=1
        )
        assert sorted(results.keys()) == tgt.index[:1].tolist()
        img = results[int(tgt.index[0])]
        assert img.shape == (32, 32, 3) and img.dtype == np.uint8


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
