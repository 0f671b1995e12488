import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mvldm_tpu.diffusion.engine import (
    Batch,
    DiffusionEngine,
    ModelCfg,
    RayEncodingsCfg,
    ray_channel_count,
    unet_in_channels,
)
from mvldm_tpu.diffusion.schedulers import DDIMScheduler, DDIMSchedulerKwargs
from mvldm_tpu.models.mv_attention import SpatialTransformer3DCfg
from mvldm_tpu.models.unet import MultiViewUNet, MultiViewUNetCfg, UNetBackboneCfg
from mvldm_tpu.models.vae import AutoencoderCfg, AutoencoderKL, AutoencoderKLCfg


@pytest.fixture(scope="module")
def tiny_engine():
    vae_kwargs = AutoencoderKLCfg(
        block_out_channels=(8, 8, 16, 16), layers_per_block=1, norm_num_groups=4
    )
    model_cfg = ModelCfg(
        denoiser=MultiViewUNetCfg(
            autoencoder=UNetBackboneCfg(
                down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
                up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
                block_out_channels=(16, 32),
                layers_per_block=1,
                cross_attention_dim=16,
                num_attention_heads=(2, 4),
                norm_num_groups=8,
            ),
            multi_view_attention=SpatialTransformer3DCfg(num_heads=4),
        ),
        autoencoder=AutoencoderCfg(kwargs=vae_kwargs),
        use_cfg=True,
        cfg_scale=3.0,
        use_ray_encoding=False,  # live baseline: raw 3+3 ray channels
    )
    assert ray_channel_count(model_cfg) == 6
    in_ch = unet_in_channels(model_cfg)
    assert in_ch == 11

    unet = MultiViewUNet(model_cfg.denoiser, in_channels=in_ch, out_channels=4)
    vae = AutoencoderKL(vae_kwargs)
    scheduler = DDIMScheduler.create(
        DDIMSchedulerKwargs(clip_sample=False), num_inference_steps=4
    )
    engine = DiffusionEngine(model_cfg, unet, vae, scheduler)

    # Init params. Image 32x32 -> latent 4x4.
    rng = jax.random.PRNGKey(0)
    img = jnp.zeros((1, 32, 32, 3))
    vae_params = vae.init(rng, img, rng)["params"]
    x = jnp.zeros((1, 2, 4, 4, in_ch))
    t = jnp.zeros((1, 2), dtype=jnp.int32)
    unet_params = unet.init(rng, x, t)["params"]
    return engine, unet_params, vae_params


def make_batch(key, b=2, v=5, hw=32):
    k1, k2 = jax.random.split(key)
    images = jax.random.uniform(k1, (b, v, hw, hw, 3))
    extr = jnp.broadcast_to(jnp.eye(4), (b, v, 4, 4)).copy()
    # Spread cameras along x.
    offsets = jnp.linspace(0.0, 1.0, v)
    extr = extr.at[:, :, 0, 3].set(offsets[None, :])
    intr = jnp.broadcast_to(jnp.eye(3), (b, v, 3, 3))
    intr = intr.at[:, :, 0, 2].set(0.5).at[:, :, 1, 2].set(0.5)
    is_target = jnp.asarray([[False, False, True, True, True]] * b)
    return Batch(images=images, extrinsics=extr, intrinsics=intr, is_target=is_target)


class TestRayEncode:
    def test_shape_and_determinism(self, tiny_engine):
        engine, *_ = tiny_engine
        batch = make_batch(jax.random.PRNGKey(0))
        rays = engine.ray_encode(batch.extrinsics, batch.intrinsics, (4, 4))
        assert rays.shape == (2, 5, 4, 4, 6)
        rays2 = engine.ray_encode(batch.extrinsics, batch.intrinsics, (4, 4))
        np.testing.assert_array_equal(np.asarray(rays), np.asarray(rays2))

    def test_direction_normalized(self, tiny_engine):
        engine, *_ = tiny_engine
        batch = make_batch(jax.random.PRNGKey(0))
        rays = engine.ray_encode(batch.extrinsics, batch.intrinsics, (4, 4))
        dirs = np.asarray(rays[..., 3:6])
        np.testing.assert_allclose(
            np.linalg.norm(dirs, axis=-1), 1.0, atol=1e-5
        )


class TestTrainingLoss:
    def test_loss_finite_and_jits(self, tiny_engine):
        engine, unet_params, vae_params = tiny_engine
        batch = make_batch(jax.random.PRNGKey(1))

        @jax.jit
        def step(up, vp, images, extr, intr, tgt, rng):
            b = Batch(images, extr, intr, tgt)
            return engine.training_loss(up, vp, b, rng, num_context_views=2)

        loss, metrics = step(
            unet_params, vae_params, batch.images, batch.extrinsics,
            batch.intrinsics, batch.is_target, jax.random.PRNGKey(2),
        )
        assert np.isfinite(float(loss))
        assert "loss/diffusion" in metrics

    @pytest.mark.slow
    def test_gradients_flow_to_unet_not_vae(self, tiny_engine):
        engine, unet_params, vae_params = tiny_engine
        batch = make_batch(jax.random.PRNGKey(1))

        def loss_fn(up):
            loss, _ = engine.training_loss(
                up, vae_params, batch, jax.random.PRNGKey(3), num_context_views=2
            )
            return loss

        g = jax.grad(loss_fn)(unet_params)
        leaves = jax.tree_util.tree_leaves(g)
        assert all(bool(jnp.isfinite(l).all()) for l in leaves)
        assert any(bool(jnp.any(l != 0)) for l in leaves)


class TestDenoiseStepCFG:
    @pytest.mark.slow
    def test_batched_cfg_equals_two_forwards(self, tiny_engine):
        """Both CFG execution modes must match the reference's two sequential
        forwards (cond on ctx+tgt, uncond on tgt only) exactly."""
        from mvldm_tpu.diffusion.engine import DiffusionEngine

        engine, unet_params, vae_params = tiny_engine
        batched_engine = DiffusionEngine(
            engine.cfg, engine.unet, engine.vae, engine.scheduler,
            cfg_mode="batched",
        )
        key = jax.random.PRNGKey(4)
        b, v_c, v_t, hl = 1, 2, 3, 4
        ctx_lat = jax.random.normal(key, (b, v_c, hl, hl, 4))
        x_t = jax.random.normal(jax.random.PRNGKey(5), (b, v_t, hl, hl, 4))
        batch = make_batch(jax.random.PRNGKey(6), b=b, v=v_c + v_t)
        rays = engine.ray_encode(batch.extrinsics, batch.intrinsics, (hl, hl))
        ts = jnp.asarray(400)

        out_seq = engine.denoise_step(unet_params, x_t, ts, ctx_lat, rays)
        out_batched = batched_engine.denoise_step(
            unet_params, x_t, ts, ctx_lat, rays
        )

        # Reference path: two separate calls.
        inputs = engine._unet_inputs(ctx_lat, x_t, rays)
        timesteps = jnp.concatenate(
            [jnp.zeros((b, v_c), jnp.int32),
             jnp.full((b, v_t), 400, jnp.int32)], axis=1
        )
        pred_cond = engine.unet.apply({"params": unet_params}, inputs, timesteps)

        # Unconditional: target views only (smaller tensors, no masking).
        tgt_inputs = inputs[:, v_c:]
        tgt_t = timesteps[:, v_c:]
        pred_uncond = engine.unet.apply({"params": unet_params}, tgt_inputs, tgt_t)

        pred = pred_uncond + engine.cfg.cfg_scale * (pred_cond[:, v_c:] - pred_uncond)
        expected = engine.scheduler.step(pred, ts, x_t)
        np.testing.assert_allclose(
            np.asarray(out_seq), np.asarray(expected), atol=2e-4
        )
        np.testing.assert_allclose(
            np.asarray(out_batched), np.asarray(expected), atol=2e-4
        )


class TestSample:
    def test_end_to_end_shapes(self, tiny_engine):
        engine, unet_params, vae_params = tiny_engine
        batch = make_batch(jax.random.PRNGKey(7), b=1)
        out = engine.sample(
            unet_params,
            vae_params,
            batch.images[:, :2],
            batch.extrinsics,
            batch.intrinsics,
            num_target_views=3,
            rng=jax.random.PRNGKey(8),
        )
        assert out.shape == (1, 3, 32, 32, 3)
        assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0

    @pytest.mark.slow
    def test_seeded_determinism(self, tiny_engine):
        engine, unet_params, vae_params = tiny_engine
        batch = make_batch(jax.random.PRNGKey(7), b=1)
        args = (
            unet_params, vae_params, batch.images[:, :2],
            batch.extrinsics, batch.intrinsics,
        )
        out1 = engine.sample(*args, num_target_views=3, rng=jax.random.PRNGKey(9))
        out2 = engine.sample(*args, num_target_views=3, rng=jax.random.PRNGKey(9))
        np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
