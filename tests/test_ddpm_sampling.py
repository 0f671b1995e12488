"""DDPM ancestral sampling through the engine (rng-threaded lax.scan)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mvldm_tpu.diffusion.engine import DiffusionEngine
from mvldm_tpu.diffusion.schedulers import DDPMScheduler, DDPMSchedulerKwargs

from test_engine import tiny_engine, make_batch  # fixtures

pytestmark = pytest.mark.slow  # multi-minute XLA compiles


class TestDDPMSampling:
    def test_sample_with_ddpm_scheduler(self, tiny_engine):
        engine, unet_params, vae_params = tiny_engine
        ddpm = DDPMScheduler.create(
            DDPMSchedulerKwargs(clip_sample=False), num_inference_steps=4
        )
        ddpm_engine = DiffusionEngine(
            engine.cfg, engine.unet, engine.vae, ddpm
        )
        batch = make_batch(jax.random.PRNGKey(0), b=1)
        out = ddpm_engine.sample(
            unet_params,
            vae_params,
            batch.images[:, :2],
            batch.extrinsics,
            batch.intrinsics,
            num_target_views=3,
            rng=jax.random.PRNGKey(1),
        )
        assert out.shape == (1, 3, 32, 32, 3)
        assert bool(jnp.isfinite(out).all())

    def test_ddpm_ancestral_noise_is_seeded(self, tiny_engine):
        engine, unet_params, vae_params = tiny_engine
        ddpm = DDPMScheduler.create(
            DDPMSchedulerKwargs(clip_sample=False), num_inference_steps=4
        )
        ddpm_engine = DiffusionEngine(engine.cfg, engine.unet, engine.vae, ddpm)
        batch = make_batch(jax.random.PRNGKey(0), b=1)
        args = (
            unet_params, vae_params, batch.images[:, :2],
            batch.extrinsics, batch.intrinsics,
        )
        a = ddpm_engine.sample(*args, num_target_views=3, rng=jax.random.PRNGKey(2))
        b = ddpm_engine.sample(*args, num_target_views=3, rng=jax.random.PRNGKey(2))
        c = ddpm_engine.sample(*args, num_target_views=3, rng=jax.random.PRNGKey(3))
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert not np.allclose(np.asarray(a), np.asarray(c))
