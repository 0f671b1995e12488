"""Full 25-step-style DDIM sampling golden vs a torch functional mirror.

Closes the last SURVEY §4(b) item ("full DDIM on one scene within
tolerance") at tiny topology: a synthetic reference Lightning checkpoint is
converted through ``convert_mvldm_checkpoint`` and the ENTIRE sampling loop
(``engine.sample_latents``: per-view timesteps, [latent ‖ mask ‖ ray] input
assembly, CFG composition, DDIM updates under ``lax.scan``) must reproduce
a torch mirror that implements the reference's semantics independently —
``diffusion_wrapper.sample():455-490`` with the SEQUENTIAL two-forward CFG
(``step():435-441``) and diffusers' DDIM step math.

Because the mirror only implements the reference's sequential CFG, running
the engine in ``batched`` mode against the same mirror also PROVES the
single-launch batched-CFG equivalence claim (README design note) end to
end, not just per-step.
"""

from __future__ import annotations

import numpy as np
import pytest
import torch

from mvldm_tpu.diffusion.engine import DiffusionEngine, ModelCfg, unet_in_channels
from mvldm_tpu.diffusion.schedulers import DDIMScheduler, DDIMSchedulerKwargs
from mvldm_tpu.models.mv_attention import SpatialTransformer3DCfg
from mvldm_tpu.models.unet import MultiViewUNet, MultiViewUNetCfg
from mvldm_tpu.models.vae import AutoencoderCfg, AutoencoderKL

from tests.test_torch_goldens import (
    BACKBONE,
    IN_CH,
    MV_HEADS,
    OUT_CH,
    VAE_CFG,
    checkpoint,  # noqa: F401  (module-scoped fixture reused)
    torch_unet_forward,
)

STEPS = 4
CFG_SCALE = 3.0
B, V_C, V_T, HL = 1, 2, 3, 4


def build_engine(cfg_mode: str) -> DiffusionEngine:
    unet_cfg = MultiViewUNetCfg(
        autoencoder=BACKBONE,
        multi_view_attention=SpatialTransformer3DCfg(num_heads=MV_HEADS),
    )
    model_cfg = ModelCfg(
        denoiser=unet_cfg,
        autoencoder=AutoencoderCfg(kwargs=VAE_CFG),
        use_cfg=True,
        cfg_scale=CFG_SCALE,
        use_ray_encoding=False,  # live baseline: raw origin+direction rays
    )
    assert unet_in_channels(model_cfg) == IN_CH
    unet = MultiViewUNet(unet_cfg, in_channels=IN_CH, out_channels=OUT_CH)
    vae = AutoencoderKL(VAE_CFG)
    scheduler = DDIMScheduler.create(
        DDIMSchedulerKwargs(clip_sample=False), num_inference_steps=STEPS
    )
    return DiffusionEngine(
        model_cfg, unet, vae, scheduler, cfg_mode=cfg_mode
    )


def scene_cameras():
    extr = np.tile(np.eye(4, dtype=np.float32), (B, V_C + V_T, 1, 1))
    extr[:, :, 0, 3] = np.linspace(0.0, 1.0, V_C + V_T)[None]
    intr = np.tile(np.eye(3, dtype=np.float32), (B, V_C + V_T, 1, 1))
    intr[:, :, 0, 2] = intr[:, :, 1, 2] = 0.5
    return extr, intr


def ddim_alphas(scheduler) -> np.ndarray:
    return np.asarray(scheduler.alphas_cumprod, np.float64)


def torch_sample_latents(
    ckpt, ctx_latents, rays, noise, timesteps, alphas_cumprod,
    final_alpha: float,
) -> np.ndarray:
    """The reference sampling loop in torch/numpy: sequential CFG (cond on
    ctx+tgt, uncond on targets alone), per-view timesteps with context t=0,
    diffusers DDIM step (epsilon, eta 0, clip_sample False)."""
    n_train = len(alphas_cumprod)
    step_gap = n_train // len(timesteps)

    def unet_eps(lat_views, t_views, rays_views, mask_views, v):
        # (b, v, h, w, c) NHWC numpy -> torch NCHW (b*v, c, h, w).
        x = np.concatenate([lat_views, mask_views, rays_views], axis=-1)
        bt, vv = x.shape[:2]
        xt = torch.from_numpy(
            np.ascontiguousarray(
                x.reshape(bt * vv, *x.shape[2:]).transpose(0, 3, 1, 2)
            )
        ).float()
        tt = torch.from_numpy(np.asarray(t_views).reshape(-1))
        with torch.no_grad():
            eps = torch_unet_forward(ckpt, xt, tt, v).numpy()
        return eps.transpose(0, 2, 3, 1).reshape(bt, vv, HL, HL, OUT_CH)

    x = noise.astype(np.float64)  # init_noise_sigma == 1 for DDIM
    ones = np.ones((B, V_T, HL, HL, 1), np.float32)
    zeros = np.zeros((B, V_C, HL, HL, 1), np.float32)
    for t in timesteps:
        # Conditional forward: ctx+tgt, context timesteps 0.
        lat = np.concatenate([ctx_latents, x.astype(np.float32)], axis=1)
        mask = np.concatenate([zeros, ones], axis=1)
        t_views = np.concatenate(
            [np.zeros((B, V_C), np.int64), np.full((B, V_T), t, np.int64)],
            axis=1,
        )
        eps_cond = unet_eps(lat, t_views, rays, mask, V_C + V_T)[:, V_C:]
        # Unconditional forward: targets alone (reference step():435-441).
        eps_uncond = unet_eps(
            x.astype(np.float32), np.full((B, V_T), t, np.int64),
            rays[:, V_C:], ones, V_T,
        )
        eps = eps_uncond + CFG_SCALE * (eps_cond - eps_uncond)

        # diffusers DDIM step, eta 0, epsilon prediction, no clipping.
        a_t = alphas_cumprod[t]
        prev_t = t - step_gap
        a_prev = alphas_cumprod[prev_t] if prev_t >= 0 else final_alpha
        x0 = (x - np.sqrt(1.0 - a_t) * eps) / np.sqrt(a_t)
        x = np.sqrt(a_prev) * x0 + np.sqrt(1.0 - a_prev) * eps
    return x.astype(np.float32)


@pytest.mark.goldens
@pytest.mark.parametrize("cfg_mode", ["sequential", "batched"])
def test_full_ddim_loop_matches_torch(checkpoint, cfg_mode):  # noqa: F811
    import jax
    import jax.numpy as jnp

    ckpt, params = checkpoint
    engine = build_engine(cfg_mode)
    extr, intr = scene_cameras()

    rng = np.random.default_rng(11)
    ctx_latents = rng.normal(size=(B, V_C, HL, HL, 4)).astype(np.float32)
    noise = rng.normal(size=(B, V_T, HL, HL, 4)).astype(np.float32)

    latents = np.asarray(
        jax.jit(
            engine.sample_latents, static_argnames=("num_target_views",)
        )(
            params["unet"],
            jnp.asarray(ctx_latents),
            jnp.asarray(extr),
            jnp.asarray(intr),
            num_target_views=V_T,
            rng=jax.random.PRNGKey(0),  # unused: noise injected
            initial_noise=jnp.asarray(noise),
        )
    )

    # The mirror consumes the SAME ray channels (geometry parity is covered
    # by tests/test_geometry.py; this golden pins everything downstream).
    rays = np.asarray(engine.ray_encode(jnp.asarray(extr), jnp.asarray(intr),
                                        (HL, HL)))
    sched = engine.scheduler
    golden = torch_sample_latents(
        ckpt, ctx_latents, rays, noise,
        [int(t) for t in sched.timesteps()],
        ddim_alphas(sched), float(sched.final_alpha_cumprod),
    )

    assert latents.shape == golden.shape == (B, V_T, HL, HL, 4)
    # Both loops must produce a live, input-dependent result.
    assert np.abs(golden).mean() > 1e-2
    np.testing.assert_allclose(latents, golden, rtol=2e-3, atol=2e-3)
