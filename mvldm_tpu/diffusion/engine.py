"""DiffusionEngine — the functional core of the framework.

Re-creates the reference ``DiffusionWrapper`` (``src/model/diffusion_wrapper.py``)
as pure functions over explicit parameters and RNG keys:

* :meth:`ray_encode` — camera rays at latent resolution -> per-view channels
  (raw origin/direction, Plucker, or octave encodings; reference ``:301-322``).
* :meth:`training_loss` — the noise-prediction MSE step (reference ``:324-411``)
  with random context-count, 50% absolute/relative poses, 10% CFG dropout.
* :meth:`denoise_step` — one CFG denoise step (reference ``step():413-453``).
* :meth:`sample` — the full DDIM loop (reference ``sample():455-490``) as a
  single ``lax.scan``.

TPU-first design decisions (documented deviations, numerically equivalent):

1. **Static shapes via role vectors.** The reference reshuffles tensors when
   it converts context views to targets (``sample_indices:213-276``) and when
   CFG-dropout drops context views (``:384-388``) — dynamic shapes that would
   force recompiles under jit. Here every example always carries all views;
   a per-view boolean ``is_target`` drives the mask channel, per-view
   timesteps, noising, the loss mask, and an attention ``view_mask``. Because
   every cross-view interaction flows through the (masked) joint attention
   and all other UNet ops are per-view, masking a view is exactly equivalent
   to removing it.
2. **Batched CFG.** The reference runs two sequential UNet forwards per DDIM
   step (conditional on ctx+tgt, unconditional on tgt only; ``:435-441``).
   Here both rows run in one launch: the unconditional row reuses the same
   padded layout with context views masked out of the joint attention, which
   is exact (see 1) and doubles MXU occupancy at small batch sizes.
3. **Per-example randomness.** Training randomness (context count, pose
   frame, CFG dropout) is drawn per example from explicit JAX keys instead of
   once per step from global numpy state — same marginal distribution,
   reproducible, and independent of batch sharding.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import Array

from ..geometry.camera_utils import absolute_to_relative_camera
from ..geometry.projection import get_world_rays, sample_image_grid
from ..models.encodings import positional_encoding, srt_ray_encode
from ..models.unet import MultiViewUNet, MultiViewUNetCfg
from ..models.vae import AutoencoderKL, AutoencoderCfg
from .schedulers import DDIMScheduler, DDPMScheduler, SchedulerCfg

VAE_SCALE = 0.18215  # SD VAE latent scaling (reference diffusion_wrapper.py:283)


@dataclass
class RayEncodingsCfg:
    """Reference ``model/config.py:12-15``."""

    num_origin_octaves: int = 10
    num_direction_octaves: int = 8


@dataclass
class ModelCfg:
    """Reference ``model/config.py:18-33``."""

    denoiser: MultiViewUNetCfg = field(default_factory=MultiViewUNetCfg)
    scheduler: SchedulerCfg | None = None
    autoencoder: AutoencoderCfg = field(default_factory=AutoencoderCfg)
    ray_encodings: RayEncodingsCfg = field(default_factory=RayEncodingsCfg)
    use_cfg: bool = False
    cfg_scale: float = 3.0
    cfg_train: bool = True
    use_ray_encoding: bool = True
    srt_ray_encoding: bool = False
    use_ddim_scheduler: bool = False
    use_plucker: bool = False
    ema: bool = False
    use_ema_sampling: bool = False
    enable_xformers_memory_efficient_attention: bool = False  # config parity


def ray_channel_count(cfg: ModelCfg) -> int:
    """Ray-encoding channel math (reference ``diffusion_wrapper.py:98-127``)."""
    if cfg.srt_ray_encoding:
        return 2 * (
            cfg.ray_encodings.num_origin_octaves * 3
            + cfg.ray_encodings.num_direction_octaves * 3
        )
    if cfg.use_ray_encoding:
        n = 0
        if cfg.ray_encodings.num_origin_octaves > 0:
            n += 3 * cfg.ray_encodings.num_origin_octaves * 2
        if cfg.ray_encodings.num_direction_octaves > 0:
            n += 3 * cfg.ray_encodings.num_direction_octaves * 2
        return n
    return 3 + 3


def unet_in_channels(cfg: ModelCfg) -> int:
    """latent + ray channels + 1 mask channel."""
    latent = cfg.autoencoder.kwargs.latent_channels
    return latent + ray_channel_count(cfg) + 1


@jax.tree_util.register_dataclass
@dataclass
class Batch:
    """A flattened multi-view batch: all views concatenated (context first),
    with per-view camera data and a target-role vector.

    images: (b, v, h, w, 3) in [0, 1]; extrinsics: (b, v, 4, 4) c2w;
    intrinsics: (b, v, 3, 3) normalized; is_target: (b, v) bool.
    latent_moments: optional (b, v, h/8, w/8, 2c) precomputed VAE posterior
    moments (data/latent_cache.py); when set, the training loss samples
    latents from them instead of encoding ``images`` (which may then be
    None — the latent-cache pipeline never decodes pixels).
    """

    images: Optional[Array]
    extrinsics: Array
    intrinsics: Array
    is_target: Array
    latent_moments: Optional[Array] = None

    @property
    def num_views(self) -> int:
        return self.extrinsics.shape[1]


class DiffusionEngine:
    """Binds modules + scheduler + cfg; all methods are pure functions of
    (params, inputs, rng) and safe under jit/pjit."""

    def __init__(
        self,
        model_cfg: ModelCfg,
        unet: MultiViewUNet,
        vae: AutoencoderKL,
        scheduler: DDIMScheduler | DDPMScheduler,
        dtype: jnp.dtype = jnp.float32,
        cfg_mode: str = "auto",
    ):
        self.cfg = model_cfg
        self.unet = unet
        self.vae = vae
        self.scheduler = scheduler
        self.dtype = dtype
        # CFG execution strategy, numerically identical either way:
        # "sequential" — cond forward on ctx+tgt, then uncond on tgt only
        #   (the reference's form, diffusion_wrapper.py:435-441; 20% fewer
        #   view-forwards, wins at large sampling batches);
        # "batched" — one launch with 2b rows and the uncond row's context
        #   views masked out of joint attention (wins at tiny batches where
        #   the MXU is utilization-bound: measured 51 ms vs 90 ms per step
        #   at b=1 on v5e);
        # "auto" — batched when the conditional row count b <= 2 (shapes are
        #   static under jit, so this resolves at trace time).
        assert cfg_mode in ("sequential", "batched", "auto")
        self.cfg_mode = cfg_mode
        # Training-only: rematerialize the UNet forward during backward
        # (activation-memory for FLOPs trade; set via trainer.remat).
        self.remat_unet = False

    def _resolve_cfg_mode(self, b: int) -> str:
        if self.cfg_mode != "auto":
            return self.cfg_mode
        return "batched" if b <= 2 else "sequential"

    # ------------------------------------------------------------------ VAE

    def encode_images(self, vae_params, images: Array, rng: Array) -> Array:
        """(b, v, h, w, 3) in [0,1] -> (b, v, h/8, w/8, 4) scaled latents
        (reference ``first_stage_encode:278-287``)."""
        b, v, h, w, c = images.shape
        flat = images.reshape(b * v, h, w, c) * 2.0 - 1.0
        dist = self.vae.apply(
            {"params": vae_params}, flat, method=AutoencoderKL.encode
        )
        latents = dist.sample(rng) * VAE_SCALE
        return latents.reshape(b, v, h // 8, w // 8, -1)

    def decode_latents(self, vae_params, latents: Array) -> Array:
        """(b, v, h, w, 4) scaled latents -> (b, v, 8h, 8w, 3) in [0,1]
        (reference ``last_stage_decode:289-298``)."""
        b, v, h, w, c = latents.shape
        flat = latents.reshape(b * v, h, w, c) / VAE_SCALE
        images = self.vae.apply(
            {"params": vae_params}, flat, method=AutoencoderKL.decode
        )
        images = images.reshape(b, v, h * 8, w * 8, -1)
        return jnp.clip(images / 2.0 + 0.5, 0.0, 1.0)

    # ----------------------------------------------------------------- rays

    def ray_encode(
        self, extrinsics: Array, intrinsics: Array, latent_hw: Tuple[int, int]
    ) -> Array:
        """Per-view ray channels at latent resolution -> (b, v, h, w, c_ray)
        (reference ``ray_encode:301-322`` + ``generate_image_rays:169-190``)."""
        hl, wl = latent_hw
        xy, _ = sample_image_grid((hl, wl))  # (h, w, 2)
        xy = xy.reshape(1, 1, hl * wl, 2)
        origins, directions = get_world_rays(
            xy, extrinsics[:, :, None], intrinsics[:, :, None]
        )  # (b, v, h*w, 3)

        if self.cfg.use_plucker:
            origins = jnp.cross(origins, directions, axis=-1)

        if self.cfg.srt_ray_encoding:
            enc = srt_ray_encode(
                origins,
                directions,
                pos_octaves=self.cfg.ray_encodings.num_origin_octaves,
                ray_octaves=self.cfg.ray_encodings.num_direction_octaves,
            )
        elif self.cfg.use_ray_encoding:
            parts = []
            if self.cfg.ray_encodings.num_origin_octaves > 0:
                parts.append(
                    positional_encoding(
                        origins, self.cfg.ray_encodings.num_origin_octaves
                    )
                )
            if self.cfg.ray_encodings.num_direction_octaves > 0:
                parts.append(
                    positional_encoding(
                        directions, self.cfg.ray_encodings.num_direction_octaves
                    )
                )
            enc = jnp.concatenate(parts, axis=-1)
        else:
            # Live baseline: raw origin + direction channels
            # (reference diffusion_wrapper.py:124-125, use_ray_encoding=false).
            enc = jnp.concatenate([origins, directions], axis=-1)

        b, v = extrinsics.shape[:2]
        return enc.reshape(b, v, hl, wl, -1).astype(self.dtype)

    # ------------------------------------------------------------- training

    def training_loss(
        self,
        unet_params,
        vae_params,
        batch: Batch,
        rng: Array,
        num_context_views: int,
    ) -> Tuple[Array, Dict[str, Array]]:
        """Noise-prediction MSE (reference ``training_step:324-411``).

        ``batch.is_target`` marks the nominal target views; the first
        ``num_context_views`` views are the nominal context whose role may be
        randomly flipped to target (reference ``sample_indices``).
        """
        cfg = self.cfg
        b, v = batch.extrinsics.shape[:2]
        v_c = num_context_views
        keys = jax.random.split(rng, 6)

        # --- context-count sampling (reference :336-337 via sample_indices).
        # Per example: n_ctx ~ U{1..v_c}; a random permutation of the context
        # slots decides which stay context when n_ctx < v_c.
        n_ctx = jax.random.randint(keys[0], (b,), 1, v_c + 1)
        perm_scores = jax.random.uniform(keys[1], (b, v_c))
        ctx_rank = jnp.argsort(jnp.argsort(perm_scores, axis=-1), axis=-1)
        ctx_keep = ctx_rank < n_ctx[:, None]  # (b, v_c) True -> stays context
        is_target = jnp.concatenate(
            [~ctx_keep, jnp.ones((b, v - v_c), dtype=bool)], axis=1
        )

        # --- absolute vs relative poses, 50/50 (reference :344-353).
        # rel view = random kept context slot.
        rel_scores = jnp.where(ctx_keep, perm_scores, jnp.inf)
        rel_index = jnp.argmin(rel_scores, axis=-1)  # (b,)
        use_relative = jax.random.bernoulli(keys[2], 0.5, (b,))
        rel_extrinsics = jax.vmap(absolute_to_relative_camera)(
            batch.extrinsics, rel_index
        )
        extrinsics = jnp.where(
            use_relative[:, None, None, None], rel_extrinsics, batch.extrinsics
        )

        # --- VAE encode all views (frozen: stop_gradient; reference :356-359).
        # With precomputed posterior moments (latent_cache), the per-step
        # sample z = mean + std*eps is drawn from the SAME DiagonalGaussian
        # the encoder would produce — identical training distribution, no
        # encoder flops in the step.
        if batch.latent_moments is not None:
            from ..models.vae import DiagonalGaussian

            moments = batch.latent_moments.astype(self.dtype)
            flat = moments.reshape(b * v, *moments.shape[2:])
            z = DiagonalGaussian(flat).sample(keys[3]) * VAE_SCALE
            latents = z.reshape(b, v, *z.shape[1:])
        else:
            latents = self.encode_images(vae_params, batch.images, keys[3])
        latents = jax.lax.stop_gradient(latents)
        hl, wl = latents.shape[2:4]

        # --- noise targets (reference :362-370).
        noise = jax.random.normal(keys[4], latents.shape, dtype=latents.dtype)
        t_key, cfg_key = jax.random.split(keys[5])
        timestep_target = jax.random.randint(
            t_key, (b,), 0, self.scheduler.num_train_timesteps
        )
        noisy = self.scheduler.add_noise(
            latents.reshape(b, -1), noise.reshape(b, -1), timestep_target
        ).reshape(latents.shape)
        tmask = is_target[:, :, None, None, None]
        latents_in = jnp.where(tmask, noisy, latents)

        # --- CFG dropout, 10% unconditional per example (reference :380-397).
        unconditional = jnp.zeros((b,), dtype=bool)
        if cfg.cfg_train:
            unconditional = jax.random.bernoulli(cfg_key, 0.1, (b,))
        # Views that participate in attention: targets always; context only
        # when conditional.
        view_mask = is_target | ~unconditional[:, None]

        # --- UNet inputs: [latents, mask, rays] (reference :373-398).
        rays = self.ray_encode(extrinsics, batch.intrinsics, (hl, wl))
        mask_ch = is_target.astype(latents.dtype)[:, :, None, None, None]
        mask_ch = jnp.broadcast_to(mask_ch, (b, v, hl, wl, 1))
        inputs = jnp.concatenate(
            [latents_in.astype(self.dtype), mask_ch.astype(self.dtype), rays],
            axis=-1,
        )
        timesteps = jnp.where(is_target, timestep_target[:, None], 0)

        def apply_unet(p, x, t, m):
            return self.unet.apply({"params": p}, x, t, view_mask=m)

        if self.remat_unet:
            apply_unet = jax.checkpoint(apply_unet)
        pred = apply_unet(unet_params, inputs, timesteps, view_mask)

        # --- masked MSE over target views only (reference :401-408).
        sq = (pred.astype(jnp.float32) - noise.astype(jnp.float32)) ** 2
        per_view = jnp.mean(sq, axis=(2, 3, 4))
        loss = jnp.sum(per_view * is_target) / jnp.maximum(jnp.sum(is_target), 1)
        return loss, {"loss/diffusion": loss}

    # ------------------------------------------------------------- sampling

    def _unet_inputs(
        self,
        context_latents: Array,
        x_t: Array,
        rays: Array,
    ) -> Array:
        """Assemble [latents ‖ mask ‖ rays] for ctx+tgt (reference :476-479)."""
        b, v_c = context_latents.shape[:2]
        v_t = x_t.shape[1]
        hl, wl = x_t.shape[2:4]
        lat = jnp.concatenate([context_latents, x_t], axis=1)
        mask = jnp.concatenate(
            [
                jnp.zeros((b, v_c, hl, wl, 1), dtype=lat.dtype),
                jnp.ones((b, v_t, hl, wl, 1), dtype=lat.dtype),
            ],
            axis=1,
        )
        return jnp.concatenate(
            [lat.astype(self.dtype), mask.astype(self.dtype), rays], axis=-1
        )

    def denoise_step(
        self,
        unet_params,
        x_t: Array,
        ts: Array,
        context_latents: Array,
        rays: Array,
        step_rng: Array | None = None,
    ) -> Array:
        """One CFG denoise step (reference ``step():413-453``), batched CFG."""
        cfg = self.cfg
        b, v_c = context_latents.shape[:2]
        v_t = x_t.shape[1]
        v = v_c + v_t

        x_t_scaled = self.scheduler.scale_model_input(x_t, ts)
        inputs = self._unet_inputs(context_latents, x_t_scaled, rays)
        timesteps = jnp.concatenate(
            [
                jnp.zeros((b, v_c), dtype=jnp.int32),
                jnp.broadcast_to(ts.astype(jnp.int32), (b, v_t)),
            ],
            axis=1,
        )

        if cfg.use_cfg and self._resolve_cfg_mode(b) == "batched":
            # One launch: rows [0, b) conditional, rows [b, 2b) unconditional
            # with context views masked out of the joint attention.
            inputs2 = jnp.concatenate([inputs, inputs], axis=0)
            timesteps2 = jnp.concatenate([timesteps, timesteps], axis=0)
            cond_mask = jnp.ones((b, v), dtype=bool)
            uncond_mask = jnp.concatenate(
                [jnp.zeros((b, v_c), dtype=bool), jnp.ones((b, v_t), dtype=bool)],
                axis=1,
            )
            view_mask = jnp.concatenate([cond_mask, uncond_mask], axis=0)
            pred = self.unet.apply(
                {"params": unet_params}, inputs2, timesteps2, view_mask=view_mask
            )
            pred_cond = pred[:b, v_c:]
            pred_uncond = pred[b:, v_c:]
            pred_out = pred_uncond + cfg.cfg_scale * (pred_cond - pred_uncond)
        elif cfg.use_cfg:
            # Sequential CFG (the reference's two forwards): conditional on
            # ctx+tgt, unconditional on the target views alone.
            pred_cond = self.unet.apply(
                {"params": unet_params}, inputs, timesteps
            )
            pred_uncond = self.unet.apply(
                {"params": unet_params}, inputs[:, v_c:], timesteps[:, v_c:]
            )
            pred_out = pred_uncond + cfg.cfg_scale * (
                pred_cond[:, v_c:] - pred_uncond
            )
        else:
            pred = self.unet.apply({"params": unet_params}, inputs, timesteps)
            pred_out = pred[:, v_c:]

        if isinstance(self.scheduler, DDPMScheduler):
            # Ancestral sampling needs per-step noise.
            return self.scheduler.step(
                pred_out.astype(jnp.float32), ts, x_t.astype(jnp.float32),
                rng=step_rng,
            )
        return self.scheduler.step(
            pred_out.astype(jnp.float32), ts, x_t.astype(jnp.float32)
        )

    def sample_latents(
        self,
        unet_params,
        context_latents: Array,
        extrinsics: Array,
        intrinsics: Array,
        num_target_views: int,
        rng: Array,
        initial_noise: Array | None = None,
    ) -> Array:
        """DDIM loop over latents (reference ``sample():455-490``) under one
        ``lax.scan``. ``extrinsics``/``intrinsics`` cover ctx+tgt views in
        order. ``initial_noise`` (b, v_t, hl, wl, 4) overrides the N(0,1)
        draw — the cross-framework parity harness injects the torch
        reference's noise here (scripts/verify_parity.py). Returns
        (b, v_t, hl, wl, 4) scaled latents."""
        b, v_c, hl, wl, c = context_latents.shape
        if initial_noise is None:
            initial_noise = jax.random.normal(
                rng, (b, num_target_views, hl, wl, c), dtype=jnp.float32
            )
        x_t = initial_noise.astype(jnp.float32) * self.scheduler.init_noise_sigma
        rays = self.ray_encode(extrinsics, intrinsics, (hl, wl))
        timesteps = jnp.asarray(self.scheduler.timesteps(), dtype=jnp.int32)
        step_keys = jax.random.split(
            jax.random.fold_in(rng, 1), len(timesteps)
        )

        def body(x, scan_in):
            ts, key = scan_in
            x = self.denoise_step(
                unet_params, x, ts, context_latents, rays, step_rng=key
            )
            return x, None

        x_t, _ = jax.lax.scan(body, x_t, (timesteps, step_keys))
        return x_t

    def sample(
        self,
        unet_params,
        vae_params,
        context_images: Array,
        extrinsics: Array,
        intrinsics: Array,
        num_target_views: int,
        rng: Array,
        initial_noise: Array | None = None,
    ) -> Array:
        """Full pipeline: encode context, DDIM, decode targets.
        Returns (b, v_t, H, W, 3) images in [0, 1]."""
        k_enc, k_noise = jax.random.split(rng)
        context_latents = self.encode_images(vae_params, context_images, k_enc)
        latents = self.sample_latents(
            unet_params,
            context_latents,
            extrinsics,
            intrinsics,
            num_target_views,
            k_noise,
            initial_noise=initial_noise,
        )
        return self.decode_latents(vae_params, latents)
