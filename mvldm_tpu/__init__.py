"""mvldm_tpu — a TPU-native (JAX / XLA / Pallas / pjit) multi-view latent diffusion
framework with the capabilities of the MV-LDM reference (CAT3D-style multi-view
generation on RealEstate10K).

Layer map (mirrors SURVEY.md §1, rebuilt TPU-first):

  scripts/      CLI entry points (train / generate / metrics)
  config.py     YAML composition + typed dataclass config surface
  diffusion/    schedulers (pure-jnp DDIM/DDPM) and the DiffusionEngine
                (training loss, lax.scan DDIM sampling, CFG, video samplers)
  models/       Flax VAE (SD2.1 AutoencoderKL), multi-view UNet, cross-view
                attention, ray encodings
  ops/          Pallas TPU kernels (fused flash attention) + jnp references
  parallel/     jax.sharding Mesh construction and sharding rules
  data/         RE10K chunk reader, view samplers, shims, host prefetch loader
  training/     optax optimizer/EMA/accumulation, pjit train step, orbax ckpt
  evaluation/   metrics (PSNR/SSIM/LPIPS), metric computer, GT saver
  visualization/ image layout / annotation helpers
  utils/        image IO, torch-checkpoint weight conversion
"""

__version__ = "0.1.0"
