"""One-time VAE-latent precompute pass (the latent-cache writer).

The training VAE is frozen (reference ``diffusion_wrapper.py:356-359``), so
its encode is a pure function of each crop-shimmed frame. This script sweeps
the dataset chunks once, encodes every frame (and its x-flipped variant, for
the 50% reflection augmentation) on the accelerator, and writes the posterior
moments to ``data/latent_cache.py``'s layout. Training then runs with
``dataset.latent_cache=<out>`` and never decodes a JPEG or touches the VAE
encoder again (measured effect: see the latent-cache note in BENCHMARKS.md).

    python -m mvldm_tpu.scripts.precompute_latents dataset.root=<path> \\
        checkpointing.load=<torch .ckpt> [out=<cache dir>] [stages=[train]]

No reference counterpart — the reference re-encodes every step.
"""

from __future__ import annotations

import sys
from dataclasses import dataclass, field
from pathlib import Path
from typing import List, Optional

import numpy as np

from ..config import (
    CheckpointingCfg,
    DatasetCfg,
    compose,
    from_dict,
    set_cfg,
)
from ..data.chunk_reader import convert_poses, decode_jpeg_bytes, load_chunk
from ..data.dataset_re10k import _fov_degrees
from ..data.latent_cache import cache_file, write_chunk_cache, write_meta
from ..data.shims import rescale_and_crop
from ..diffusion.engine import ModelCfg


@dataclass
class PrecomputeLatentsCfg:
    dataset: DatasetCfg = field(default_factory=DatasetCfg)
    model: ModelCfg = field(default_factory=ModelCfg)
    checkpointing: CheckpointingCfg = field(default_factory=CheckpointingCfg)
    seed: int = 0
    out: Optional[Path] = None
    stages: List[str] = field(default_factory=lambda: ["train"])
    encode_batch: int = 32
    no_flip: bool = False
    allow_init_vae: bool = False
    precision: Optional[str] = None


def load_precompute_cfg(overrides) -> PrecomputeLatentsCfg:
    cfg_dict = compose(overrides, main_name="precompute_latents")
    set_cfg(cfg_dict)
    return from_dict(PrecomputeLatentsCfg, cfg_dict, "root")


def build_encoder(cfg: PrecomputeLatentsCfg):
    """(jitted fixed-batch moments fn, latent_channels, fingerprint)."""
    import jax
    import jax.numpy as jnp

    from ..builder import resolve_dtype
    from ..models.vae import AutoencoderKL

    dtype = resolve_dtype(cfg.precision) if cfg.precision else jnp.float32
    vae = AutoencoderKL(cfg.model.autoencoder.kwargs, dtype=dtype)
    rng = jax.random.PRNGKey(cfg.seed)
    h, w = cfg.dataset.image_shape
    params = jax.jit(vae.init)(rng, jnp.zeros((1, h, w, 3), dtype), rng)[
        "params"
    ]

    load = cfg.checkpointing.load
    if load and str(load).endswith(".ckpt"):
        from ..builder import _overlay
        from ..training.checkpoint import load_torch_checkpoint_params

        converted = load_torch_checkpoint_params(Path(load))
        params = _overlay(params, converted["vae"])
        fingerprint = f"ckpt:{load} dtype:{jnp.dtype(dtype).name}"
        print(f"VAE encoder weights from {load}")
    elif cfg.allow_init_vae:
        fingerprint = (
            f"random-init(seed={cfg.seed}) dtype:{jnp.dtype(dtype).name}"
        )
        print(
            "WARNING: encoding with a RANDOM-INIT VAE (allow_init_vae) — "
            "the cache is only useful for pipeline tests."
        )
    else:
        raise SystemExit(
            "No VAE weights: pass checkpointing.load=<torch .ckpt> "
            "(the released mvldm checkpoint) or allow_init_vae=true "
            "for pipeline tests."
        )

    @jax.jit
    def moments_fn(images01):  # (n, h, w, 3) float32 in [0, 1]
        flat = images01.astype(dtype) * 2.0 - 1.0
        dist = vae.apply({"params": params}, flat,
                         method=AutoencoderKL.encode)
        m = jnp.concatenate([dist.mean, dist.logvar], axis=-1)
        return m.astype(jnp.float16)

    latent_channels = cfg.model.autoencoder.kwargs.latent_channels
    return moments_fn, latent_channels, fingerprint


def encode_frames(moments_fn, images: np.ndarray, batch: int) -> np.ndarray:
    """(n, h, w, 3) -> (n, h/8, w/8, 2c) f16 via fixed-shape device launches
    (the tail pads up to ``batch`` so every launch reuses one executable)."""
    n = images.shape[0]
    outs = []
    for i in range(0, n, batch):
        block = images[i : i + batch]
        pad = batch - block.shape[0]
        if pad:
            block = np.concatenate(
                [block, np.zeros((pad, *block.shape[1:]), block.dtype)]
            )
        m = np.asarray(moments_fn(block))
        outs.append(m[: batch - pad] if pad else m)
    return np.concatenate(outs, axis=0)


def run(cfg: PrecomputeLatentsCfg) -> None:
    if cfg.dataset.root is None:
        raise SystemExit("dataset.root is not defined.")
    out = Path(cfg.out) if cfg.out is not None else Path(
        str(cfg.dataset.root) + "_latents"
    )
    moments_fn, latent_channels, fingerprint = build_encoder(cfg)
    image_shape = tuple(cfg.dataset.image_shape)
    n_flips = 1 if cfg.no_flip else 2

    import jax

    for stage in cfg.stages:
        root = Path(cfg.dataset.root) / stage
        chunks = sorted(p for p in root.iterdir() if p.suffix == ".torch")
        # Multi-host: stripe chunks across processes (each host encodes on
        # its own chips and writes disjoint files; loader.py stripes the
        # same way at train time).
        if jax.process_count() > 1:
            chunks = chunks[jax.process_index() :: jax.process_count()]
        n_scenes = n_frames = 0
        for chunk_path in chunks:
            target = cache_file(out, stage, chunk_path.stem)
            if target.exists():
                print(f"[{stage}] {chunk_path.stem}: cache exists, skipping")
                continue
            scenes = {}
            for example in load_chunk(chunk_path):
                scene = example["key"]
                _, intrinsics = convert_poses(example["cameras"])
                if (_fov_degrees(intrinsics) > cfg.dataset.max_fov).any():
                    continue  # the dataset skips these scenes too
                frames = [decode_jpeg_bytes(b) for b in example["images"]]
                if any(f.shape != (360, 640, 3) for f in frames):
                    print(f"Skipped bad scene {scene} (frame shape).")
                    continue
                images = np.stack(frames)
                # Pixels-only half of the crop shim; the dataset applies the
                # matching intrinsics fix-up at train time
                # (shims.crop_shim_intrinsics).
                images, _ = rescale_and_crop(
                    images, intrinsics[: len(frames)], image_shape
                )
                variants = [images]
                if not cfg.no_flip:
                    variants.append(images[:, :, ::-1, :].copy())
                moments = np.stack(
                    [
                        encode_frames(moments_fn, v, cfg.encode_batch)
                        for v in variants
                    ],
                    axis=1,
                )  # (n, flips, h/8, w/8, 2c)
                scenes[scene] = moments
                n_scenes += 1
                n_frames += images.shape[0]
            write_chunk_cache(target, scenes)
            print(
                f"[{stage}] {chunk_path.stem}: {len(scenes)} scenes -> {target}"
            )
        if jax.process_index() == 0:  # one writer; content is static
            write_meta(out, stage, image_shape, latent_channels, n_flips,
                       fingerprint)
        print(
            f"[{stage}] done: {n_scenes} scenes / {n_frames} frames; "
            f"train with dataset.latent_cache={out}"
        )


def main(argv=None) -> None:
    overrides = list(argv if argv is not None else sys.argv[1:])
    run(load_precompute_cfg(overrides))


if __name__ == "__main__":
    main()
