"""Produce the torch-side parity fixture for scripts/verify_parity.py.

Run this on a machine with the reference repo (mohammadasim98/mv-ldm), its
requirements, and the released checkpoint (HF ``asimbluemoon/mvldm-1.0``):

    cd <mv-ldm checkout>
    python <this file> --ckpt checkpoints/1679000.ckpt \\
        --jax-fixture jax_fixture.npz --output torch_fixture.npz

It drives the reference's own modules (DiffusionWrapper.first_stage_encode /
step / last_stage_decode, reference src/model/diffusion_wrapper.py:278-490)
on the exact context latents + initial noise recorded in the JAX-side
fixture (verify_parity smoke mode), so both frameworks integrate the same
ODE from the same state and the diff isolates weight-conversion/numerics.
"""

from __future__ import annotations

import argparse

import numpy as np


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--ckpt", required=True)
    parser.add_argument("--jax-fixture", required=True,
                        help="jax_fixture.npz from verify_parity smoke mode")
    parser.add_argument("--output", default="torch_fixture.npz")
    parser.add_argument("--steps", type=int, default=25)
    args = parser.parse_args()

    import torch
    from src.config import load_typed_root_config
    from src.global_cfg import set_cfg
    from src.model.diffusion_wrapper import DiffusionWrapper
    import hydra
    from omegaconf import OmegaConf

    with hydra.initialize(version_base=None, config_path="config"):
        cfg_dict = hydra.compose("main", overrides=["+experiment=baseline"])
    set_cfg(cfg_dict)
    cfg = load_typed_root_config(cfg_dict)

    wrapper = DiffusionWrapper.load_from_checkpoint(
        args.ckpt, cfg=cfg.model, test_cfg=cfg.test, train_cfg=cfg.train,
        map_location="cpu", strict=False,
    )
    wrapper.eval()

    fx = np.load(args.jax_fixture)
    # JAX fixture is NHWC; torch modules are NCHW.
    ctx_latents = torch.from_numpy(fx["context_latents"]).permute(0, 1, 4, 2, 3)
    noise = torch.from_numpy(fx["initial_noise"]).permute(0, 1, 4, 2, 3)
    extr = torch.from_numpy(fx["extrinsics"]).float()
    intr = torch.from_numpy(fx["intrinsics"]).float()
    b, v_c = ctx_latents.shape[:2]
    v_t = noise.shape[1]

    sched = wrapper.scheduler
    sched.set_timesteps(args.steps)
    x_t = noise * sched.init_noise_sigma

    # Ray encodings + masks exactly as the reference sample() assembles them
    # (diffusion_wrapper.py:467-488).
    hl, wl = ctx_latents.shape[-2:]
    rays = wrapper.ray_encode(extr, intr, (hl, wl))
    with torch.no_grad():
        for ts in sched.timesteps:
            x_t = wrapper.step(
                wrapper.denoiser, x_t, ts, ctx_latents, rays, v_c
            )
        images = wrapper.last_stage_decode(x_t)

    np.savez(
        args.output,
        context_latents=fx["context_latents"],
        initial_noise=fx["initial_noise"],
        extrinsics=fx["extrinsics"],
        intrinsics=fx["intrinsics"],
        latents_final=x_t.permute(0, 1, 3, 4, 2).numpy(),
        images_out=images.permute(0, 1, 3, 4, 2).numpy(),
        num_inference_steps=args.steps,
    )
    print(f"Wrote {args.output}")
    print("NOTE: wrapper.step's exact signature varies by reference "
          "revision — adapt the call above to diffusion_wrapper.py:413 "
          "(model, x_t, ts, context inputs, ray encodings) if it differs.")


if __name__ == "__main__":
    main()
