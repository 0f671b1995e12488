"""Decompose single-scene autoregressive sampling latency (VERDICT r3 #8).

Autoregressive mode (reference ``diffusion_wrapper.py:904-1055``) is a
sequential chain: window N's context frame is window N-1's last output, so
windows cannot batch with each other — each is a batch-1 launch. The chain
is already fully device-resident (no mid-scene host syncs,
``video_sampling.dispatch_autoregressive``), so the remaining question is
WHERE a batch-1 window spends its time and what the sequential-dependency
floor is. This probe times, with dependency-chained launches on the real
chip:

  anchor      — the initial batch-1 launch (1 ctx view -> num_anchors tgts)
  window      — one steady-state window (2 ctx views -> group_size tgts),
                end to end (uint8 ctx -> VAE encode -> 25-step DDIM -> decode)
  denoise     — the window's DDIM scan alone (ctx latents precomputed)
  vae_encode  — the window's 2-frame context encode alone
  vae_decode  — the window's group_size-frame decode alone
  window_s4   — the same window launch with 4 scenes stacked (the lockstep
                scene-batched path), reported PER SCENE: the utilization
                headroom that the single-scene dependency forbids.

floor = anchor + ceil((n_frames - num_anchors)/group_size) * window; the
bench-measured single-scene AR rate must sit at ~ n_frames/floor — anything
above the floor would be dispatch overhead, anything below, measurement
error. Usage: python tools/bench_ar_decompose.py [--frames 80]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    str(Path(__file__).parent.parent / ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np


def chain_timed(step, n=8):
    """step(i, prev) -> device array consumed by step i+1 (real dependency
    chain; the final np.asarray bounds the whole chain honestly on the
    optimistically-acknowledging tunnel)."""
    prev = step(0, None)
    np.asarray(jax.tree_util.tree_leaves(prev)[0])  # warm/compile
    t0 = time.perf_counter()
    for i in range(n):
        prev = step(i + 1, prev)
    np.asarray(jax.tree_util.tree_leaves(prev)[0])
    return (time.perf_counter() - t0) / n


def main() -> None:
    import bench
    from mvldm_tpu.diffusion.video_sampling import VideoSampler

    n_frames = 80
    if "--frames" in sys.argv:
        n_frames = int(sys.argv[sys.argv.index("--frames") + 1])

    engine, unet_params, vae_params = bench.build_flagship()
    sampler = VideoSampler(engine, unet_params, vae_params, num_anchors_views=4)
    ctx, tgt = bench.make_scene(n_frames)
    g = sampler.group_size

    u8 = lambda x: (np.clip(x, 0, 1) * 255).astype(np.uint8)
    ctx1_u8 = jnp.asarray(u8(ctx.images))              # (1, h, w, 3)
    ctx2_u8 = jnp.asarray(u8(np.concatenate([ctx.images, tgt.images[:1]])))
    extr_a = jnp.asarray(
        np.concatenate([ctx.extrinsics, tgt.extrinsics[: sampler.num_anchors]])
    )[None]
    intr_a = jnp.asarray(
        np.concatenate([ctx.intrinsics, tgt.intrinsics[: sampler.num_anchors]])
    )[None]
    extr_w = jnp.asarray(
        np.concatenate([ctx.extrinsics, tgt.extrinsics[: g + 1]])
    )[None]
    intr_w = jnp.asarray(
        np.concatenate([ctx.intrinsics, tgt.intrinsics[: g + 1]])
    )[None]

    results = {}

    # --- anchor launch (1 ctx -> num_anchors targets), chained on ctx.
    def anchor_step(i, prev):
        c = ctx1_u8 if prev is None else prev[:, -1][0][None]
        return sampler._sample(
            unet_params, vae_params, c[None], extr_a, intr_a,
            num_target_views=sampler.num_anchors, rng=jax.random.PRNGKey(i),
        )

    results["anchor_s"] = chain_timed(anchor_step)

    # --- steady-state window (2 ctx -> group_size targets), chained: the
    # next window's second context frame is this window's last output —
    # exactly dispatch_autoregressive's dependency.
    def window_step(i, prev):
        c = ctx2_u8 if prev is None else jnp.concatenate(
            [ctx1_u8, prev[0, -1][None]], axis=0
        )
        return sampler._sample(
            unet_params, vae_params, c[None], extr_w, intr_w,
            num_target_views=g, rng=jax.random.PRNGKey(i),
        )

    results["window_s"] = chain_timed(window_step)

    # --- pieces of the window, each chained on its own output.
    images2 = ctx2_u8.astype(jnp.float32)[None] / 255.0

    @jax.jit
    def enc(images, rng):
        return engine.encode_images(vae_params, images, rng)

    def enc_step(i, prev):
        imgs = images2 if prev is None else images2 + 0.0 * prev[0, 0, 0, 0, 0]
        return enc(imgs, jax.random.PRNGKey(i))

    results["vae_encode_s"] = chain_timed(enc_step)

    ctx_lat = jax.block_until_ready(enc(images2, jax.random.PRNGKey(0)))

    @jax.jit
    def denoise(lat, rng):
        return engine.sample_latents(
            unet_params, lat, extr_w, intr_w, num_target_views=g, rng=rng
        )

    def denoise_step(i, prev):
        lat = ctx_lat if prev is None else ctx_lat + 0.0 * prev[0, 0, 0, 0, 0]
        return denoise(lat, jax.random.PRNGKey(i))

    results["denoise_s"] = chain_timed(denoise_step)

    tgt_lat = jax.block_until_ready(
        denoise(ctx_lat, jax.random.PRNGKey(0))
    )

    @jax.jit
    def dec(lat):
        return engine.decode_latents(vae_params, lat)

    def dec_step(i, prev):
        lat = tgt_lat if prev is None else tgt_lat + 0.0 * prev[0, 0, 0, 0, 0]
        return dec(lat)

    results["vae_decode_s"] = chain_timed(dec_step)

    # --- the same window stacked 4 scenes deep (lockstep scene batching),
    # per-scene cost: the headroom the sequential dependency forbids at S=1.
    S = 4

    def window_s4_step(i, prev):
        c = (
            jnp.tile(ctx2_u8[None], (S, 1, 1, 1, 1))
            if prev is None
            else jnp.concatenate(
                [jnp.tile(ctx1_u8[None], (S, 1, 1, 1, 1)), prev[:, -1:]], axis=1
            )
        )
        return sampler._sample(
            unet_params, vae_params, c,
            jnp.tile(extr_w, (S, 1, 1, 1)), jnp.tile(intr_w, (S, 1, 1)),
            num_target_views=g, rng=jax.random.PRNGKey(i),
        )

    results["window_s4_per_scene_s"] = chain_timed(window_s4_step) / S

    n_windows = -(-(n_frames - sampler.num_anchors) // g)
    floor = results["anchor_s"] + n_windows * results["window_s"]
    results["n_windows"] = n_windows
    results["floor_scene_s"] = floor
    results["floor_fps"] = n_frames / floor
    results["window_pieces_sum_s"] = (
        results["vae_encode_s"] + results["denoise_s"] + results["vae_decode_s"]
    )
    # Latent-feedthrough floor (test.ar_latent_feedthrough): the window
    # drops its 2-frame context encode — the chain becomes denoise +
    # decode (the decode still serializes on the single TensorCore even
    # though it is off the data-dependency path).
    floor_feed = results["anchor_s"] + n_windows * (
        results["denoise_s"] + results["vae_decode_s"]
    )
    results["floor_feedthrough_scene_s"] = floor_feed
    results["floor_feedthrough_fps"] = n_frames / floor_feed
    print(json.dumps({k: round(v, 4) for k, v in results.items()}))


if __name__ == "__main__":
    main()
