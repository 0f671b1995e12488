"""Probe: per-scene anchored sampling, sequential vs cross-scene pipelined.

Production ``run_test`` dispatches scene N+1 before gathering scene N
(mvldm_tpu/scripts/main.py), overlapping the end-of-scene host transfer and
PNG export with the next scene's device compute. This probe measures what
that steady-state pipeline is worth vs the strictly sequential
dispatch+gather the headline bench times, and (with MVLDM_BENCH_STEPS=1)
how much of the scene is non-denoise overhead.

Usage:  python tools/bench_scene_pipeline.py [--scenes N]
        MVLDM_BENCH_STEPS=1 python tools/bench_scene_pipeline.py
"""

from __future__ import annotations

import os
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

import bench
from mvldm_tpu.diffusion.video_sampling import VideoSampler

NUM_STEPS = int(os.environ.get("MVLDM_BENCH_STEPS", str(bench.NUM_STEPS)))
bench.NUM_STEPS = NUM_STEPS


def main() -> None:
    n_scenes = 4
    if "--scenes" in sys.argv:
        n_scenes = int(sys.argv[sys.argv.index("--scenes") + 1])

    engine, unet_params, vae_params = bench.build_flagship()
    sampler = VideoSampler(
        engine, unet_params, vae_params, num_anchors_views=4
    )
    ctx, tgt = bench.make_scene(bench.NUM_FRAMES)

    # Warm-up compiles every shape bucket.
    sampler.sample_anchored(ctx, tgt, jax.random.PRNGKey(1))

    # Sequential: dispatch + gather per scene (what bench.py times).
    t0 = time.perf_counter()
    for i in range(n_scenes):
        r = sampler.sample_anchored(ctx, tgt, jax.random.PRNGKey(10 + i))
        assert len(r) == bench.NUM_FRAMES
    seq = (time.perf_counter() - t0) / n_scenes

    # Pipelined: dispatch scene i+1 before gathering scene i (run_test).
    t0 = time.perf_counter()
    pending = None
    for i in range(n_scenes):
        nxt = sampler.dispatch_anchored(ctx, tgt, jax.random.PRNGKey(20 + i))
        if pending is not None:
            assert len(VideoSampler.gather(pending)) == bench.NUM_FRAMES
        pending = nxt
    assert len(VideoSampler.gather(pending)) == bench.NUM_FRAMES
    piped = (time.perf_counter() - t0) / n_scenes

    fps_seq = bench.NUM_FRAMES / seq
    fps_piped = bench.NUM_FRAMES / piped
    print(
        f"steps={NUM_STEPS} scenes={n_scenes}  "
        f"sequential: {seq:.3f} s/scene ({fps_seq:.2f} f/s)   "
        f"pipelined: {piped:.3f} s/scene ({fps_piped:.2f} f/s)   "
        f"delta {(seq - piped) * 1e3:+.0f} ms/scene"
    )


if __name__ == "__main__":
    main()
