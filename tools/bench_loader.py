"""Input-pipeline throughput: examples/s of the train dataloader at the
flagship configuration (batch 6, 2 ctx + 3 tgt 360x640 JPEG frames decoded
and LANCZOS-cropped to 256x256), vs the decode-pool width.

The train loop must never be input-bound: the single-chip train step is
~2.3 s at batch 1 (BENCHMARKS.md), i.e. the loader needs >~0.5 examples/s
per chip, with >=2x headroom preferred. Run:

    python tools/bench_loader.py [num_scenes] [frames_per_scene]
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))

# Host-side input-pipeline bench: devices are irrelevant, so force the CPU
# backend. The env var alone is not enough here — a sitecustomize may pin an
# accelerator platform in the live jax config (and initializing a tunneled
# backend can hang when the tunnel is down); both must point at cpu before
# the DataModule's first jax.process_index() call.
os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def main() -> None:
    import tempfile

    from mvldm_tpu.data.dataset_re10k import DatasetRE10kCfg
    from mvldm_tpu.data.loader import (
        DataLoaderCfg,
        DataLoaderStageCfg,
        DataModule,
    )
    from mvldm_tpu.data.view_samplers import ViewSamplerBoundedCfg
    from synthetic_data import write_synthetic_dataset

    n_scenes = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    frames = int(sys.argv[2]) if len(sys.argv) > 2 else 40

    with tempfile.TemporaryDirectory() as tmp:
        root = write_synthetic_dataset(
            Path(tmp), stages=("train",), scenes_per_stage=n_scenes,
            frames_per_scene=frames,
        )
        dataset_cfg = DatasetRE10kCfg(root=root)
        sampler_cfg = ViewSamplerBoundedCfg(
            num_context_views=2,
            num_target_views=3,
            min_distance_between_context_views=5,
            max_distance_between_context_views=20,
        )

        for workers in (1, 4, 8, 16):
            loader_cfg = DataLoaderCfg(
                train=DataLoaderStageCfg(
                    num_workers=workers, batch_size=6, seed=0
                )
            )
            dm = DataModule(dataset_cfg, sampler_cfg, loader_cfg, None)
            it = dm.train_dataloader()
            # Warm-up (thread spin-up, first chunk reads).
            for _ in range(3):
                next(it)
            n_batches = 20
            t0 = time.perf_counter()
            for _ in range(n_batches):
                batch = next(it)
            dt = time.perf_counter() - t0
            ex_s = n_batches * 6 / dt
            print(
                f"num_workers={workers:>2}: {ex_s:7.2f} examples/s "
                f"({n_batches * 6} examples in {dt:.2f}s)"
            )


if __name__ == "__main__":
    main()
