"""End-to-end smoke tests through the CLI entry points on synthetic data —
the BASELINE config #1 slice (train a couple of steps, then anchored video
sampling of one scene), all with the tiny experiment on the virtual CPU
mesh."""

import json
from pathlib import Path

import numpy as np
import pytest

from synthetic_data import write_synthetic_dataset

pytestmark = pytest.mark.slow  # multi-minute XLA compiles


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    return write_synthetic_dataset(
        tmp_path_factory.mktemp("re10k"), frames_per_scene=24
    )


class TestEndToEnd:
    def test_train_then_sample(self, data_root, tmp_path_factory):
        from mvldm_tpu.scripts import main as main_script

        run_dir = tmp_path_factory.mktemp("run")

        # --- train 2 steps (sharded over the 8-device CPU mesh).
        main_script.main(
            [
                "+experiment=tiny",
                "mode=train",
                f"dataset.root={data_root}",
                f"output_dir={run_dir}",
                "trainer.max_steps=2",
                "data_loader.train.batch_size=2",
                "checkpointing.every_n_train_steps=2",
                "trainer.accumulate_grad_batches=1",
                # In-training validation fires at step 2 (reference runs
                # validation_step every val_check_interval during fit).
                "trainer.val_check_interval=2",
                "data_loader.val.batch_size=1",
                # Sharded training compiles are covered by
                # test_training.py::TestShardedTrainStep and the driver
                # dryrun; the 8-way SPMD compile of the full train graph is
                # too slow for a single-core smoke test.
                "trainer.strategy=single_device",
                "dataset.image_shape=[32,32]",
            ]
        )
        metrics_log = run_dir / "metrics.jsonl"
        assert metrics_log.exists()
        records = [json.loads(l) for l in metrics_log.read_text().splitlines()]
        assert records[-1]["step"] == 2
        assert np.isfinite(records[-1]["loss/diffusion"])
        assert (run_dir / "checkpoints" / "step_000000002").exists()
        # Periodic validation artifacts (frusta + comparison grid + hists).
        val_dir = run_dir / "val" / "step_2"
        assert (val_dir / "cameras.png").exists()
        assert (val_dir / "distributions.png").exists()
        assert len(list(val_dir.glob("scene*.png"))) == 1

        # --- anchored video sampling of one scene, resuming the checkpoint.
        main_script.main(
            [
                "+experiment=tiny",
                "mode=test",
                f"dataset.root={data_root}",
                f"output_dir={run_dir}",
                "test.sampling_mode=anchored",
                "test.limit_frames=8",
                "trainer.limit_test_batches=1",
                "dataset.view_sampler.max_distance_between_context_views=10",
            ]
        )
        video_dir = run_dir / "video"
        scenes = [p for p in video_dir.iterdir() if p.is_dir()]
        assert len(scenes) == 1
        colors = sorted((scenes[0] / "color").glob("*.png"))
        assert len(colors) == 8
        assert (scenes[0] / "sampled.gif").exists()
        # Context frames saved alongside (reference test_batch behavior).
        assert len(list((scenes[0] / "context").glob("*.png"))) >= 1
