"""CLI test for the sampling entry point (scene_id resolution +
autoregressive mode), on synthetic data with the tiny model."""

import json
from pathlib import Path

import numpy as np
import pytest

from synthetic_data import write_synthetic_dataset

pytestmark = pytest.mark.slow  # multi-minute XLA compiles


class TestGenerateMvldm:
    def test_scene_hash_autoregressive(self, tmp_path_factory):
        from mvldm_tpu.scripts import generate_mvldm

        data_root = write_synthetic_dataset(
            tmp_path_factory.mktemp("re10k"), frames_per_scene=20
        )
        run_dir = tmp_path_factory.mktemp("gen")
        generate_mvldm.main(
            [
                "+experiment=tiny",
                f"dataset.root={data_root}",
                f"output_dir={run_dir}",
                "scene_id=scenetest0001",
                "test.sampling_mode=autoregressive",
                "test.limit_frames=6",
                "trainer.limit_test_batches=1",
                "dataset.view_sampler.max_distance_between_context_views=8",
                "dataset.image_shape=[32,32]",
            ]
        )
        video_dir = run_dir / "video" / "scenetest0001"
        colors = sorted((video_dir / "color").glob("*.png"))
        assert len(colors) == 6
