"""Multi-host bootstrap and per-process data striping.

Reference surface: DDP/Lightning multi-node bring-up (``src/main.py:123-133``)
and dataloader-worker chunk striping (``src/dataset/dataset_re10k.py:87-92``).
Here: env-gated ``jax.distributed.initialize`` (parallel/distributed.py) and
process-striped test chunks (data/loader.py + dataset_re10k.py).
"""

import numpy as np
import pytest

from mvldm_tpu.data.dataset_re10k import DatasetRE10k, DatasetRE10kCfg
from mvldm_tpu.data.view_samplers import ViewSamplerBounded, ViewSamplerBoundedCfg
from mvldm_tpu.parallel.distributed import maybe_initialize_distributed
from synthetic_data import write_synthetic_dataset


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("re10k_dist")
    return write_synthetic_dataset(
        root, frames_per_scene=30, scenes_per_stage=5
    )


class TestMaybeInitializeDistributed:
    def test_noop_without_env(self):
        assert maybe_initialize_distributed(env={}) is False

    def test_partial_triplet_raises(self):
        with pytest.raises(ValueError, match="Partial multi-host"):
            maybe_initialize_distributed(
                env={"MVLDM_COORDINATOR": "host0:8476"}
            )
        with pytest.raises(ValueError, match="Partial multi-host"):
            maybe_initialize_distributed(
                env={
                    "MVLDM_NUM_PROCESSES": "4",
                    "MVLDM_PROCESS_ID": "0",
                }
            )

    def test_env_flag_shapes(self):
        # The truthiness parse of MVLDM_DISTRIBUTED (without actually
        # standing up a coordinator, which needs multiple processes).
        assert maybe_initialize_distributed(env={"MVLDM_DISTRIBUTED": "0"}) \
            is False
        assert maybe_initialize_distributed(
            env={"MVLDM_DISTRIBUTED": "no"}
        ) is False


class TestProcessStriping:
    def _dataset(self, root, worker_index, num_workers, stage="test"):
        sampler = ViewSamplerBounded(
            ViewSamplerBoundedCfg(
                num_context_views=2,
                num_target_views=3,
                min_distance_between_context_views=5,
                max_distance_between_context_views=15,
            ),
            stage, False, False, None, rng=np.random.default_rng(0),
        )
        return DatasetRE10k(
            DatasetRE10kCfg(root=root), stage, sampler,
            rng=np.random.default_rng(0),
            worker_index=worker_index, num_workers=num_workers,
        )

    def test_test_stage_partition_disjoint_and_complete(self, data_root):
        """Across N processes, every test scene is yielded exactly once."""
        all_scenes = {ex.scene for ex in self._dataset(data_root, 0, 1)}
        assert len(all_scenes) == 5

        for n in (2, 3):
            per_process = [
                [ex.scene for ex in self._dataset(data_root, i, n)]
                for i in range(n)
            ]
            union = [s for scenes in per_process for s in scenes]
            assert sorted(union) == sorted(all_scenes), (
                f"striping at n={n} lost or duplicated scenes: {per_process}"
            )

    def test_train_stage_not_striped(self, data_root):
        """Training keeps every chunk on every process (each host draws an
        independent shuffled stream instead; reference stripes only the
        test stage, dataset_re10k.py:87-92)."""
        ds = self._dataset(data_root, 1, 2, stage="train")
        # One epoch over the (non-shuffled in-chunk) iterator touches all
        # scenes despite worker_index=1.
        scenes = set()
        for i, ex in enumerate(ds):
            scenes.add(ex.scene)
            if i >= 20:
                break
        assert len(scenes) == 5
