import json
from pathlib import Path

import numpy as np
import pytest

from mvldm_tpu.data.dataset_re10k import DatasetRE10k, DatasetRE10kCfg
from mvldm_tpu.data.loader import DataLoaderCfg, DataLoaderStageCfg, DataModule, collate
from mvldm_tpu.data.shims import center_crop, rescale_and_crop
from mvldm_tpu.data.view_samplers import (
    StepTracker,
    ViewSamplerBounded,
    ViewSamplerBoundedCfg,
    ViewSamplerEvaluation,
    ViewSamplerEvaluationCfg,
    get_view_sampler,
)
from synthetic_data import write_synthetic_dataset


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("re10k")
    return write_synthetic_dataset(root, frames_per_scene=30)


def bounded_cfg(**kw):
    defaults = dict(
        num_context_views=2,
        num_target_views=3,
        min_distance_between_context_views=5,
        max_distance_between_context_views=15,
    )
    defaults.update(kw)
    return ViewSamplerBoundedCfg(**defaults)


class TestViewSamplerBounded:
    def test_train_gap_bounds(self):
        sampler = ViewSamplerBounded(
            bounded_cfg(), "train", False, False, None,
            rng=np.random.default_rng(0),
        )
        for _ in range(50):
            [idx] = sampler.sample("s", 30)
            gap = int(idx.context[1] - idx.context[0])
            assert 5 <= gap <= 15
            assert idx.target.shape == (3,)
            assert len(set(idx.target.tolist())) == 3  # without replacement
            assert idx.target.min() >= 0 and idx.target.max() < 30

    def test_test_stage_full_gap_all_targets(self):
        sampler = ViewSamplerBounded(
            bounded_cfg(), "test", False, False, None,
            rng=np.random.default_rng(0),
        )
        [idx] = sampler.sample("s", 30)
        assert idx.context[0] == 0
        assert int(idx.context[1]) == 15
        np.testing.assert_array_equal(idx.target, np.arange(0, 16))

    def test_warmup_schedule(self):
        tracker = StepTracker(0)
        cfg = bounded_cfg(
            num_target_views=2,
            context_gap_warm_up_steps=100,
            initial_min_distance_between_context_views=1,
            initial_max_distance_between_context_views=2,
        )
        sampler = ViewSamplerBounded(
            cfg, "train", False, False, tracker, rng=np.random.default_rng(0)
        )
        gaps_early = [
            int(np.diff(sampler.sample("s", 30)[0].context)[0]) for _ in range(30)
        ]
        assert max(gaps_early) <= 2
        tracker.set_step(1000)
        gaps_late = [
            int(np.diff(sampler.sample("s", 30)[0].context)[0]) for _ in range(30)
        ]
        assert max(gaps_late) > 2

    def test_not_enough_frames_raises(self):
        cfg = bounded_cfg(
            min_distance_between_context_views=50,
            max_distance_between_context_views=50,
        )
        sampler = ViewSamplerBounded(cfg, "train", False, False, None)
        with pytest.raises(ValueError):
            sampler.sample("s", 30)


class TestViewSamplerEvaluation:
    def test_reads_index(self, tmp_path):
        index = {
            "sceneA": {"context": [0], "target": [1, 2, 3]},
            "sceneB": None,
        }
        path = tmp_path / "idx.json"
        path.write_text(json.dumps(index))
        sampler = ViewSamplerEvaluation(
            ViewSamplerEvaluationCfg(index_path=path), "test", False, False, None
        )
        assert sampler.total_samples == 1
        [idx] = sampler.sample("sceneA", 100)
        np.testing.assert_array_equal(idx.context, [0])
        np.testing.assert_array_equal(idx.target, [1, 2, 3])
        with pytest.raises(ValueError):
            sampler.sample("sceneB", 100)


class TestCropShim:
    def test_center_crop_intrinsics(self):
        images = np.zeros((2, 360, 640, 3), dtype=np.float32)
        intr = np.repeat(np.eye(3, dtype=np.float32)[None], 2, axis=0)
        intr[:, 0, 0] = 0.9
        intr[:, 1, 1] = 1.6
        cropped, new_intr = center_crop(images, intr, (360, 360))
        assert cropped.shape == (2, 360, 360, 3)
        np.testing.assert_allclose(new_intr[:, 0, 0], 0.9 * 640 / 360, rtol=1e-6)
        np.testing.assert_allclose(new_intr[:, 1, 1], 1.6, rtol=1e-6)

    def test_rescale_and_crop_to_256(self):
        rng = np.random.default_rng(0)
        images = rng.uniform(size=(1, 360, 640, 3)).astype(np.float32)
        intr = np.repeat(np.eye(3, dtype=np.float32)[None], 1, axis=0)
        out, new_intr = rescale_and_crop(images, intr, (256, 256))
        assert out.shape == (1, 256, 256, 3)
        # Scale factor 256/360; scaled w = 455 -> crop updates fx by 455/256.
        np.testing.assert_allclose(new_intr[0, 0, 0], 455 / 256, rtol=1e-6)


class TestDatasetRE10k:
    def test_iterates_examples(self, data_root):
        cfg = DatasetRE10kCfg(root=data_root)
        sampler = ViewSamplerBounded(
            bounded_cfg(), "train", False, False, None,
            rng=np.random.default_rng(0),
        )
        ds = DatasetRE10k(cfg, "train", sampler, rng=np.random.default_rng(0))
        examples = [next(iter(ds))]
        ex = examples[0]
        assert ex.context.image.shape == (2, 256, 256, 3)
        assert ex.target.image.shape == (3, 256, 256, 3)
        assert ex.context.extrinsics.shape == (2, 4, 4)
        # World rescaled so context baseline is 1.
        a, b = ex.context.extrinsics[:, :3, 3]
        np.testing.assert_allclose(np.linalg.norm(a - b), 1.0, rtol=1e-5)
        # near/far scaled by the same factor.
        assert ex.context.near[0] != 0.1

    def test_overfit_to_scene(self, data_root):
        cfg = DatasetRE10kCfg(
            root=data_root, overfit_to_scene=["scenetest0001"]
        )
        sampler = ViewSamplerBounded(
            bounded_cfg(), "test", True, False, None,
            rng=np.random.default_rng(0),
        )
        ds = DatasetRE10k(cfg, "test", sampler, rng=np.random.default_rng(0))
        ex = next(iter(ds))
        assert ex.scene == "scenetest0001"


class TestDataModule:
    def test_train_batches(self, data_root):
        dm = DataModule(
            DatasetRE10kCfg(root=data_root),
            bounded_cfg(),
            DataLoaderCfg(train=DataLoaderStageCfg(batch_size=2, seed=0)),
        )
        it = dm.train_dataloader()
        batch = next(iter(it))
        assert batch["context"]["image"].shape == (2, 2, 256, 256, 3)
        assert batch["target"]["image"].shape == (2, 3, 256, 256, 3)
        assert len(batch["scene"]) == 2

    def test_train_decode_pool_covers_all_scenes(self, data_root):
        """The num_workers decode thread pool yields well-formed batches
        drawing from every scene (independent per-worker streams, like the
        reference's 16 worker processes)."""
        dm = DataModule(
            DatasetRE10kCfg(root=data_root),
            bounded_cfg(),
            DataLoaderCfg(
                train=DataLoaderStageCfg(
                    batch_size=2, seed=0, num_workers=4
                )
            ),
        )
        it = dm.train_dataloader()
        scenes = set()
        for _ in range(8):
            batch = next(it)
            assert batch["context"]["image"].shape == (2, 2, 256, 256, 3)
            assert batch["target"]["image"].shape == (2, 3, 256, 256, 3)
            scenes.update(batch["scene"])
        assert len(scenes) == 2  # both synthetic scenes appear

    def test_decode_pool_is_seed_deterministic(self, data_root):
        """Seeded runs must reproduce batch-for-batch with num_workers > 1:
        workers decode ahead in parallel but the consumer merges them
        round-robin, so batch composition is a pure function of the seed,
        not of thread scheduling (the torch reference's seeded DataLoader
        is likewise order-deterministic across its worker processes)."""

        def take(n):
            dm = DataModule(
                DatasetRE10kCfg(root=data_root),
                bounded_cfg(),
                DataLoaderCfg(
                    train=DataLoaderStageCfg(
                        batch_size=2, seed=7, num_workers=4
                    )
                ),
            )
            it = dm.train_dataloader()
            batches = [next(it) for _ in range(n)]
            it.close()
            return batches

        for a, b in zip(take(6), take(6)):
            assert a["scene"] == b["scene"]
            np.testing.assert_array_equal(
                a["context"]["index"], b["context"]["index"]
            )
            np.testing.assert_array_equal(
                a["target"]["index"], b["target"]["index"]
            )
            np.testing.assert_array_equal(
                a["context"]["image"], b["context"]["image"]
            )

    def test_decode_pool_teardown_releases_workers(self, data_root):
        """Closing the iterator mid-stream must unblock and retire every
        worker thread even when the queue is full (each woken producer puts
        a sentinel, which can re-fill the queue past capacity — a single
        drain pass used to strand threads in put() forever)."""
        import threading
        import time

        before = threading.active_count()
        dm = DataModule(
            DatasetRE10kCfg(root=data_root),
            bounded_cfg(),
            DataLoaderCfg(
                train=DataLoaderStageCfg(batch_size=1, seed=0, num_workers=8)
            ),
        )
        it = dm.train_dataloader()
        next(it)  # pool is live; queue (maxsize 4) saturates behind us
        time.sleep(0.2)
        it.close()
        deadline = time.time() + 10.0
        while threading.active_count() > before and time.time() < deadline:
            time.sleep(0.05)
        assert threading.active_count() <= before, (
            f"{threading.active_count() - before} loader threads leaked"
        )


class TestDatasetDispatch:
    def test_config_driven_re10k_non_iter(self, data_root):
        """configs/dataset/re10k_non_iter.yaml routes DataModule to the
        map-style DatasetRE10kV2 (reference src/dataset/__init__.py:19)."""
        from mvldm_tpu.config import compose, load_typed_root_config
        from mvldm_tpu.data.dataset_re10kv2 import DatasetRE10kV2

        cfg_dict = compose(
            [
                "dataset=re10k_non_iter",
                "dataset/view_sampler=bounded",
                f"dataset.root={data_root}",
                "dataset.view_sampler.min_distance_between_context_views=5",
                "dataset.view_sampler.max_distance_between_context_views=15",
                "dataset.view_sampler.num_context_views=2",
                "dataset.view_sampler.num_target_views=3",
            ]
        )
        cfg = load_typed_root_config(cfg_dict)
        assert cfg.dataset.name == "re10k_non_iter"
        dm = DataModule(cfg.dataset, cfg.dataset.view_sampler, cfg.data_loader)
        ds = dm._dataset("test", 0)
        assert isinstance(ds, DatasetRE10kV2)
        batch = next(iter(dm.test_dataloader()))
        assert batch["context"]["image"].shape == (1, 2, 256, 256, 3)
