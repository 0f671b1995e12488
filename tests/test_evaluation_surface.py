"""The Hydra-style evaluation surface (reference
``config/evaluation/*.yaml`` + ``src/scripts/compute_metrics.py:34-38``):
``+evaluation=re10k_video`` composes a global-package group, the metric
computer runs against the test datamodule, and outputs land in the
configured JSON paths."""

import json
from pathlib import Path

import numpy as np
import pytest

from synthetic_data import write_synthetic_dataset


@pytest.fixture(scope="module")
def eval_setup(tmp_path_factory):
    """Synthetic dataset + evaluation index + a fake method render tree."""
    root = write_synthetic_dataset(
        tmp_path_factory.mktemp("re10k"), frames_per_scene=12
    )
    index = {
        "scenetest0000": {"context": [0], "target": [1, 2, 3]},
        "scenetest0001": {"context": [0], "target": [2, 4, 6]},
    }
    index_path = tmp_path_factory.mktemp("index") / "eval_index.json"
    index_path.write_text(json.dumps(index))
    return root, index_path, index


class TestEvaluationConfigSurface:
    def test_compose_evaluation_group(self):
        from mvldm_tpu.config import compose
        from mvldm_tpu.scripts.compute_metrics import load_compute_metrics_cfg

        cfg = load_compute_metrics_cfg(
            [
                "+evaluation=re10k_video",
                "dataset.root=/tmp/nonexistent",
                "evaluation.methods=[{name: ours, key: ours, path: out}]",
            ]
        )
        # The global-package file replaced the view-sampler group cleanly —
        # no bounded-sampler keys leaked into the evaluation sampler.
        assert cfg.dataset.view_sampler.name == "evaluation"
        assert cfg.dataset.view_sampler.index_path == Path(
            "assets/evaluation_index/re10k_video.json"
        )
        assert cfg.evaluation.methods[0].key == "ours"
        assert cfg.evaluation.highlighted[0].scene == "bf756257ffdd0017"
        assert str(cfg.output_metrics_path).endswith(
            "re10k_video/evaluation_metrics.json"
        )
        # Sibling protocols compose too.
        for name in ("re10k_video_100", "re10k_video_150", "re10k_video_all",
                     "re10k_video_anchor", "re10k_intra", "re10k_extra",
                     "re10k_video_training_evolution", "re10k_video_vldm",
                     "re10k_extra_mvc", "re10k_extra_mvssim"):
            d = compose([f"+evaluation={name}"], main_name="compute_metrics")
            assert d["dataset"]["view_sampler"]["name"] == "evaluation"

    def test_mvc_mvssim_protocols_parse_typed(self):
        """The MET3R MVC/MVSSIM stub protocols (reference
        evaluation_cfg.py:24-69, config/evaluation/re10k_extra_mv*.yaml)
        compose AND type-check into the stub dataclasses."""
        from mvldm_tpu.evaluation.metric_computer import MVCCfg, MVSSIMCfg
        from mvldm_tpu.scripts.compute_metrics import load_compute_metrics_cfg

        cfg = load_compute_metrics_cfg(
            ["+evaluation=re10k_extra_mvc", "dataset.root=/tmp/nonexistent"]
        )
        assert isinstance(cfg.evaluation.mvc_cfg, MVCCfg)
        assert cfg.evaluation.mvc_cfg.corres_weighting is True
        assert cfg.evaluation.mvc_cfg.reduction is None
        assert cfg.evaluation.types == "fixed"
        assert cfg.evaluation.img_size == 224

        cfg = load_compute_metrics_cfg(
            ["+evaluation=re10k_extra_mvssim", "dataset.root=/tmp/nonexistent"]
        )
        assert isinstance(cfg.evaluation.mvssim_cfg, MVSSIMCfg)
        assert cfg.evaluation.mvssim_cfg.compute_intrinsics is False
        assert cfg.evaluation.types == "pairwise"

    def test_compose_co3d_evaluation_groups(self):
        """All 9 CO3D protocols compose (the reference ships these yamls but
        not their dataset group — reconstructed here, see
        configs/dataset/co3d_hydrant.yaml)."""
        from mvldm_tpu.scripts.compute_metrics import load_compute_metrics_cfg

        cfg = load_compute_metrics_cfg(["+evaluation=co3d_hydrant_360"])
        assert cfg.dataset.view_sampler.name == "evaluation"
        assert cfg.dataset.cameras_are_circular
        assert cfg.dataset.view_sampler.index_path == Path(
            "assets/evaluation_index/co3d_hydrant_360.json"
        )
        assert cfg.evaluation.highlighted[0].scene == "304_31882_60482"

        from mvldm_tpu.config import compose

        for name in ("co3d_hydrant_360", "co3d_hydrant_360_features",
                     "co3d_hydrant_extra", "co3d_hydrant_extra_ablation",
                     "co3d_hydrant_intra", "co3d_teddybear_360",
                     "co3d_teddybear_360_features", "co3d_teddybear_extra",
                     "co3d_teddybear_intra"):
            d = compose([f"+evaluation={name}"], main_name="compute_metrics")
            assert d["dataset"]["view_sampler"]["name"] == "evaluation"
            assert "co3d" in d["dataset"]["root"]

    def test_generate_co3d_evaluation_index(self, eval_setup, tmp_path,
                                            capsys):
        """The CO3D generator CLI runs over a synthetic chunk tree (both
        intra and extra protocols) and writes a loadable index."""
        from mvldm_tpu.scripts import generate_co3d_evaluation_index

        root, _, _ = eval_setup
        out = tmp_path / "co3d_index"
        generate_co3d_evaluation_index.main(
            [
                "--dataset-root", str(root),
                "--output-path", str(out),
                "--min-distance", "2",
                "--max-distance", "5",
                "--num-targets", "2",
            ]
        )
        index = json.loads((out / "evaluation_index.json").read_text())
        assert index  # at least one scene produced entries
        for entries in index.values():
            for e in entries:
                assert len(e["context"]) == 2
                assert len(e["target"]) == 2
                # Indices are circular (CO3D orbits): context pairs and the
                # intra interval may wrap past frame 0, so assert validity,
                # not linear containment.
                assert all(0 <= t < 30 for t in e["target"])
                assert all(0 <= c < 30 for c in e["context"])

        out2 = tmp_path / "co3d_index_extra"
        generate_co3d_evaluation_index.main(
            [
                "--dataset-root", str(root),
                "--output-path", str(out2),
                "--extra",
                "--min-distance", "2",
                "--max-distance", "4",
                "--num-targets", "2",
            ]
        )
        index2 = json.loads((out2 / "evaluation_index.json").read_text())
        assert index2

    def test_shipped_video_index_matches_reference_protocol(self):
        path = Path("assets/evaluation_index/re10k_video.json")
        index = json.loads(path.read_text())
        assert len(index) == 1616  # SURVEY.md §2.1 / BASELINE.md
        entry = next(iter(index.values()))[0]
        assert entry["context"] == [0]

    def test_compute_metrics_end_to_end(self, eval_setup, tmp_path):
        """GT from the datamodule vs a render tree; running table + JSONs."""
        from mvldm_tpu.scripts import compute_metrics, generate_gt

        root, index_path, index = eval_setup

        # Build the method render tree from dumped GT (slightly noised so
        # metrics are finite and non-degenerate).
        gt_dir = tmp_path / "gt"
        generate_gt.main(
            [
                f"dataset.root={root}",
                f"output_dir={gt_dir}",
                "dataset/view_sampler=evaluation",
                f"dataset.view_sampler.index_path={index_path}",
                "dataset.image_shape=[32,32]",
                "trainer.limit_test_batches=2",
            ]
        )
        method_dir = tmp_path / "renders"
        rng = np.random.default_rng(0)
        n_pngs = 0
        for scene_dir in gt_dir.iterdir():
            from mvldm_tpu.utils.image_io import load_image, save_image

            for png in scene_dir.glob("*.png"):
                img = load_image(png)
                noisy = np.clip(
                    img + 0.05 * rng.normal(size=img.shape), 0, 1
                ).astype(np.float32)
                save_image(
                    noisy, method_dir / scene_dir.name / "color" / png.name
                )
                n_pngs += 1
        assert n_pngs == 6  # 2 scenes x 3 targets

        out_metrics = tmp_path / "metrics.json"
        out_scenes = tmp_path / "per_scene.json"
        compute_metrics.main(
            [
                "+evaluation=re10k_video",
                f"dataset.root={root}",
                f"dataset.view_sampler.index_path={index_path}",
                "dataset.image_shape=[32,32]",
                f"evaluation.methods=[{{name: ours, key: ours, path: {method_dir}}}]",
                f"output_metrics_path={out_metrics}",
                f"per_scene_metrics_path={out_scenes}",
                "limit_test_batches=2",
            ]
        )
        results = json.loads(out_metrics.read_text())
        assert results["ours"]["num_scenes"] == 2
        assert 10 < results["ours"]["psnr"] < 40
        assert 0 < results["ours"]["ssim"] <= 1
        per_scene = json.loads(out_scenes.read_text())
        assert set(per_scene["psnr"]) == {"scenetest0000", "scenetest0001"}
        assert "ours" in per_scene["psnr"]["scenetest0000"]

    @pytest.mark.goldens
    def test_full_metric_set_with_fixture_weights(self, eval_setup, tmp_path):
        """With converted (fixture) VGG+DISTS weights, the Hydra surface
        produces psnr/ssim/lpips/dists AND the per-scene VGG-FID — the
        complete reference metric set, no silent skips."""
        from test_metrics import make_fake_vgg_npz

        from mvldm_tpu.scripts import compute_metrics, generate_gt
        from mvldm_tpu.utils.image_io import load_image, save_image

        root, index_path, _ = eval_setup
        weights = make_fake_vgg_npz(tmp_path / "vgg.npz")

        gt_dir = tmp_path / "gt"
        generate_gt.main(
            [
                f"dataset.root={root}",
                f"output_dir={gt_dir}",
                "dataset/view_sampler=evaluation",
                f"dataset.view_sampler.index_path={index_path}",
                "dataset.image_shape=[64,64]",
                "trainer.limit_test_batches=1",
            ]
        )
        method_dir = tmp_path / "renders"
        rng = np.random.default_rng(0)
        for scene_dir in gt_dir.iterdir():
            for png in scene_dir.glob("*.png"):
                img = load_image(png)
                noisy = np.clip(
                    img + 0.05 * rng.normal(size=img.shape), 0, 1
                ).astype(np.float32)
                save_image(
                    noisy, method_dir / scene_dir.name / "color" / png.name
                )

        out_metrics = tmp_path / "metrics.json"
        compute_metrics.main(
            [
                "+evaluation=re10k_video",
                f"dataset.root={root}",
                f"dataset.view_sampler.index_path={index_path}",
                "dataset.image_shape=[64,64]",
                f"evaluation.methods=[{{name: ours, key: ours, path: {method_dir}}}]",
                f"output_metrics_path={out_metrics}",
                f"per_scene_metrics_path={tmp_path / 'scenes.json'}",
                f"lpips_weights={weights}",
                "limit_test_batches=1",
            ]
        )
        results = json.loads(out_metrics.read_text())["ours"]
        assert {"psnr", "ssim", "lpips", "dists", "fid_vgg"} <= set(results)
        assert results["num_scenes"] == 1
        assert results["lpips"] > 0 and 0 <= results["dists"] <= 1
        assert np.isfinite(results["fid_vgg"])

    def test_missing_renders_are_skipped_loudly(self, eval_setup, tmp_path, capsys):
        from mvldm_tpu.scripts import compute_metrics

        root, index_path, _ = eval_setup
        out_metrics = tmp_path / "metrics.json"
        compute_metrics.main(
            [
                "+evaluation=re10k_video",
                f"dataset.root={root}",
                f"dataset.view_sampler.index_path={index_path}",
                "dataset.image_shape=[32,32]",
                "evaluation.methods=[{name: ours, key: ours, path: /nonexistent}]",
                f"output_metrics_path={out_metrics}",
                f"per_scene_metrics_path={tmp_path / 'scenes.json'}",
                "limit_test_batches=2",
            ]
        )
        results = json.loads(out_metrics.read_text())
        assert results["ours"]["num_scenes"] == 0
        assert "Skipping" in capsys.readouterr().out

    def test_empty_methods_fails_fast(self):
        from mvldm_tpu.scripts import compute_metrics

        with pytest.raises(SystemExit, match="methods is empty"):
            compute_metrics.main(["+evaluation=re10k_video"])
