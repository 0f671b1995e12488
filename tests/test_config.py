from pathlib import Path

import pytest

from mvldm_tpu.config import (
    RootCfg,
    compose,
    from_dict,
    load_typed_root_config,
)
from mvldm_tpu.data.view_samplers import (
    ViewSamplerBoundedCfg,
    ViewSamplerEvaluationCfg,
)


class TestCompose:
    def test_main_defaults(self):
        cfg = compose([])
        assert cfg["mode"] == "train"
        assert cfg["dataset"]["name"] == "re10k"
        assert cfg["dataset"]["view_sampler"]["name"] == "bounded"
        assert cfg["model"]["scheduler"]["name"] == "ddim"
        assert cfg["model"]["denoiser"]["name"] == "mv_unet"
        assert cfg["model"]["autoencoder"]["name"] == "kl"

    def test_experiment_baseline(self):
        cfg = compose(["+experiment=baseline"])
        vs = cfg["dataset"]["view_sampler"]
        assert vs["num_context_views"] == 2
        assert vs["num_target_views"] == 3
        assert vs["min_distance_between_context_views"] == 50
        assert vs["max_distance_between_context_views"] == 180
        assert cfg["model"]["scheduler"]["num_inference_steps"] == 70
        assert cfg["model"]["use_ray_encoding"] is False
        assert cfg["trainer"]["max_steps"] == 5_000_001
        assert cfg["optimizer"]["scheduler"]["kwargs"]["total_iters"] == 200

    def test_cli_overrides(self):
        cfg = compose(
            [
                "+experiment=baseline",
                "mode=test",
                "dataset.root=/tmp/data",
                "test.sampling_mode=anchored",
                "test.limit_frames=80",
                "model.scheduler.num_inference_steps=25",
                "dataset.overfit_to_scene=[abc123]",
            ]
        )
        assert cfg["mode"] == "test"
        assert cfg["dataset"]["root"] == "/tmp/data"
        assert cfg["test"]["sampling_mode"] == "anchored"
        assert cfg["test"]["limit_frames"] == 80
        assert cfg["model"]["scheduler"]["num_inference_steps"] == 25
        assert cfg["dataset"]["overfit_to_scene"] == ["abc123"]


class TestTypedConfig:
    def test_baseline_roundtrip(self):
        cfg = compose(["+experiment=baseline", "dataset.root=/tmp/x"])
        root = load_typed_root_config(cfg)
        assert isinstance(root, RootCfg)
        assert root.dataset.root == Path("/tmp/x")
        assert isinstance(root.dataset.view_sampler, ViewSamplerBoundedCfg)
        assert root.dataset.view_sampler.num_target_views == 3
        assert root.model.cfg_scale == 3.0
        assert root.model.use_cfg is True
        assert root.model.scheduler.num_inference_steps == 70
        assert root.model.scheduler.kwargs["prediction_type"] == "epsilon"
        assert root.model.denoiser.autoencoder.block_out_channels == (
            320, 640, 1280, 1280,
        )
        assert root.model.denoiser.multi_view_attention.num_heads == 8
        assert root.model.autoencoder.kwargs.latent_channels == 4
        assert root.optimizer.name == "AdamW"
        assert root.optimizer.lr == pytest.approx(2e-5)
        assert root.optimizer.scheduler.kwargs["start_factor"] == pytest.approx(5e-4)
        assert root.trainer.accumulate_grad_batches == 2
        assert root.trainer.gradient_clip_val == pytest.approx(0.1)

    def test_view_sampler_union_discrimination(self):
        cfg = compose(["+experiment=baseline"])
        cfg["dataset"]["view_sampler"] = {
            "name": "evaluation",
            "index_path": "assets/evaluation_index/re10k_video.json",
            "num_context_views": 2,
        }
        root = load_typed_root_config(cfg)
        assert isinstance(root.dataset.view_sampler, ViewSamplerEvaluationCfg)

    def test_unknown_key_fails_fast(self):
        cfg = compose(["+experiment=baseline"])
        cfg["trainer"]["definitely_a_typo"] = 1
        with pytest.raises(ValueError, match="definitely_a_typo"):
            load_typed_root_config(cfg)

    def test_tiny_experiment(self):
        cfg = compose(["+experiment=tiny"])
        root = load_typed_root_config(cfg)
        assert root.model.denoiser.autoencoder.block_out_channels == (32, 64)
        assert root.model.autoencoder.kwargs.norm_num_groups == 4
        assert root.data_loader.train.batch_size == 2

    def test_tpu_fast_layers_over_baseline(self):
        """The throughput preset changes execution knobs only — the
        optimization problem (lr/schedule/model) must stay baseline's."""
        cfg = compose(["+experiment=baseline", "+experiment=tpu_fast"])
        root = load_typed_root_config(cfg)
        assert root.trainer.remat is True
        assert root.optimizer.kwargs == {
            "mu_dtype": "bfloat16", "nu_dtype": "bfloat16",
        }
        assert root.optimizer.lr == pytest.approx(2e-5)
        assert root.optimizer.scheduler.kwargs["start_factor"] == (
            pytest.approx(5e-4)
        )
        assert root.model.scheduler.num_inference_steps == 70
