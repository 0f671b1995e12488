import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mvldm_tpu.builder import build_engine, resolve_dtype
from mvldm_tpu.config import compose, load_typed_root_config
from mvldm_tpu.diffusion.engine import unet_in_channels
from mvldm_tpu.diffusion.schedulers import DDIMScheduler


class TestResolveDtype:
    def test_mapping(self):
        assert resolve_dtype(None) == jnp.float32
        assert resolve_dtype("bf16-mixed") == jnp.bfloat16
        # The reference's 16-mixed maps to bf16 on TPU.
        assert resolve_dtype("16-mixed") == jnp.bfloat16
        assert resolve_dtype("32-true") == jnp.float32


class TestBuildEngine:
    def test_baseline_engine(self):
        cfg = load_typed_root_config(
            compose(["+experiment=baseline", "dataset.root=/tmp/x"])
        )
        engine = build_engine(cfg)
        assert unet_in_channels(cfg.model) == 11  # 4 latent + 1 mask + 3+3 rays
        assert engine.unet.in_channels == 11
        assert engine.unet.out_channels == 4
        assert engine.unet.cfg.autoencoder.block_out_channels == (
            320, 640, 1280, 1280,
        )
        assert isinstance(engine.scheduler, DDIMScheduler)
        assert engine.scheduler.num_inference_steps == 70
        assert not engine.scheduler.clip_sample
        assert engine.dtype == jnp.bfloat16  # baseline precision 16-mixed->bf16
        assert engine.cfg.use_cfg and engine.cfg.cfg_scale == 3.0

    def test_group_override_syntax(self):
        """Hydra group-override CLI syntax replaces the whole group."""
        from mvldm_tpu.models.standard_transformer import CrossAttentionCfg

        cfg = load_typed_root_config(
            compose(
                [
                    "+experiment=baseline",
                    "model/denoiser/multi_view_attention=standard",
                    "model/scheduler=ddpm",
                ]
            )
        )
        assert isinstance(
            cfg.model.denoiser.multi_view_attention, CrossAttentionCfg
        )
        assert cfg.model.scheduler.name == "ddpm"
        # The group was replaced, not merged: no DDIM-only keys remain.
        assert "set_alpha_to_one" not in cfg.model.scheduler.kwargs

    @pytest.mark.slow
    def test_standard_attention_unet_forward(self):
        from mvldm_tpu.models.standard_transformer import CrossAttentionCfg
        from mvldm_tpu.models.unet import (
            MultiViewUNet,
            MultiViewUNetCfg,
            UNetBackboneCfg,
        )

        cfg = MultiViewUNetCfg(
            autoencoder=UNetBackboneCfg(
                down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
                up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
                block_out_channels=(32, 64),
                layers_per_block=1,
                cross_attention_dim=16,
                num_attention_heads=(2, 4),
                norm_num_groups=8,
            ),
            multi_view_attention=CrossAttentionCfg(num_heads=4),
        )
        model = MultiViewUNet(cfg, in_channels=11, out_channels=4)
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 3, 16, 16, 11))
        t = jnp.zeros((1, 3), dtype=jnp.int32)
        params = model.init(jax.random.PRNGKey(1), x, t)
        out = model.apply(params, x, t)
        assert out.shape == (1, 3, 16, 16, 4)
        assert bool(jnp.isfinite(out).all())
