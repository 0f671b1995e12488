"""End-to-end conversion test for the reference Lightning checkpoint layout:
``denoiser.unet.*`` + ``denoiser.cross_attn_blocks_{encoder,mid,decoder}.*``
+ ``autoencoder.*`` -> {"unet", "vae"} flax trees matching module init."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np
import torch
from flax.traverse_util import flatten_dict

from mvldm_tpu.models.mv_attention import SpatialTransformer3DCfg
from mvldm_tpu.models.unet import MultiViewUNet, MultiViewUNetCfg, UNetBackboneCfg
from mvldm_tpu.models.vae import AutoencoderKL, AutoencoderKLCfg
from mvldm_tpu.utils.weight_convert import convert_mvldm_checkpoint

from test_weight_convert import synth_unet_sd

torch.manual_seed(0)


def synth_cross_view_sd(prefix: str, c: int) -> dict:
    sd = {}

    def add(name, *shape):
        sd[f"{prefix}.{name}"] = torch.randn(*shape) * 0.1

    add("norm.weight", c); add("norm.bias", c)
    add("proj_in.weight", c, c, 1, 1); add("proj_in.bias", c)
    tb = "transformer_blocks.0"
    for n in ("norm1", "norm2", "norm3"):
        add(f"{tb}.{n}.weight", c); add(f"{tb}.{n}.bias", c)
    for a in ("attn1", "attn2"):
        add(f"{tb}.{a}.to_q.weight", c, c)
        add(f"{tb}.{a}.to_k.weight", c, c)
        add(f"{tb}.{a}.to_v.weight", c, c)
        add(f"{tb}.{a}.to_out.0.weight", c, c)
        add(f"{tb}.{a}.to_out.0.bias", c)
    add(f"{tb}.ff.net.0.proj.weight", c * 8, c)
    add(f"{tb}.ff.net.0.proj.bias", c * 8)
    add(f"{tb}.ff.net.2.weight", c, c * 4); add(f"{tb}.ff.net.2.bias", c)
    add("proj_out.weight", c, c, 1, 1); add("proj_out.bias", c)
    return sd


def synth_vae_sd(ch=(8, 8, 16, 16), lpb=1) -> dict:
    sd = {}

    def add(name, *shape):
        sd[name] = torch.randn(*shape) * 0.1

    def add_resnet(p, cin, cout):
        add(f"{p}.norm1.weight", cin); add(f"{p}.norm1.bias", cin)
        add(f"{p}.conv1.weight", cout, cin, 3, 3); add(f"{p}.conv1.bias", cout)
        add(f"{p}.norm2.weight", cout); add(f"{p}.norm2.bias", cout)
        add(f"{p}.conv2.weight", cout, cout, 3, 3); add(f"{p}.conv2.bias", cout)
        if cin != cout:
            add(f"{p}.conv_shortcut.weight", cout, cin, 1, 1)
            add(f"{p}.conv_shortcut.bias", cout)

    def add_attn(p, c):
        add(f"{p}.group_norm.weight", c); add(f"{p}.group_norm.bias", c)
        for n in ("to_q", "to_k", "to_v"):
            add(f"{p}.{n}.weight", c, c); add(f"{p}.{n}.bias", c)
        add(f"{p}.to_out.0.weight", c, c); add(f"{p}.to_out.0.bias", c)

    add("encoder.conv_in.weight", ch[0], 3, 3, 3); add("encoder.conv_in.bias", ch[0])
    cin = ch[0]
    for i in range(4):
        for j in range(lpb):
            add_resnet(f"encoder.down_blocks.{i}.resnets.{j}",
                       cin if j == 0 else ch[i], ch[i])
        if i < 3:
            add(f"encoder.down_blocks.{i}.downsamplers.0.conv.weight",
                ch[i], ch[i], 3, 3)
            add(f"encoder.down_blocks.{i}.downsamplers.0.conv.bias", ch[i])
        cin = ch[i]
    add_resnet("encoder.mid_block.resnets.0", ch[-1], ch[-1])
    add_attn("encoder.mid_block.attentions.0", ch[-1])
    add_resnet("encoder.mid_block.resnets.1", ch[-1], ch[-1])
    add("encoder.conv_norm_out.weight", ch[-1]); add("encoder.conv_norm_out.bias", ch[-1])
    add("encoder.conv_out.weight", 8, ch[-1], 3, 3); add("encoder.conv_out.bias", 8)
    add("quant_conv.weight", 8, 8, 1, 1); add("quant_conv.bias", 8)
    add("post_quant_conv.weight", 4, 4, 1, 1); add("post_quant_conv.bias", 4)
    rev = list(reversed(ch))
    add("decoder.conv_in.weight", rev[0], 4, 3, 3); add("decoder.conv_in.bias", rev[0])
    add_resnet("decoder.mid_block.resnets.0", rev[0], rev[0])
    add_attn("decoder.mid_block.attentions.0", rev[0])
    add_resnet("decoder.mid_block.resnets.1", rev[0], rev[0])
    cin = rev[0]
    for i in range(4):
        for j in range(lpb + 1):
            add_resnet(f"decoder.up_blocks.{i}.resnets.{j}",
                       cin if j == 0 else rev[i], rev[i])
        if i < 3:
            add(f"decoder.up_blocks.{i}.upsamplers.0.conv.weight",
                rev[i], rev[i], 3, 3)
            add(f"decoder.up_blocks.{i}.upsamplers.0.conv.bias", rev[i])
        cin = rev[i]
    add("decoder.conv_norm_out.weight", rev[-1]); add("decoder.conv_norm_out.bias", rev[-1])
    add("decoder.conv_out.weight", 3, rev[-1], 3, 3); add("decoder.conv_out.bias", 3)
    return sd


class TestMvldmCheckpointConversion:
    @pytest.mark.slow
    def test_full_checkpoint_roundtrip(self):
        backbone = UNetBackboneCfg(
            down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
            up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
            block_out_channels=(32, 64),
            layers_per_block=1,
            cross_attention_dim=24,
            num_attention_heads=(4, 4),
            norm_num_groups=8,
        )
        cfg = MultiViewUNetCfg(
            autoencoder=backbone,
            multi_view_attention=SpatialTransformer3DCfg(num_heads=4),
        )

        # Build the Lightning-style state dict.
        state_dict = {}
        for k, v in synth_unet_sd(backbone, in_ch=11, out_ch=4).items():
            state_dict[f"denoiser.unet.{k}"] = v
        # Cross-view channels at injection points (out channels per stage).
        for i, c in enumerate((32, 64)):  # down stages
            state_dict.update(
                synth_cross_view_sd(f"denoiser.cross_attn_blocks_encoder.{i}", c)
            )
        state_dict.update(
            synth_cross_view_sd("denoiser.cross_attn_blocks_mid.0", 64)
        )
        for i, c in enumerate((64, 32)):  # up stages (reversed channels)
            state_dict.update(
                synth_cross_view_sd(f"denoiser.cross_attn_blocks_decoder.{i}", c)
            )
        state_dict.update(
            {f"autoencoder.{k}": v for k, v in synth_vae_sd().items()}
        )

        converted = convert_mvldm_checkpoint(
            state_dict,
            layers_per_block=1,
            down_block_types=backbone.down_block_types,
            up_block_types=backbone.up_block_types,
            vae_layers_per_block=1,
        )

        # UNet tree (incl. cross-view blocks) must match flax init exactly.
        model = MultiViewUNet(cfg, in_channels=11, out_channels=4)
        x = jnp.zeros((1, 2, 16, 16, 11))
        t = jnp.zeros((1, 2), jnp.int32)
        init_unet = model.init(jax.random.PRNGKey(0), x, t)["params"]
        got = {k: v.shape for k, v in flatten_dict(converted["unet"]).items()}
        want = {k: v.shape for k, v in flatten_dict(init_unet).items()}
        assert set(got) == set(want), (
            f"missing: {sorted(set(want) - set(got))[:6]}\n"
            f"extra: {sorted(set(got) - set(want))[:6]}"
        )
        for k in want:
            assert got[k] == want[k], (k, got[k], want[k])

        # VAE tree likewise.
        vae = AutoencoderKL(AutoencoderKLCfg(
            block_out_channels=(8, 8, 16, 16), layers_per_block=1,
            norm_num_groups=4,
        ))
        init_vae = vae.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), jax.random.PRNGKey(1)
        )["params"]
        got = {k: v.shape for k, v in flatten_dict(converted["vae"]).items()}
        want = {k: v.shape for k, v in flatten_dict(init_vae).items()}
        assert set(got) == set(want)

        # Converted UNet params must actually run.
        out = model.apply({"params": converted["unet"]}, x, t)
        assert out.shape == (1, 2, 16, 16, 4)
        assert bool(jnp.isfinite(out).all())
