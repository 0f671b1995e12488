"""Conversion parity tests: torch functional forwards (ground truth for the
diffusers layer semantics the reference relies on) vs Flax modules running
converted weights."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from flax.traverse_util import flatten_dict

from mvldm_tpu.models.layers import ResnetBlock, Transformer2D
from mvldm_tpu.models.mv_attention import SpatialTransformer3D, SpatialTransformer3DCfg
from mvldm_tpu.models.unet import MultiViewUNet, MultiViewUNetCfg, UNetBackboneCfg
from mvldm_tpu.models.vae import AutoencoderKL, AutoencoderKLCfg
from mvldm_tpu.utils.weight_convert import (
    convert_unet_state_dict,
    convert_vae_state_dict,
    _convert_resnet,
    _convert_transformer2d,
    _convert_spatial_transformer3d,
)

torch.manual_seed(0)


def t2j_nchw(x: torch.Tensor) -> jnp.ndarray:
    return jnp.asarray(x.numpy().transpose(0, 2, 3, 1))


def j2t_nhwc(x) -> torch.Tensor:
    return torch.from_numpy(np.asarray(x).transpose(0, 3, 1, 2))


def rand_sd(shapes: dict) -> dict:
    return {k: torch.randn(*v) * 0.2 for k, v in shapes.items()}


def torch_attention(x, ctx, sd, prefix, heads):
    q = F.linear(x, sd[f"{prefix}.to_q.weight"])
    k = F.linear(ctx, sd[f"{prefix}.to_k.weight"])
    v = F.linear(ctx, sd[f"{prefix}.to_v.weight"])
    b, lq, inner = q.shape
    d = inner // heads
    q = q.reshape(b, lq, heads, d).permute(0, 2, 1, 3)
    k = k.reshape(b, -1, heads, d).permute(0, 2, 1, 3)
    v = v.reshape(b, -1, heads, d).permute(0, 2, 1, 3)
    out = F.scaled_dot_product_attention(q, k, v)
    out = out.permute(0, 2, 1, 3).reshape(b, lq, inner)
    return F.linear(out, sd[f"{prefix}.to_out.0.weight"], sd[f"{prefix}.to_out.0.bias"])


def torch_transformer_block(x, ctx, sd, prefix, heads):
    h = F.layer_norm(x, (x.shape[-1],), sd[f"{prefix}.norm1.weight"], sd[f"{prefix}.norm1.bias"])
    x = x + torch_attention(h, h, sd, f"{prefix}.attn1", heads)
    h = F.layer_norm(x, (x.shape[-1],), sd[f"{prefix}.norm2.weight"], sd[f"{prefix}.norm2.bias"])
    x = x + torch_attention(h, ctx, sd, f"{prefix}.attn2", heads)
    h = F.layer_norm(x, (x.shape[-1],), sd[f"{prefix}.norm3.weight"], sd[f"{prefix}.norm3.bias"])
    ff = F.linear(h, sd[f"{prefix}.ff.net.0.proj.weight"], sd[f"{prefix}.ff.net.0.proj.bias"])
    a, gate = ff.chunk(2, dim=-1)
    ff = a * F.gelu(gate)
    x = x + F.linear(ff, sd[f"{prefix}.ff.net.2.weight"], sd[f"{prefix}.ff.net.2.bias"])
    return x


class TestResnetParity:
    def test_resnet_block(self):
        cin, cout, groups = 16, 32, 8
        sd = rand_sd({
            "r.norm1.weight": (cin,), "r.norm1.bias": (cin,),
            "r.conv1.weight": (cout, cin, 3, 3), "r.conv1.bias": (cout,),
            "r.time_emb_proj.weight": (cout, 64), "r.time_emb_proj.bias": (cout,),
            "r.norm2.weight": (cout,), "r.norm2.bias": (cout,),
            "r.conv2.weight": (cout, cout, 3, 3), "r.conv2.bias": (cout,),
            "r.conv_shortcut.weight": (cout, cin, 1, 1), "r.conv_shortcut.bias": (cout,),
        })
        x = torch.randn(2, cin, 8, 8)
        temb = torch.randn(2, 64)

        h = F.group_norm(x, groups, sd["r.norm1.weight"], sd["r.norm1.bias"], eps=1e-5)
        h = F.silu(h)
        h = F.conv2d(h, sd["r.conv1.weight"], sd["r.conv1.bias"], padding=1)
        t = F.linear(F.silu(temb), sd["r.time_emb_proj.weight"], sd["r.time_emb_proj.bias"])
        h = h + t[:, :, None, None]
        h = F.group_norm(h, groups, sd["r.norm2.weight"], sd["r.norm2.bias"], eps=1e-5)
        h = F.silu(h)
        h = F.conv2d(h, sd["r.conv2.weight"], sd["r.conv2.bias"], padding=1)
        res = F.conv2d(x, sd["r.conv_shortcut.weight"], sd["r.conv_shortcut.bias"])
        expected = (res + h).numpy()

        params = {}
        _convert_resnet(sd, "r", "m", params)
        block = ResnetBlock(cout, groups=groups, eps=1e-5)
        out = block.apply({"params": params["m"]}, t2j_nchw(x), jnp.asarray(temb.numpy()))
        np.testing.assert_allclose(
            np.asarray(out).transpose(0, 3, 1, 2), expected, atol=1e-4
        )


class TestTransformer2DParity:
    def test_transformer2d(self):
        c, heads, ctx_dim, groups = 32, 4, 24, 8
        inner = c
        sd = rand_sd({
            "t.norm.weight": (c,), "t.norm.bias": (c,),
            "t.proj_in.weight": (inner, c), "t.proj_in.bias": (inner,),
            "t.transformer_blocks.0.norm1.weight": (inner,),
            "t.transformer_blocks.0.norm1.bias": (inner,),
            "t.transformer_blocks.0.attn1.to_q.weight": (inner, inner),
            "t.transformer_blocks.0.attn1.to_k.weight": (inner, inner),
            "t.transformer_blocks.0.attn1.to_v.weight": (inner, inner),
            "t.transformer_blocks.0.attn1.to_out.0.weight": (inner, inner),
            "t.transformer_blocks.0.attn1.to_out.0.bias": (inner,),
            "t.transformer_blocks.0.norm2.weight": (inner,),
            "t.transformer_blocks.0.norm2.bias": (inner,),
            "t.transformer_blocks.0.attn2.to_q.weight": (inner, inner),
            "t.transformer_blocks.0.attn2.to_k.weight": (inner, ctx_dim),
            "t.transformer_blocks.0.attn2.to_v.weight": (inner, ctx_dim),
            "t.transformer_blocks.0.attn2.to_out.0.weight": (inner, inner),
            "t.transformer_blocks.0.attn2.to_out.0.bias": (inner,),
            "t.transformer_blocks.0.norm3.weight": (inner,),
            "t.transformer_blocks.0.norm3.bias": (inner,),
            "t.transformer_blocks.0.ff.net.0.proj.weight": (inner * 8, inner),
            "t.transformer_blocks.0.ff.net.0.proj.bias": (inner * 8,),
            "t.transformer_blocks.0.ff.net.2.weight": (inner, inner * 4),
            "t.transformer_blocks.0.ff.net.2.bias": (inner,),
            "t.proj_out.weight": (c, inner), "t.proj_out.bias": (c,),
        })
        x = torch.randn(2, c, 8, 8)
        ctx = torch.randn(2, 1, ctx_dim)

        h = F.group_norm(x, groups, sd["t.norm.weight"], sd["t.norm.bias"], eps=1e-6)
        b, _, hh, ww = x.shape
        h = h.permute(0, 2, 3, 1).reshape(b, hh * ww, c)
        h = F.linear(h, sd["t.proj_in.weight"], sd["t.proj_in.bias"])
        h = torch_transformer_block(h, ctx, sd, "t.transformer_blocks.0", heads)
        h = F.linear(h, sd["t.proj_out.weight"], sd["t.proj_out.bias"])
        expected = (h.reshape(b, hh, ww, c).permute(0, 3, 1, 2) + x).numpy()

        params = {}
        _convert_transformer2d(sd, "t", "m", params)
        block = Transformer2D(heads, c // heads, ctx_dim, groups=groups)
        out = block.apply(
            {"params": params["m"]}, t2j_nchw(x), jnp.asarray(ctx.numpy())
        )
        np.testing.assert_allclose(
            np.asarray(out).transpose(0, 3, 1, 2), expected, atol=1e-4
        )


class TestSpatialTransformer3DParity:
    def test_cross_view_block(self):
        """Torch functional forward of the reference SpatialTransformer3D
        (joint attn over views, per-frame attn, GEGLU FF, conv projections)."""
        c, heads, groups, v = 32, 4, 8, 3
        sd = rand_sd({
            "s.norm.weight": (c,), "s.norm.bias": (c,),
            "s.proj_in.weight": (c, c, 1, 1), "s.proj_in.bias": (c,),
            "s.transformer_blocks.0.norm1.weight": (c,),
            "s.transformer_blocks.0.norm1.bias": (c,),
            "s.transformer_blocks.0.attn1.to_q.weight": (c, c),
            "s.transformer_blocks.0.attn1.to_k.weight": (c, c),
            "s.transformer_blocks.0.attn1.to_v.weight": (c, c),
            "s.transformer_blocks.0.attn1.to_out.0.weight": (c, c),
            "s.transformer_blocks.0.attn1.to_out.0.bias": (c,),
            "s.transformer_blocks.0.norm2.weight": (c,),
            "s.transformer_blocks.0.norm2.bias": (c,),
            "s.transformer_blocks.0.attn2.to_q.weight": (c, c),
            "s.transformer_blocks.0.attn2.to_k.weight": (c, c),
            "s.transformer_blocks.0.attn2.to_v.weight": (c, c),
            "s.transformer_blocks.0.attn2.to_out.0.weight": (c, c),
            "s.transformer_blocks.0.attn2.to_out.0.bias": (c,),
            "s.transformer_blocks.0.norm3.weight": (c,),
            "s.transformer_blocks.0.norm3.bias": (c,),
            "s.transformer_blocks.0.ff.net.0.proj.weight": (c * 8, c),
            "s.transformer_blocks.0.ff.net.0.proj.bias": (c * 8,),
            "s.transformer_blocks.0.ff.net.2.weight": (c, c * 4),
            "s.transformer_blocks.0.ff.net.2.bias": (c,),
            "s.proj_out.weight": (c, c, 1, 1), "s.proj_out.bias": (c,),
        })
        x = torch.randn(1 * v, c, 8, 8)  # (b*v, c, h, w)

        h = F.group_norm(x, groups, sd["s.norm.weight"], sd["s.norm.bias"], eps=1e-6)
        h = F.conv2d(h, sd["s.proj_in.weight"], sd["s.proj_in.bias"])
        bv, _, hh, ww = x.shape
        h = h.permute(0, 2, 3, 1).reshape(bv, hh * ww, c)
        # BasicTransformerBlock3D: attn1 joint over views.
        l = hh * ww
        joint = h.reshape(1, v * l, c)
        n = F.layer_norm(joint, (c,), sd["s.transformer_blocks.0.norm1.weight"],
                         sd["s.transformer_blocks.0.norm1.bias"])
        joint = joint + torch_attention(n, n, sd, "s.transformer_blocks.0.attn1", heads)
        h = joint.reshape(bv, l, c)
        n = F.layer_norm(h, (c,), sd["s.transformer_blocks.0.norm2.weight"],
                         sd["s.transformer_blocks.0.norm2.bias"])
        h = h + torch_attention(n, n, sd, "s.transformer_blocks.0.attn2", heads)
        n = F.layer_norm(h, (c,), sd["s.transformer_blocks.0.norm3.weight"],
                         sd["s.transformer_blocks.0.norm3.bias"])
        ff = F.linear(n, sd["s.transformer_blocks.0.ff.net.0.proj.weight"],
                      sd["s.transformer_blocks.0.ff.net.0.proj.bias"])
        a, gate = ff.chunk(2, dim=-1)
        h = h + F.linear(a * F.gelu(gate), sd["s.transformer_blocks.0.ff.net.2.weight"],
                         sd["s.transformer_blocks.0.ff.net.2.bias"])
        h = h.reshape(bv, hh, ww, c).permute(0, 3, 1, 2)
        h = F.conv2d(h, sd["s.proj_out.weight"], sd["s.proj_out.bias"])
        expected = (h + x).numpy()

        params = {}
        _convert_spatial_transformer3d(sd, "s", "m", params)
        cfg = SpatialTransformer3DCfg(num_heads=heads)
        block = SpatialTransformer3D(cfg, groups=groups)
        x_j = t2j_nchw(x).reshape(1, v, 8, 8, c)
        out = block.apply({"params": params["m"]}, x_j)
        out = np.asarray(out).reshape(v, 8, 8, c).transpose(0, 3, 1, 2)
        np.testing.assert_allclose(out, expected, atol=1e-4)


def synth_unet_sd(backbone: UNetBackboneCfg, in_ch: int, out_ch: int) -> dict:
    """Build a random torch state dict with diffusers names for the topology."""
    ch = backbone.block_out_channels
    lpb = backbone.layers_per_block
    temb_dim = ch[0] * 4
    ctx = backbone.cross_attention_dim
    sd = {}

    def add(name, *shape):
        sd[name] = torch.randn(*shape) * 0.1

    def add_resnet(p, cin, cout, temb=True):
        add(f"{p}.norm1.weight", cin); add(f"{p}.norm1.bias", cin)
        add(f"{p}.conv1.weight", cout, cin, 3, 3); add(f"{p}.conv1.bias", cout)
        if temb:
            add(f"{p}.time_emb_proj.weight", cout, temb_dim)
            add(f"{p}.time_emb_proj.bias", cout)
        add(f"{p}.norm2.weight", cout); add(f"{p}.norm2.bias", cout)
        add(f"{p}.conv2.weight", cout, cout, 3, 3); add(f"{p}.conv2.bias", cout)
        if cin != cout:
            add(f"{p}.conv_shortcut.weight", cout, cin, 1, 1)
            add(f"{p}.conv_shortcut.bias", cout)

    def add_attn_block(p, c):
        add(f"{p}.norm.weight", c); add(f"{p}.norm.bias", c)
        add(f"{p}.proj_in.weight", c, c); add(f"{p}.proj_in.bias", c)
        add(f"{p}.proj_out.weight", c, c); add(f"{p}.proj_out.bias", c)
        tb = f"{p}.transformer_blocks.0"
        for n in ("norm1", "norm2", "norm3"):
            add(f"{tb}.{n}.weight", c); add(f"{tb}.{n}.bias", c)
        for a, kdim in (("attn1", c), ("attn2", ctx)):
            add(f"{tb}.{a}.to_q.weight", c, c)
            add(f"{tb}.{a}.to_k.weight", c, kdim)
            add(f"{tb}.{a}.to_v.weight", c, kdim)
            add(f"{tb}.{a}.to_out.0.weight", c, c)
            add(f"{tb}.{a}.to_out.0.bias", c)
        add(f"{tb}.ff.net.0.proj.weight", c * 8, c)
        add(f"{tb}.ff.net.0.proj.bias", c * 8)
        add(f"{tb}.ff.net.2.weight", c, c * 4); add(f"{tb}.ff.net.2.bias", c)

    add("time_embedding.linear_1.weight", temb_dim, ch[0])
    add("time_embedding.linear_1.bias", temb_dim)
    add("time_embedding.linear_2.weight", temb_dim, temb_dim)
    add("time_embedding.linear_2.bias", temb_dim)
    add("conv_in.weight", ch[0], in_ch, 3, 3); add("conv_in.bias", ch[0])

    # Down blocks.
    cin = ch[0]
    for i, btype in enumerate(backbone.down_block_types):
        cout = ch[i]
        for j in range(lpb):
            add_resnet(f"down_blocks.{i}.resnets.{j}", cin if j == 0 else cout, cout)
            if btype == "CrossAttnDownBlock2D":
                add_attn_block(f"down_blocks.{i}.attentions.{j}", cout)
        if i < len(backbone.down_block_types) - 1:
            add(f"down_blocks.{i}.downsamplers.0.conv.weight", cout, cout, 3, 3)
            add(f"down_blocks.{i}.downsamplers.0.conv.bias", cout)
        cin = cout

    add_resnet("mid_block.resnets.0", ch[-1], ch[-1])
    add_attn_block("mid_block.attentions.0", ch[-1])
    add_resnet("mid_block.resnets.1", ch[-1], ch[-1])

    # Up blocks: skip channels mirror the down pass.
    rev = list(reversed(ch))
    # Channel bookkeeping for skip concat: simplest is to track the down-pass
    # skip channel list the same way the model does.
    skip_ch = [ch[0]]
    c = ch[0]
    for i in range(len(backbone.down_block_types)):
        for j in range(lpb):
            skip_ch.append(ch[i])
        if i < len(backbone.down_block_types) - 1:
            skip_ch.append(ch[i])
    hidden = ch[-1]
    for i, btype in enumerate(backbone.up_block_types):
        cout = rev[i]
        for j in range(lpb + 1):
            skip = skip_ch.pop()
            add_resnet(f"up_blocks.{i}.resnets.{j}", hidden + skip, cout)
            hidden = cout
        if i < len(backbone.up_block_types) - 1:
            add(f"up_blocks.{i}.upsamplers.0.conv.weight", cout, cout, 3, 3)
            add(f"up_blocks.{i}.upsamplers.0.conv.bias", cout)

    add("conv_norm_out.weight", ch[0]); add("conv_norm_out.bias", ch[0])
    add("conv_out.weight", out_ch, ch[0], 3, 3); add("conv_out.bias", out_ch)
    return sd


class TestStructureRoundtrip:
    @pytest.mark.slow
    def test_unet_structure_matches_flax_init(self):
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
        model = MultiViewUNet(cfg, in_channels=11, out_channels=4)
        x = jnp.zeros((1, 2, 16, 16, 11))
        t = jnp.zeros((1, 2), dtype=jnp.int32)
        init_params = model.init(jax.random.PRNGKey(0), x, t)["params"]

        sd = synth_unet_sd(backbone, in_ch=11, out_ch=4)
        converted = convert_unet_state_dict(
            sd,
            down_block_types=backbone.down_block_types,
            up_block_types=backbone.up_block_types,
            layers_per_block=backbone.layers_per_block,
        )
        init_flat = flatten_dict(init_params)
        conv_flat = flatten_dict(converted)
        init_paths = {
            k: v.shape for k, v in init_flat.items() if "cross_view" not in k[0]
        }
        conv_paths = {k: v.shape for k, v in conv_flat.items()}
        assert set(conv_paths) == set(init_paths), (
            f"missing: {set(init_paths) - set(conv_paths)}\n"
            f"extra: {set(conv_paths) - set(init_paths)}"
        )
        for k in init_paths:
            assert conv_paths[k] == init_paths[k], (k, conv_paths[k], init_paths[k])

        # Converted params must actually run.
        full = dict(init_params)
        for k, v in converted.items():
            full[k] = v
        out = model.apply({"params": full}, x, t)
        assert out.shape == (1, 2, 16, 16, 4)

    def test_vae_structure_matches_flax_init(self):
        cfg = AutoencoderKLCfg(
            block_out_channels=(16, 32, 32, 32),
            layers_per_block=1,
            norm_num_groups=8,
        )
        vae = AutoencoderKL(cfg)
        x = jnp.zeros((1, 64, 64, 3))
        init_params = vae.init(jax.random.PRNGKey(0), x, jax.random.PRNGKey(1))[
            "params"
        ]

        sd = {}

        def add(name, *shape):
            sd[name] = torch.randn(*shape) * 0.1

        ch = cfg.block_out_channels
        lpb = cfg.layers_per_block

        def add_resnet(p, cin, cout):
            add(f"{p}.norm1.weight", cin); add(f"{p}.norm1.bias", cin)
            add(f"{p}.conv1.weight", cout, cin, 3, 3); add(f"{p}.conv1.bias", cout)
            add(f"{p}.norm2.weight", cout); add(f"{p}.norm2.bias", cout)
            add(f"{p}.conv2.weight", cout, cout, 3, 3); add(f"{p}.conv2.bias", cout)
            if cin != cout:
                add(f"{p}.conv_shortcut.weight", cout, cin, 1, 1)
                add(f"{p}.conv_shortcut.bias", cout)

        def add_vae_attn(p, c):
            add(f"{p}.group_norm.weight", c); add(f"{p}.group_norm.bias", c)
            for n in ("to_q", "to_k", "to_v"):
                add(f"{p}.{n}.weight", c, c); add(f"{p}.{n}.bias", c)
            add(f"{p}.to_out.0.weight", c, c); add(f"{p}.to_out.0.bias", c)

        add("encoder.conv_in.weight", ch[0], 3, 3, 3)
        add("encoder.conv_in.bias", ch[0])
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
        add_vae_attn("encoder.mid_block.attentions.0", ch[-1])
        add_resnet("encoder.mid_block.resnets.1", ch[-1], ch[-1])
        add("encoder.conv_norm_out.weight", ch[-1])
        add("encoder.conv_norm_out.bias", ch[-1])
        add("encoder.conv_out.weight", 8, ch[-1], 3, 3)
        add("encoder.conv_out.bias", 8)
        add("quant_conv.weight", 8, 8, 1, 1); add("quant_conv.bias", 8)
        add("post_quant_conv.weight", 4, 4, 1, 1); add("post_quant_conv.bias", 4)

        rev = list(reversed(ch))
        add("decoder.conv_in.weight", rev[0], 4, 3, 3)
        add("decoder.conv_in.bias", rev[0])
        add_resnet("decoder.mid_block.resnets.0", rev[0], rev[0])
        add_vae_attn("decoder.mid_block.attentions.0", rev[0])
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
        add("decoder.conv_norm_out.weight", rev[-1])
        add("decoder.conv_norm_out.bias", rev[-1])
        add("decoder.conv_out.weight", 3, rev[-1], 3, 3)
        add("decoder.conv_out.bias", 3)

        converted = convert_vae_state_dict(sd, layers_per_block=lpb)
        init_paths = {k: v.shape for k, v in flatten_dict(init_params).items()}
        conv_paths = {k: v.shape for k, v in flatten_dict(converted).items()}
        assert set(conv_paths) == set(init_paths), (
            f"missing: {set(init_paths) - set(conv_paths)}\n"
            f"extra: {set(conv_paths) - set(init_paths)}"
        )
        for k in init_paths:
            assert conv_paths[k] == init_paths[k], (k, conv_paths[k], init_paths[k])
