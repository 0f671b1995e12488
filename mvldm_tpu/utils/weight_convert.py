"""Torch-checkpoint -> Flax parameter conversion.

Converts diffusers-format state dicts (the SD2.1 UNet/VAE the reference loads
at ``mvunet.py:66`` / ``autoencoder/__init__.py:43``) and the reference's
Lightning checkpoint (``asimbluemoon/mvldm-1.0``, keys prefixed ``denoiser.``
/ ``autoencoder.`` / ``denoiser.cross_attn_blocks_{encoder,mid,decoder}.``)
into this package's NHWC Flax parameter trees.

Conventions:
* Conv weights: torch OIHW -> flax HWIO (transpose (2, 3, 1, 0)).
* Linear weights: torch (out, in) -> flax (in, out) kernels.
* Norm weight/bias -> scale/bias.

The converters are driven by explicit name maps so a missing/extra key is a
loud error, not silent drift.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np


def _conv(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def _linear(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(w.T)


def _assign(tree: Dict[str, Any], path: str, value: np.ndarray) -> None:
    parts = path.split("/")
    node = tree
    for p in parts[:-1]:
        node = node.setdefault(p, {})
    node[parts[-1]] = value


def _np(x) -> np.ndarray:
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x, dtype=np.float32)


def _convert_norm(sd, tprefix: str, fprefix: str, out: Dict[str, Any],
                  wrapped: bool = True) -> None:
    """GroupNorm/LayerNorm. ``wrapped=True`` targets this package's GroupNorm
    wrapper module (inner module auto-named GroupNorm_0)."""
    inner = f"{fprefix}/GroupNorm_0" if wrapped else fprefix
    _assign(out, f"{inner}/scale", _np(sd[f"{tprefix}.weight"]))
    _assign(out, f"{inner}/bias", _np(sd[f"{tprefix}.bias"]))


def _convert_conv(sd, tprefix: str, fprefix: str, out: Dict[str, Any]) -> None:
    _assign(out, f"{fprefix}/kernel", _conv(_np(sd[f"{tprefix}.weight"])))
    if f"{tprefix}.bias" in sd:
        _assign(out, f"{fprefix}/bias", _np(sd[f"{tprefix}.bias"]))


def _convert_linear(sd, tprefix: str, fprefix: str, out: Dict[str, Any],
                    bias: bool = True) -> None:
    _assign(out, f"{fprefix}/kernel", _linear(_np(sd[f"{tprefix}.weight"])))
    if bias and f"{tprefix}.bias" in sd:
        _assign(out, f"{fprefix}/bias", _np(sd[f"{tprefix}.bias"]))


def _convert_resnet(sd, tprefix: str, fprefix: str, out: Dict[str, Any],
                    time_emb: bool = True) -> None:
    _convert_norm(sd, f"{tprefix}.norm1", f"{fprefix}/norm1", out)
    _convert_conv(sd, f"{tprefix}.conv1", f"{fprefix}/conv1", out)
    if time_emb and f"{tprefix}.time_emb_proj.weight" in sd:
        _convert_linear(sd, f"{tprefix}.time_emb_proj", f"{fprefix}/time_emb_proj", out)
    _convert_norm(sd, f"{tprefix}.norm2", f"{fprefix}/norm2", out)
    _convert_conv(sd, f"{tprefix}.conv2", f"{fprefix}/conv2", out)
    if f"{tprefix}.conv_shortcut.weight" in sd:
        _convert_conv(sd, f"{tprefix}.conv_shortcut", f"{fprefix}/conv_shortcut", out)


def _convert_cross_attention(sd, tprefix: str, fprefix: str,
                             out: Dict[str, Any]) -> None:
    """diffusers Attention (to_q/k/v no-bias, to_out.0 with bias)."""
    _convert_linear(sd, f"{tprefix}.to_q", f"{fprefix}/to_q", out)
    _convert_linear(sd, f"{tprefix}.to_k", f"{fprefix}/to_k", out)
    _convert_linear(sd, f"{tprefix}.to_v", f"{fprefix}/to_v", out)
    _convert_linear(sd, f"{tprefix}.to_out.0", f"{fprefix}/to_out", out)


def _convert_layernorm(sd, tprefix: str, fprefix: str, out: Dict[str, Any]) -> None:
    _assign(out, f"{fprefix}/scale", _np(sd[f"{tprefix}.weight"]))
    _assign(out, f"{fprefix}/bias", _np(sd[f"{tprefix}.bias"]))


def _convert_transformer_block(sd, tprefix: str, fprefix: str,
                               out: Dict[str, Any]) -> None:
    """BasicTransformerBlock (both the SD 2D one and the 3D cross-view one
    share torch names: attn1/attn2/ff/norm1-3)."""
    _convert_layernorm(sd, f"{tprefix}.norm1", f"{fprefix}/norm1", out)
    _convert_cross_attention(sd, f"{tprefix}.attn1", f"{fprefix}/attn1", out)
    _convert_layernorm(sd, f"{tprefix}.norm2", f"{fprefix}/norm2", out)
    _convert_cross_attention(sd, f"{tprefix}.attn2", f"{fprefix}/attn2", out)
    _convert_layernorm(sd, f"{tprefix}.norm3", f"{fprefix}/norm3", out)
    _convert_linear(sd, f"{tprefix}.ff.net.0.proj", f"{fprefix}/ff/net_0/proj", out)
    _convert_linear(sd, f"{tprefix}.ff.net.2", f"{fprefix}/ff/net_2", out)


def _convert_transformer2d(sd, tprefix: str, fprefix: str, out: Dict[str, Any],
                           depth: int = 1) -> None:
    """SD Transformer2DModel with linear projections (SD2.1)."""
    _convert_norm(sd, f"{tprefix}.norm", f"{fprefix}/norm", out)
    _convert_linear(sd, f"{tprefix}.proj_in", f"{fprefix}/proj_in", out)
    for d in range(depth):
        _convert_transformer_block(
            sd, f"{tprefix}.transformer_blocks.{d}", f"{fprefix}/blocks_{d}", out
        )
    _convert_linear(sd, f"{tprefix}.proj_out", f"{fprefix}/proj_out", out)


def _convert_spatial_transformer3d(sd, tprefix: str, fprefix: str,
                                   out: Dict[str, Any], depth: int = 1) -> None:
    """Reference SpatialTransformer3D (conv projections,
    mvdream/attention.py:371-439)."""
    _convert_norm(sd, f"{tprefix}.norm", f"{fprefix}/norm", out)
    _convert_conv(sd, f"{tprefix}.proj_in", f"{fprefix}/proj_in", out)
    for d in range(depth):
        _convert_transformer_block(
            sd, f"{tprefix}.transformer_blocks.{d}", f"{fprefix}/blocks_{d}", out
        )
    _convert_conv(sd, f"{tprefix}.proj_out", f"{fprefix}/proj_out", out)


def convert_unet_state_dict(
    sd: Mapping[str, Any],
    down_block_types=(
        "CrossAttnDownBlock2D",
        "CrossAttnDownBlock2D",
        "CrossAttnDownBlock2D",
        "DownBlock2D",
    ),
    up_block_types=(
        "UpBlock2D",
        "CrossAttnUpBlock2D",
        "CrossAttnUpBlock2D",
        "CrossAttnUpBlock2D",
    ),
    layers_per_block: int = 2,
    up_block_attention: bool = False,
) -> Dict[str, Any]:
    """diffusers UNet2DConditionModel state dict -> MultiViewUNet params.

    Up-block SD attentions are skipped by default to match the live model
    (see ``models/unet.py`` docstring); their torch weights are ignored.
    """
    out: Dict[str, Any] = {}
    _convert_linear(sd, "time_embedding.linear_1", "time_emb_1", out)
    _convert_linear(sd, "time_embedding.linear_2", "time_emb_2", out)
    _convert_conv(sd, "conv_in", "conv_in", out)

    for i, btype in enumerate(down_block_types):
        for j in range(layers_per_block):
            _convert_resnet(sd, f"down_blocks.{i}.resnets.{j}", f"down_{i}_res_{j}", out)
            if btype == "CrossAttnDownBlock2D":
                _convert_transformer2d(
                    sd, f"down_blocks.{i}.attentions.{j}", f"down_{i}_attn_{j}", out
                )
        if f"down_blocks.{i}.downsamplers.0.conv.weight" in sd:
            _convert_conv(
                sd, f"down_blocks.{i}.downsamplers.0.conv",
                f"down_{i}_downsample/conv", out,
            )

    _convert_resnet(sd, "mid_block.resnets.0", "mid_res_0", out)
    _convert_transformer2d(sd, "mid_block.attentions.0", "mid_attn", out)
    _convert_resnet(sd, "mid_block.resnets.1", "mid_res_1", out)

    for i, btype in enumerate(up_block_types):
        for j in range(layers_per_block + 1):
            _convert_resnet(sd, f"up_blocks.{i}.resnets.{j}", f"up_{i}_res_{j}", out)
            if btype == "CrossAttnUpBlock2D" and up_block_attention:
                _convert_transformer2d(
                    sd, f"up_blocks.{i}.attentions.{j}", f"up_{i}_attn_{j}", out
                )
        if f"up_blocks.{i}.upsamplers.0.conv.weight" in sd:
            _convert_conv(
                sd, f"up_blocks.{i}.upsamplers.0.conv", f"up_{i}_upsample/conv", out
            )

    _convert_norm(sd, "conv_norm_out", "conv_norm_out", out)
    _convert_conv(sd, "conv_out", "conv_out", out)
    return out


def _convert_vae_attention(sd, tprefix: str, fprefix: str,
                           out: Dict[str, Any]) -> None:
    """VAE mid-block attention; handles both modern (to_q Linear) and legacy
    (q/k/v 1x1 conv) diffusers layouts."""
    if f"{tprefix}.to_q.weight" in sd:
        _convert_norm(sd, f"{tprefix}.group_norm", f"{fprefix}/group_norm", out)
        for name in ("to_q", "to_k", "to_v"):
            w = _np(sd[f"{tprefix}.{name}.weight"])
            if w.ndim == 4:
                w = w[:, :, 0, 0]
            _assign(out, f"{fprefix}/{name}/kernel", _linear(w))
            _assign(out, f"{fprefix}/{name}/bias", _np(sd[f"{tprefix}.{name}.bias"]))
        w = _np(sd[f"{tprefix}.to_out.0.weight"])
        if w.ndim == 4:
            w = w[:, :, 0, 0]
        _assign(out, f"{fprefix}/to_out/kernel", _linear(w))
        _assign(out, f"{fprefix}/to_out/bias", _np(sd[f"{tprefix}.to_out.0.bias"]))
    else:  # legacy naming: norm / q / k / v / proj_out, all conv 1x1
        _convert_norm(sd, f"{tprefix}.norm", f"{fprefix}/group_norm", out)
        for tname, fname in (
            ("q", "to_q"), ("k", "to_k"), ("v", "to_v"), ("proj_out", "to_out")
        ):
            w = _np(sd[f"{tprefix}.{tname}.weight"])[:, :, 0, 0]
            _assign(out, f"{fprefix}/{fname}/kernel", _linear(w))
            _assign(out, f"{fprefix}/{fname}/bias", _np(sd[f"{tprefix}.{tname}.bias"]))


def convert_vae_state_dict(
    sd: Mapping[str, Any],
    num_blocks: int = 4,
    layers_per_block: int = 2,
) -> Dict[str, Any]:
    """diffusers AutoencoderKL state dict -> AutoencoderKL params."""
    out: Dict[str, Any] = {}

    enc = "encoder"
    _convert_conv(sd, f"{enc}.conv_in", "encoder/conv_in", out)
    for i in range(num_blocks):
        for j in range(layers_per_block):
            _convert_resnet(
                sd, f"{enc}.down_blocks.{i}.resnets.{j}",
                f"encoder/down_{i}_res_{j}", out, time_emb=False,
            )
        if f"{enc}.down_blocks.{i}.downsamplers.0.conv.weight" in sd:
            _convert_conv(
                sd, f"{enc}.down_blocks.{i}.downsamplers.0.conv",
                f"encoder/down_{i}_downsample/conv", out,
            )
    _convert_resnet(sd, f"{enc}.mid_block.resnets.0", "encoder/mid_res_0", out,
                    time_emb=False)
    _convert_vae_attention(sd, f"{enc}.mid_block.attentions.0", "encoder/mid_attn", out)
    _convert_resnet(sd, f"{enc}.mid_block.resnets.1", "encoder/mid_res_1", out,
                    time_emb=False)
    _convert_norm(sd, f"{enc}.conv_norm_out", "encoder/conv_norm_out", out)
    _convert_conv(sd, f"{enc}.conv_out", "encoder/conv_out", out)

    dec = "decoder"
    _convert_conv(sd, f"{dec}.conv_in", "decoder/conv_in", out)
    _convert_resnet(sd, f"{dec}.mid_block.resnets.0", "decoder/mid_res_0", out,
                    time_emb=False)
    _convert_vae_attention(sd, f"{dec}.mid_block.attentions.0", "decoder/mid_attn", out)
    _convert_resnet(sd, f"{dec}.mid_block.resnets.1", "decoder/mid_res_1", out,
                    time_emb=False)
    for i in range(num_blocks):
        for j in range(layers_per_block + 1):
            _convert_resnet(
                sd, f"{dec}.up_blocks.{i}.resnets.{j}",
                f"decoder/up_{i}_res_{j}", out, time_emb=False,
            )
        if f"{dec}.up_blocks.{i}.upsamplers.0.conv.weight" in sd:
            _convert_conv(
                sd, f"{dec}.up_blocks.{i}.upsamplers.0.conv",
                f"decoder/up_{i}_upsample/conv", out,
            )
    _convert_norm(sd, f"{dec}.conv_norm_out", "decoder/conv_norm_out", out)
    _convert_conv(sd, f"{dec}.conv_out", "decoder/conv_out", out)

    if "quant_conv.weight" in sd:
        _convert_conv(sd, "quant_conv", "quant_conv", out)
    if "post_quant_conv.weight" in sd:
        _convert_conv(sd, "post_quant_conv", "post_quant_conv", out)
    return out


# Cross-view block lists in checkpoint order (reference mvunet.py:74-88):
# encoder blocks index the 4 down stages, mid has one block, decoder the 4 up
# stages. Our UNet names them {down,mid,up}_{i}_cross_view.
_CROSS_VIEW_GROUPS = (
    ("denoiser.cross_attn_blocks_encoder", "down_{}_cross_view", 4),
    ("denoiser.cross_attn_blocks_mid", None, 1),
    ("denoiser.cross_attn_blocks_decoder", "up_{}_cross_view", 4),
)


def convert_mvldm_checkpoint(
    state_dict: Mapping[str, Any],
    layers_per_block: int = 2,
    down_block_types=(
        "CrossAttnDownBlock2D",
        "CrossAttnDownBlock2D",
        "CrossAttnDownBlock2D",
        "DownBlock2D",
    ),
    up_block_types=(
        "UpBlock2D",
        "CrossAttnUpBlock2D",
        "CrossAttnUpBlock2D",
        "CrossAttnUpBlock2D",
    ),
    vae_layers_per_block: int = 2,
) -> Dict[str, Dict[str, Any]]:
    """Reference Lightning checkpoint -> {"unet": ..., "vae": ...} params.

    The checkpoint stores the wrapper module tree: ``denoiser.unet.*`` (SD2.1
    UNet with swapped conv_in/conv_out), ``denoiser.cross_attn_blocks_*``
    (SpatialTransformer3D) and ``autoencoder.*`` (SD2.1 VAE).
    """
    unet_sd = {
        k[len("denoiser.unet."):]: v
        for k, v in state_dict.items()
        if k.startswith("denoiser.unet.")
    }
    unet = convert_unet_state_dict(
        unet_sd,
        down_block_types=down_block_types,
        up_block_types=up_block_types,
        layers_per_block=layers_per_block,
    )

    for tprefix, template, count in _CROSS_VIEW_GROUPS:
        for i in range(count):
            if not any(k.startswith(f"{tprefix}.{i}.") for k in state_dict):
                continue
            fname = "mid_cross_view" if template is None else template.format(i)
            _convert_spatial_transformer3d(
                state_dict, f"{tprefix}.{i}", fname, unet
            )

    vae_sd = {
        k[len("autoencoder."):]: v
        for k, v in state_dict.items()
        if k.startswith("autoencoder.")
    }
    vae = convert_vae_state_dict(vae_sd, layers_per_block=vae_layers_per_block)
    return {"unet": unet, "vae": vae}
