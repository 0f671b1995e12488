"""Released-checkpoint structural manifest (offline parity pre-check).

The released reference checkpoint (``asimbluemoon/mvldm-1.0``, reference
``README.md:40``) cannot be downloaded in this environment, so executed
numerical parity runs elsewhere (``scripts/verify_parity.py``). This module
makes everything EXCEPT the download verifiable offline: it generates the
exact torch ``state_dict`` key -> shape census the converter
(``utils/weight_convert.convert_mvldm_checkpoint``) consumes, committed as
``assets/mvldm_1.0_manifest.json``, and checks a real checkpoint file
against it in one command:

    python -m mvldm_tpu.utils.ckpt_manifest --check path/to/mvldm-1.0.ckpt

The census is NOT hand-maintained: it is derived from the live flagship
Flax model (``jax.eval_shape`` of the baseline-config UNet + VAE init) by
inverting the converter's name/shape maps — so the manifest provably
describes what the conversion will look for. Keys the checkpoint contains
but the converter deliberately ignores (the up-block SD attentions skipped
on the pretrained path, ``models/unet.py`` docstring / reference
``mvunet.py:178``) are listed separately as "ignored".

Full recipe (one command per step; only step 1 needs network):
see ``tools/fetch_convert_verify.sh``.
"""

from __future__ import annotations

import json
import re
from pathlib import Path
from typing import Any, Dict, Tuple

import numpy as np

DEFAULT_MANIFEST = Path("assets/mvldm_1.0_manifest.json")

# ---------------------------------------------------------------------------
# Flax-path -> torch-key inversion (the converter's name maps, reversed).
# ---------------------------------------------------------------------------

_UNET_TOP = [
    (re.compile(r"^down_(\d+)_res_(\d+)$"), "down_blocks.{0}.resnets.{1}"),
    (re.compile(r"^down_(\d+)_attn_(\d+)$"), "down_blocks.{0}.attentions.{1}"),
    (re.compile(r"^down_(\d+)_downsample$"), "down_blocks.{0}.downsamplers.0"),
    (re.compile(r"^up_(\d+)_res_(\d+)$"), "up_blocks.{0}.resnets.{1}"),
    (re.compile(r"^up_(\d+)_attn_(\d+)$"), "up_blocks.{0}.attentions.{1}"),
    (re.compile(r"^up_(\d+)_upsample$"), "up_blocks.{0}.upsamplers.0"),
    (re.compile(r"^mid_res_(\d+)$"), "mid_block.resnets.{0}"),
    (re.compile(r"^mid_attn$"), "mid_block.attentions.0"),
    (re.compile(r"^time_emb_1$"), "time_embedding.linear_1"),
    (re.compile(r"^time_emb_2$"), "time_embedding.linear_2"),
    (re.compile(r"^conv_in$"), "conv_in"),
    (re.compile(r"^conv_out$"), "conv_out"),
    (re.compile(r"^conv_norm_out$"), "conv_norm_out"),
]

_CROSS_VIEW = [
    (re.compile(r"^down_(\d+)_cross_view$"),
     "denoiser.cross_attn_blocks_encoder.{0}"),
    (re.compile(r"^mid_cross_view$"), "denoiser.cross_attn_blocks_mid.0"),
    (re.compile(r"^up_(\d+)_cross_view$"),
     "denoiser.cross_attn_blocks_decoder.{0}"),
]


def _translate_tail(parts) -> str:
    """Module tail: flax naming -> torch naming (converter maps reversed)."""
    out = []
    i = 0
    while i < len(parts):
        p = parts[i]
        if p == "GroupNorm_0":  # our GroupNorm wrapper's inner module
            i += 1
            continue
        if p == "blocks_0":
            out.append("transformer_blocks.0")
        elif p == "net_0":
            out.append("net.0")
        elif p == "net_2":
            out.append("net.2")
        elif p == "to_out":
            out.append("to_out.0")  # diffusers ModuleList [linear, dropout]
        else:
            out.append(p)
        i += 1
    return ".".join(out)


def _torch_shape(leaf_name: str, shape: Tuple[int, ...]) -> Tuple[str, Tuple[int, ...]]:
    """(torch leaf name, torch shape) for a flax leaf."""
    if leaf_name == "kernel":
        if len(shape) == 4:  # HWIO -> OIHW
            kh, kw, cin, cout = shape
            return "weight", (cout, cin, kh, kw)
        if len(shape) == 2:  # (in, out) -> (out, in)
            return "weight", (shape[1], shape[0])
        raise ValueError(f"kernel of rank {len(shape)}")
    if leaf_name == "scale":
        return "weight", tuple(shape)
    return leaf_name, tuple(shape)


def _invert_tree(flat: Dict[str, Tuple[int, ...]], which: str) -> Dict[str, list]:
    """Flattened flax {path: shape} -> torch {key: shape} with the Lightning
    wrapper prefixes (``denoiser.unet.`` / ``denoiser.cross_attn_blocks_*`` /
    ``autoencoder.``)."""
    out: Dict[str, list] = {}
    for path, shape in flat.items():
        parts = path.split("/")
        if parts[0] == "params":
            parts = parts[1:]
        top, tail = parts[0], parts[1:]
        prefix = None
        if which == "unet":
            for pat, template in _CROSS_VIEW:
                m = pat.match(top)
                if m:
                    prefix = template.format(*m.groups())
                    break
            if prefix is None:
                for pat, template in _UNET_TOP:
                    m = pat.match(top)
                    if m:
                        prefix = "denoiser.unet." + template.format(*m.groups())
                        break
            if prefix is None:
                raise KeyError(f"no inverse rule for UNet module {top!r}")
        else:  # vae: flax paths already mirror torch module nesting
            prefix = "autoencoder"
            tail = parts  # keep encoder/decoder/... as part of the tail
            # But the block names inside use the converter's flat naming:
            # encoder/down_0_res_1 -> encoder.down_blocks.0.resnets.1 etc.
            tail = []
            for p in parts:
                m = re.match(r"^down_(\d+)_res_(\d+)$", p)
                if m:
                    tail.append(f"down_blocks.{m.group(1)}.resnets.{m.group(2)}")
                    continue
                m = re.match(r"^up_(\d+)_res_(\d+)$", p)
                if m:
                    tail.append(f"up_blocks.{m.group(1)}.resnets.{m.group(2)}")
                    continue
                m = re.match(r"^down_(\d+)_downsample$", p)
                if m:
                    tail.append(f"down_blocks.{m.group(1)}.downsamplers.0")
                    continue
                m = re.match(r"^up_(\d+)_upsample$", p)
                if m:
                    tail.append(f"up_blocks.{m.group(1)}.upsamplers.0")
                    continue
                m = re.match(r"^mid_res_(\d+)$", p)
                if m:
                    tail.append(f"mid_block.resnets.{m.group(1)}")
                    continue
                if p == "mid_attn":
                    tail.append("mid_block.attentions.0")
                    continue
                tail.append(p)
        leaf = tail[-1]
        tname, tshape = _torch_shape(leaf, shape)
        tail_str = _translate_tail(tail[:-1])
        key = ".".join(x for x in (prefix, tail_str, tname) if x)
        out[key] = list(tshape)
    return out


def _transformer2d_keys(prefix: str, c: int, ctx: int = 1024) -> Dict[str, list]:
    """Torch key census of one SD Transformer2DModel (linear projections) —
    used for the up-block attentions the checkpoint CONTAINS but the
    converter ignores (pretrained-path quirk, reference ``mvunet.py:178``)."""
    tb = f"{prefix}.transformer_blocks.0"
    keys: Dict[str, list] = {
        f"{prefix}.norm.weight": [c], f"{prefix}.norm.bias": [c],
        f"{prefix}.proj_in.weight": [c, c], f"{prefix}.proj_in.bias": [c],
        f"{prefix}.proj_out.weight": [c, c], f"{prefix}.proj_out.bias": [c],
    }
    for n in ("norm1", "norm2", "norm3"):
        keys[f"{tb}.{n}.weight"] = [c]
        keys[f"{tb}.{n}.bias"] = [c]
    for attn, kdim in (("attn1", c), ("attn2", ctx)):
        keys[f"{tb}.{attn}.to_q.weight"] = [c, c]
        keys[f"{tb}.{attn}.to_k.weight"] = [c, kdim]
        keys[f"{tb}.{attn}.to_v.weight"] = [c, kdim]
        keys[f"{tb}.{attn}.to_out.0.weight"] = [c, c]
        keys[f"{tb}.{attn}.to_out.0.bias"] = [c]
    keys[f"{tb}.ff.net.0.proj.weight"] = [8 * c, c]
    keys[f"{tb}.ff.net.0.proj.bias"] = [8 * c]
    keys[f"{tb}.ff.net.2.weight"] = [c, 4 * c]
    keys[f"{tb}.ff.net.2.bias"] = [c]
    return keys


def _flatten_shapes(tree) -> Dict[str, Tuple[int, ...]]:
    import jax.tree_util as jtu

    return {
        "/".join(str(getattr(p, "key", p)) for p in path): tuple(leaf.shape)
        for path, leaf in jtu.tree_flatten_with_path(tree)[0]
    }


def generate_manifest() -> Dict[str, Any]:
    """{"required": {torch_key: shape}, "ignored": {...}} for the flagship
    (baseline-config) model, derived from the live Flax modules."""
    import jax
    import jax.numpy as jnp

    from ..builder import build_engine
    from ..config import compose, load_typed_root_config, set_cfg
    from ..diffusion.engine import unet_in_channels

    cfg_dict = compose(["+experiment=baseline"])
    set_cfg(cfg_dict)
    cfg = load_typed_root_config(cfg_dict)
    engine = build_engine(cfg, dtype=jnp.float32)
    in_ch = unet_in_channels(cfg.model)
    rng = jax.random.PRNGKey(0)

    # 32x32 latents (256px images): every cross-view site is active, matching
    # the released 256px checkpoint.
    unet_abs = jax.eval_shape(
        lambda: engine.unet.init(
            rng, jnp.zeros((1, 2, 32, 32, in_ch)), jnp.zeros((1, 2), jnp.int32)
        )
    )
    vae_abs = jax.eval_shape(
        lambda: engine.vae.init(rng, jnp.zeros((1, 64, 64, 3)), rng)
    )
    required = _invert_tree(_flatten_shapes(unet_abs), "unet")
    required.update(_invert_tree(_flatten_shapes(vae_abs), "vae"))

    ub = cfg.model.denoiser.autoencoder
    rev = list(reversed(ub.block_out_channels))
    ignored: Dict[str, list] = {}
    for i, btype in enumerate(ub.up_block_types):
        if btype != "CrossAttnUpBlock2D":
            continue
        for j in range(ub.layers_per_block + 1):
            ignored.update(
                _transformer2d_keys(
                    f"denoiser.unet.up_blocks.{i}.attentions.{j}",
                    rev[i], ub.cross_attention_dim,
                )
            )
    return {"required": required, "ignored": ignored}


# ---------------------------------------------------------------------------
# Checking
# ---------------------------------------------------------------------------

_LEGACY_VAE_ATTN = {"q": "to_q", "k": "to_k", "v": "to_v", "proj_out": "to_out.0",
                    "norm": "group_norm"}


def _normalize_key(key: str, shape: Tuple[int, ...]):
    """Map legacy diffusers VAE attention names (q/k/v 1x1 convs) onto the
    modern layout the manifest uses (to_q Linear), squeezing the conv dims —
    the same tolerance ``weight_convert._convert_vae_attention`` has."""
    m = re.match(
        r"^(autoencoder\.(?:en|de)coder\.mid_block\.attentions\.0)\."
        r"(q|k|v|proj_out|norm)\.(weight|bias)$", key,
    )
    if not m:
        return key, shape
    base, name, leaf = m.groups()
    if leaf == "weight" and len(shape) == 4 and name != "norm":
        shape = shape[:2]
    return f"{base}.{_LEGACY_VAE_ATTN[name]}.{leaf}", shape


def check_shapes(
    sd_shapes: Dict[str, Tuple[int, ...]], manifest: Dict[str, Any]
) -> Dict[str, list]:
    """Compare a state_dict's {key: shape} against the manifest.

    Returns {"missing": [...], "mismatched": [(key, got, want)],
    "missing_ignored": [...], "extra": [...]}; the check PASSES iff
    ``missing`` and ``mismatched`` are empty."""
    norm = dict(_normalize_key(k, tuple(s)) for k, s in sd_shapes.items())
    missing, mismatched = [], []
    for key, want in manifest["required"].items():
        if key not in norm:
            missing.append(key)
        elif list(norm[key]) != list(want):
            mismatched.append((key, list(norm[key]), list(want)))
    missing_ignored = [k for k in manifest.get("ignored", {}) if k not in norm]
    known = set(manifest["required"]) | set(manifest.get("ignored", {}))
    extra = sorted(k for k in norm if k not in known)
    return {
        "missing": missing,
        "mismatched": mismatched,
        "missing_ignored": missing_ignored,
        "extra": extra,
    }


def check_checkpoint(ckpt_path: Path, manifest_path: Path) -> bool:
    """Load a torch .ckpt (metadata only where possible) and check it.
    Prints a report; returns pass/fail."""
    import torch

    manifest = json.loads(Path(manifest_path).read_text())
    obj = torch.load(ckpt_path, map_location="meta", weights_only=False)
    sd = obj.get("state_dict", obj) if isinstance(obj, dict) else obj
    shapes = {k: tuple(v.shape) for k, v in sd.items() if hasattr(v, "shape")}
    report = check_shapes(shapes, manifest)
    ok = not report["missing"] and not report["mismatched"]
    print(f"checkpoint: {ckpt_path} ({len(shapes)} tensors)")
    print(f"required:   {len(manifest['required'])} expected, "
          f"{len(report['missing'])} missing, "
          f"{len(report['mismatched'])} shape-mismatched")
    for key in report["missing"][:20]:
        print(f"  MISSING    {key}")
    for key, got, want in report["mismatched"][:20]:
        print(f"  MISMATCH   {key}: checkpoint {got} vs expected {want}")
    if report["missing_ignored"]:
        print(f"note: {len(report['missing_ignored'])} converter-ignored keys "
              "absent (up-block SD attentions) — conversion unaffected")
    if report["extra"]:
        print(f"note: {len(report['extra'])} extra keys not consumed by the "
              f"converter (first few: {report['extra'][:5]})")
    print("STRUCTURE " + ("OK — safe to convert" if ok else "CHECK FAILED"))
    return ok


def main(argv=None) -> None:
    import argparse
    import sys

    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--write", type=Path, default=None,
                        help="generate the manifest JSON (offline, in-image)")
    parser.add_argument("--check", type=Path, default=None,
                        help="torch .ckpt to validate against the manifest")
    parser.add_argument("--manifest", type=Path, default=DEFAULT_MANIFEST)
    args = parser.parse_args(argv)
    if args.write is not None:
        manifest = generate_manifest()
        args.write.parent.mkdir(parents=True, exist_ok=True)
        args.write.write_text(json.dumps(manifest, indent=1, sort_keys=True))
        print(f"Wrote {args.write} ({len(manifest['required'])} required + "
              f"{len(manifest['ignored'])} ignored keys)")
    if args.check is not None:
        if not check_checkpoint(args.check, args.manifest):
            sys.exit(1)
    if args.write is None and args.check is None:
        parser.error("pass --write and/or --check")


if __name__ == "__main__":
    main()
