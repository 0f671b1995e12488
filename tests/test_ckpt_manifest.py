"""Released-checkpoint manifest: generation, checking, and the full-flagship
structural cross-check (VERDICT r4 #5 — everything except the download is
verified in-image)."""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np
import pytest

from mvldm_tpu.utils.ckpt_manifest import (
    DEFAULT_MANIFEST,
    check_shapes,
    generate_manifest,
)

REPO = Path(__file__).resolve().parent.parent


@pytest.fixture(scope="module")
def manifest():
    return generate_manifest()


def synth_checkpoint(manifest) -> dict:
    """Zeros-valued full-flagship state_dict exactly matching the census
    (np.zeros pages are lazily allocated, so this is cheap to hold)."""
    sd = {}
    for section in ("required", "ignored"):
        for key, shape in manifest[section].items():
            sd[key] = np.zeros(shape, np.float32)
    return sd


class TestManifest:
    def test_committed_manifest_up_to_date(self, manifest):
        committed = json.loads((REPO / DEFAULT_MANIFEST).read_text())
        assert committed == json.loads(json.dumps(manifest)), (
            "assets/mvldm_1.0_manifest.json is stale — regenerate with "
            "python -m mvldm_tpu.utils.ckpt_manifest --write "
            "assets/mvldm_1.0_manifest.json"
        )

    def test_synthesized_checkpoint_passes(self, manifest):
        sd = synth_checkpoint(manifest)
        report = check_shapes({k: v.shape for k, v in sd.items()}, manifest)
        assert not report["missing"] and not report["mismatched"]
        assert not report["extra"]

    def test_detects_defects(self, manifest):
        shapes = {k: tuple(v) for k, v in manifest["required"].items()}
        shapes.update({k: tuple(v) for k, v in manifest["ignored"].items()})
        # Shape mismatch.
        bad = dict(shapes, **{
            "denoiser.unet.conv_in.weight": (320, 9, 3, 3)
        })
        r = check_shapes(bad, manifest)
        assert [m[0] for m in r["mismatched"]] == ["denoiser.unet.conv_in.weight"]
        # Missing required fails; missing ignored only warns.
        del shapes["denoiser.unet.conv_out.weight"]
        ig = next(iter(manifest["ignored"]))
        del shapes[ig]
        r = check_shapes(shapes, manifest)
        assert r["missing"] == ["denoiser.unet.conv_out.weight"]
        assert r["missing_ignored"] == [ig]
        # Extra keys are informational.
        r = check_shapes(dict(shapes, extra_ema_key=(1,)), manifest)
        assert "extra_ema_key" in r["extra"]

    def test_legacy_vae_attention_accepted(self, manifest):
        shapes = {k: tuple(v) for k, v in manifest["required"].items()}
        # Rewrite the decoder VAE attention to the legacy q/k/v-conv layout.
        base = "autoencoder.decoder.mid_block.attentions.0"
        for mod, legacy in (("to_q", "q"), ("to_k", "k"), ("to_v", "v")):
            shapes[f"{base}.{legacy}.weight"] = (512, 512, 1, 1)
            shapes[f"{base}.{legacy}.bias"] = (512,)
            del shapes[f"{base}.{mod}.weight"]
            del shapes[f"{base}.{mod}.bias"]
        shapes[f"{base}.proj_out.weight"] = (512, 512, 1, 1)
        shapes[f"{base}.proj_out.bias"] = (512,)
        del shapes[f"{base}.to_out.0.weight"], shapes[f"{base}.to_out.0.bias"]
        shapes[f"{base}.norm.weight"] = (512,)
        shapes[f"{base}.norm.bias"] = (512,)
        del shapes[f"{base}.group_norm.weight"], shapes[f"{base}.group_norm.bias"]
        r = check_shapes(shapes, manifest)
        assert not r["missing"] and not r["mismatched"], r


@pytest.mark.slow
class TestFullFlagshipConversion:
    def test_convert_matches_model_init(self, manifest):
        """The synthesized full-flagship checkpoint converts into EXACTLY the
        parameter tree the live model initializes — both directions (no
        missing, no extra, no shape drift). With the tiny-topology torch
        activation goldens (test_torch_goldens.py) this pins the conversion
        at full scale without the (undownloadable) real file."""
        import jax
        import jax.numpy as jnp

        from mvldm_tpu.builder import build_engine
        from mvldm_tpu.config import compose, load_typed_root_config, set_cfg
        from mvldm_tpu.diffusion.engine import unet_in_channels
        from mvldm_tpu.utils.weight_convert import convert_mvldm_checkpoint

        sd = synth_checkpoint(manifest)
        converted = convert_mvldm_checkpoint(sd)

        cfg_dict = compose(["+experiment=baseline"])
        set_cfg(cfg_dict)
        cfg = load_typed_root_config(cfg_dict)
        engine = build_engine(cfg, dtype=jnp.float32)
        in_ch = unet_in_channels(cfg.model)
        rng = jax.random.PRNGKey(0)
        unet_abs = jax.eval_shape(
            lambda: engine.unet.init(
                rng, jnp.zeros((1, 2, 32, 32, in_ch)),
                jnp.zeros((1, 2), jnp.int32),
            )
        )["params"]
        vae_abs = jax.eval_shape(
            lambda: engine.vae.init(rng, jnp.zeros((1, 64, 64, 3)), rng)
        )["params"]

        from mvldm_tpu.utils.ckpt_manifest import _flatten_shapes

        for name, got_tree, want_tree in (
            ("unet", converted["unet"], unet_abs),
            ("vae", converted["vae"], vae_abs),
        ):
            got = _flatten_shapes(got_tree)
            want = _flatten_shapes(want_tree)
            assert set(got) == set(want), (
                name,
                sorted(set(got) - set(want))[:5],
                sorted(set(want) - set(got))[:5],
            )
            diff = {k: (got[k], want[k]) for k in want if got[k] != want[k]}
            assert not diff, (name, dict(list(diff.items())[:5]))
