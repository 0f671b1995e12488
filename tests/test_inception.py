"""FID-Inception extractor goldens.

The jnp ``evaluation/inception.InceptionV3Features`` is checked against an
independent torch functional mirror of the FID InceptionV3 forward
(pytorch-fid's modified torchvision topology — the network behind the
reference's torchmetrics FID at ``src/evaluation/metric_computer.py:22`` and
cleanfid at ``src/scripts/compute_fid.py:43-50``), on synthesized weights
with the real key census. Torch supplies the op semantics to match:
``F.conv2d``/eval-mode ``F.batch_norm`` vs lax.conv + folded BN,
``count_include_pad=False`` average pooling vs the reduce_window pair,
``F.interpolate(bilinear, align_corners=False)`` vs ``jax.image.resize``.
"""

from __future__ import annotations

import numpy as np
import pytest

from mvldm_tpu.evaluation.inception import (
    CONV_DEFS,
    InceptionV3Features,
    expected_state_keys,
    inception_feature_extractor,
)


def synth_state(seed: int = 0) -> dict:
    """Random weights with the exact census; He-scaled convs so the INPUT
    signal survives all 94 conv+BN+relu layers (smaller scales decay it to
    zero, leaving only BN-shift constants — which would make the parity
    test blind to input-path semantics like the resize)."""
    rng = np.random.default_rng(seed)
    state = {}
    for key, shape in expected_state_keys().items():
        if key.endswith("conv.weight"):
            fan_in = shape[1] * shape[2] * shape[3]
            state[key] = rng.normal(
                0, np.sqrt(2.0 / fan_in), size=shape
            ).astype(np.float32)
        elif key.endswith("bn.weight"):
            state[key] = (1.0 + 0.1 * rng.normal(size=shape)).astype(np.float32)
        elif key.endswith("bn.bias"):
            state[key] = (0.05 * rng.normal(size=shape)).astype(np.float32)
        elif key.endswith("bn.running_mean"):
            state[key] = (0.01 * rng.normal(size=shape)).astype(np.float32)
        else:  # running_var
            state[key] = np.abs(
                1.0 + 0.1 * rng.normal(size=shape)
            ).astype(np.float32) + 0.1
    return state


# ---------------------------------------------------------------------------
# Independent torch mirror (pytorch-fid FID-InceptionV3 forward).
# ---------------------------------------------------------------------------


def _torch_pool3(state: dict, images01: np.ndarray) -> np.ndarray:
    import torch
    import torch.nn.functional as F

    t = lambda key: torch.from_numpy(np.asarray(state[key]))

    def bc(path, x):
        _, _, _, s, p = CONV_DEFS[path]
        x = F.conv2d(x, t(f"{path}.conv.weight"), stride=s, padding=p)
        x = F.batch_norm(
            x, t(f"{path}.bn.running_mean"), t(f"{path}.bn.running_var"),
            t(f"{path}.bn.weight"), t(f"{path}.bn.bias"),
            training=False, eps=1e-3,
        )
        return F.relu(x)

    def avg_ex(x):  # the FID blocks' count_include_pad=False pool
        return F.avg_pool2d(x, 3, stride=1, padding=1, count_include_pad=False)

    def block_a(name, x):
        b1 = bc(f"{name}.branch1x1", x)
        b5 = bc(f"{name}.branch5x5_2", bc(f"{name}.branch5x5_1", x))
        b3 = bc(f"{name}.branch3x3dbl_3",
                bc(f"{name}.branch3x3dbl_2", bc(f"{name}.branch3x3dbl_1", x)))
        bp = bc(f"{name}.branch_pool", avg_ex(x))
        return torch.cat([b1, b5, b3, bp], dim=1)

    def block_b(name, x):
        b3 = bc(f"{name}.branch3x3", x)
        bd = bc(f"{name}.branch3x3dbl_3",
                bc(f"{name}.branch3x3dbl_2", bc(f"{name}.branch3x3dbl_1", x)))
        return torch.cat([b3, bd, F.max_pool2d(x, 3, stride=2)], dim=1)

    def block_c(name, x):
        b1 = bc(f"{name}.branch1x1", x)
        b7 = bc(f"{name}.branch7x7_3",
                bc(f"{name}.branch7x7_2", bc(f"{name}.branch7x7_1", x)))
        bd = bc(f"{name}.branch7x7dbl_1", x)
        for i in (2, 3, 4, 5):
            bd = bc(f"{name}.branch7x7dbl_{i}", bd)
        bp = bc(f"{name}.branch_pool", avg_ex(x))
        return torch.cat([b1, b7, bd, bp], dim=1)

    def block_d(name, x):
        b3 = bc(f"{name}.branch3x3_2", bc(f"{name}.branch3x3_1", x))
        b7 = bc(f"{name}.branch7x7x3_1", x)
        for i in (2, 3, 4):
            b7 = bc(f"{name}.branch7x7x3_{i}", b7)
        return torch.cat([b3, b7, F.max_pool2d(x, 3, stride=2)], dim=1)

    def block_e(name, x, pool):
        b1 = bc(f"{name}.branch1x1", x)
        b3 = bc(f"{name}.branch3x3_1", x)
        b3 = torch.cat(
            [bc(f"{name}.branch3x3_2a", b3), bc(f"{name}.branch3x3_2b", b3)],
            dim=1,
        )
        bd = bc(f"{name}.branch3x3dbl_2", bc(f"{name}.branch3x3dbl_1", x))
        bd = torch.cat(
            [bc(f"{name}.branch3x3dbl_3a", bd),
             bc(f"{name}.branch3x3dbl_3b", bd)], dim=1,
        )
        pooled = (
            F.max_pool2d(x, 3, stride=1, padding=1) if pool == "max"
            else avg_ex(x)
        )
        bp = bc(f"{name}.branch_pool", pooled)
        return torch.cat([b1, b3, bd, bp], dim=1)

    with torch.no_grad():
        x = torch.from_numpy(
            np.ascontiguousarray(images01.transpose(0, 3, 1, 2))
        ).float()
        x = F.interpolate(
            x, size=(299, 299), mode="bilinear", align_corners=False
        )
        x = x * 2.0 - 1.0
        x = bc("Conv2d_1a_3x3", x)
        x = bc("Conv2d_2a_3x3", x)
        x = bc("Conv2d_2b_3x3", x)
        x = F.max_pool2d(x, 3, stride=2)
        x = bc("Conv2d_3b_1x1", x)
        x = bc("Conv2d_4a_3x3", x)
        x = F.max_pool2d(x, 3, stride=2)
        for name in ("Mixed_5b", "Mixed_5c", "Mixed_5d"):
            x = block_a(name, x)
        x = block_b("Mixed_6a", x)
        for name in ("Mixed_6b", "Mixed_6c", "Mixed_6d", "Mixed_6e"):
            x = block_c(name, x)
        x = block_d("Mixed_7a", x)
        x = block_e("Mixed_7b", x, pool="avg")
        x = block_e("Mixed_7c", x, pool="max")
        return x.mean(dim=(2, 3)).numpy()


class TestInceptionFeatures:
    def test_census_size(self):
        census = expected_state_keys()
        # 94 BasicConv2d modules x (conv weight + 4 BN tensors).
        assert len(CONV_DEFS) == 94
        assert len(census) == 94 * 5
        # torchvision channel bookkeeping spot checks.
        assert census["Mixed_7c.branch_pool.conv.weight"] == (192, 2048, 1, 1)
        assert census["Mixed_6a.branch3x3.conv.weight"] == (384, 288, 3, 3)

    @pytest.mark.goldens
    def test_matches_torch_mirror(self):
        state = synth_state()
        images = np.random.default_rng(1).uniform(
            size=(2, 64, 64, 3)
        ).astype(np.float32)
        ours = InceptionV3Features(state)(images)
        golden = _torch_pool3(state, images)
        assert ours.shape == golden.shape == (2, 2048)
        # The features must actually DEPEND on the input (a dead signal
        # path would make this parity check vacuous).
        sensitivity = np.abs(ours[0] - ours[1]).mean()
        assert sensitivity > 1e-3 * np.abs(ours).mean(), sensitivity
        scale = np.abs(golden).mean()
        np.testing.assert_allclose(
            ours, golden, rtol=2e-3, atol=2e-3 * max(scale, 1.0)
        )

    def test_missing_key_raises(self):
        state = synth_state()
        del state["Mixed_7b.branch1x1.conv.weight"]
        with pytest.raises(KeyError, match="missing"):
            InceptionV3Features(state)

    @pytest.mark.goldens
    def test_extractor_resolution(self, tmp_path):
        assert inception_feature_extractor(tmp_path / "nope.npz") is None
        path = tmp_path / "inception_fid.npz"
        np.savez(path, **synth_state())
        ex = inception_feature_extractor(path)
        feats = ex(np.zeros((1, 32, 32, 3), np.float32))
        assert feats.shape == (1, 2048) and np.isfinite(feats).all()


class TestConverter:
    def test_state_dict_validation(self):
        from mvldm_tpu.utils.inception_convert import state_dict_to_npz_dict

        state = synth_state()
        out = state_dict_to_npz_dict(dict(state, extra_fc=np.zeros(3)))
        assert set(out) == set(expected_state_keys())  # fc dropped

        bad = dict(state)
        bad["Conv2d_1a_3x3.conv.weight"] = np.zeros((32, 3, 5, 5), np.float32)
        with pytest.raises(ValueError, match="shape"):
            state_dict_to_npz_dict(bad)

        del state["Mixed_5b.branch1x1.bn.running_var"]
        with pytest.raises(KeyError, match="lacks"):
            state_dict_to_npz_dict(state)


@pytest.mark.goldens
class TestComputeFidResolution:
    def test_inception_preferred(self, tmp_path, capsys):
        from mvldm_tpu.scripts.compute_fid import resolve_extractor

        path = tmp_path / "w.npz"
        np.savez(path, **synth_state())
        ex, prefix = resolve_extractor(None, None, False, path)
        assert prefix == "inception"
        assert ex(np.zeros((1, 16, 16, 3), np.float32)).shape == (1, 2048)
