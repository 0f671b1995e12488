"""LPIPS / DISTS activation goldens vs independent torch functional mirrors.

The real learned weights cannot exist in this image (no network, no
lpips/torchvision/DISTS_pytorch packages), so the strongest obtainable
evidence is exact architectural parity on synthesized weights: the torch
mirrors below implement the lpips package's formula
(``lpips.LPIPS(net='vgg')``: scaling layer == ImageNet normalize, VGG16
relu{1_2,2_2,3_3,4_3,5_3} taps, unit channel normalization, non-negative
linear heads, spatial mean) and DISTS_pytorch's (L2-pooled VGG trunk,
per-stage texture/structure statistics under learned alpha/beta) with
torch ops only, sharing nothing with the jnp implementations but the
converted-weights dict. Reference consumers: ``src/evaluation/metrics.py``
(lpips at :44-54, DISTS at :28-40)."""

from __future__ import annotations

import numpy as np
import pytest

pytestmark = pytest.mark.goldens

from mvldm_tpu.evaluation.metrics import DISTS, LPIPS, _VGG16Features


def he_vgg_npz(path, seed=0):
    """Synthesized VGG16 + heads npz: He-scaled so the input signal survives
    all 13 conv layers (see test_inception.py for why this matters)."""
    rng = np.random.default_rng(seed)
    data = {}
    cin = 3
    for block, (ch, n_convs) in enumerate(_VGG16Features.CONV_LAYERS):
        for c in range(n_convs):
            name = f"conv{block + 1}_{c + 1}"
            fan_in = 3 * 3 * cin
            data[f"{name}_kernel"] = rng.normal(
                size=(3, 3, cin, ch), scale=np.sqrt(2.0 / fan_in)
            ).astype(np.float32)
            data[f"{name}_bias"] = (
                0.01 * rng.normal(size=ch)
            ).astype(np.float32)
            cin = ch
    for i, ch in enumerate((64, 128, 256, 512, 512)):
        data[f"lin{i}"] = np.abs(rng.normal(size=ch)).astype(np.float32)
    n = 3 + 64 + 128 + 256 + 512 + 512
    data["dists_alpha"] = np.abs(rng.normal(size=n)).astype(np.float32)
    data["dists_beta"] = np.abs(rng.normal(size=n)).astype(np.float32)
    np.savez(path, **data)
    return path


# ---------------------------------------------------------------------------
# Torch mirrors (NCHW, torch ops only).
# ---------------------------------------------------------------------------


def _torch_vgg_feats(data, x):
    """x: NCHW in [0,1] -> the five relu taps, ImageNet-normalized input
    (== the lpips scaling layer: shift/scale on [-1,1] algebraically equals
    (x - mean)/std on [0,1])."""
    import torch
    import torch.nn.functional as F

    mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
    std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)
    h = (x - mean) / std
    feats = []
    for block, (ch, n_convs) in enumerate(_VGG16Features.CONV_LAYERS):
        for c in range(n_convs):
            name = f"conv{block + 1}_{c + 1}"
            w = torch.from_numpy(
                np.ascontiguousarray(
                    data[f"{name}_kernel"].transpose(3, 2, 0, 1)
                )
            )
            h = F.relu(F.conv2d(h, w, torch.from_numpy(data[f"{name}_bias"]),
                                padding=1))
        feats.append(h)
        if block < 4:
            h = F.max_pool2d(h, 2, stride=2)
    return feats


def torch_lpips(data, a, b):
    """a, b: NHWC [0,1] numpy -> (batch,) LPIPS via the lpips formula."""
    import torch

    with torch.no_grad():
        ta = torch.from_numpy(a.transpose(0, 3, 1, 2)).float()
        tb = torch.from_numpy(b.transpose(0, 3, 1, 2)).float()
        fa = _torch_vgg_feats(data, ta)
        fb = _torch_vgg_feats(data, tb)
        total = 0.0
        for i, (x, y) in enumerate(zip(fa, fb)):
            nx = x / torch.sqrt((x * x).sum(1, keepdim=True) + 1e-10)
            ny = y / torch.sqrt((y * y).sum(1, keepdim=True) + 1e-10)
            d = (nx - ny) ** 2
            w = torch.from_numpy(data[f"lin{i}"]).view(1, -1, 1, 1)
            total = total + (d * w).sum(1).mean(dim=(1, 2))
        return total.numpy()


def _torch_l2pool(x):
    import torch
    import torch.nn.functional as F

    a = np.hanning(5)[1:-1]
    g = np.outer(a, a)
    k = torch.from_numpy((g / g.sum()).astype(np.float32))
    c = x.shape[1]
    k = k.view(1, 1, 3, 3).repeat(c, 1, 1, 1)
    pooled = F.conv2d(x * x, k, stride=2, padding=1, groups=c)
    return torch.sqrt(torch.clamp(pooled, min=1e-12))


def _torch_dists_feats(data, x):
    """DISTS forward_once: [input, taps...] with L2 pooling between blocks."""
    import torch
    import torch.nn.functional as F

    mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
    std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)
    feats = [x]
    h = (x - mean) / std
    for block, (ch, n_convs) in enumerate(_VGG16Features.CONV_LAYERS):
        if block > 0:
            h = _torch_l2pool(h)
        for c in range(n_convs):
            name = f"conv{block + 1}_{c + 1}"
            w = torch.from_numpy(
                np.ascontiguousarray(
                    data[f"{name}_kernel"].transpose(3, 2, 0, 1)
                )
            )
            h = F.relu(F.conv2d(h, w, torch.from_numpy(data[f"{name}_bias"]),
                                padding=1))
        feats.append(h)
    return feats


def torch_dists(data, a, b):
    import torch

    chns = [3, 64, 128, 256, 512, 512]
    with torch.no_grad():
        fa = _torch_dists_feats(
            data, torch.from_numpy(a.transpose(0, 3, 1, 2)).float()
        )
        fb = _torch_dists_feats(
            data, torch.from_numpy(b.transpose(0, 3, 1, 2)).float()
        )
        alpha = torch.from_numpy(data["dists_alpha"]).float()
        beta = torch.from_numpy(data["dists_beta"]).float()
        w_sum = alpha.sum() + beta.sum()
        alpha = (alpha / w_sum).split(chns)
        beta = (beta / w_sum).split(chns)
        c1 = c2 = 1e-6
        dist1 = dist2 = 0.0
        for j, (x, y) in enumerate(zip(fa, fb)):
            mx = x.mean(dim=(2, 3))
            my = y.mean(dim=(2, 3))
            texture = (2 * mx * my + c1) / (mx**2 + my**2 + c1)
            vx = x.var(dim=(2, 3), unbiased=False)
            vy = y.var(dim=(2, 3), unbiased=False)
            cov = (x * y).mean(dim=(2, 3)) - mx * my
            structure = (2 * cov + c2) / (vx + vy + c2)
            dist1 = dist1 + (alpha[j][None, :] * texture).sum(1)
            dist2 = dist2 + (beta[j][None, :] * structure).sum(1)
        return (1.0 - (dist1 + dist2)).numpy()


# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def weights(tmp_path_factory):
    path = he_vgg_npz(tmp_path_factory.mktemp("w") / "vgg.npz")
    return path, dict(np.load(path))


def _images(n=2, hw=64, seed=1):
    rng = np.random.default_rng(seed)
    a = rng.uniform(size=(n, hw, hw, 3)).astype(np.float32)
    b = np.clip(a + 0.25 * rng.normal(size=a.shape), 0, 1).astype(np.float32)
    return a, b


class TestLPIPSGolden:
    def test_matches_torch_mirror(self, weights):
        path, data = weights
        a, b = _images()
        ours = np.asarray(LPIPS(path)(a, b))
        golden = torch_lpips(data, a, b)
        assert np.abs(golden).min() > 1e-4  # live signal, non-vacuous
        np.testing.assert_allclose(ours, golden, rtol=2e-4, atol=1e-5)


class TestDISTSGolden:
    def test_matches_torch_mirror(self, weights):
        path, data = weights
        a, b = _images(seed=2)
        ours = np.asarray(DISTS(path)(a, b))
        golden = torch_dists(data, a, b)
        assert np.abs(golden).min() > 1e-4
        np.testing.assert_allclose(ours, golden, rtol=2e-4, atol=1e-5)
