"""One-time LPIPS weight conversion (run on a machine with network access).

Produces ``assets/lpips_vgg.npz`` consumed by ``evaluation/metrics.LPIPS``:
torchvision VGG16 conv weights (OIHW -> HWIO) plus the lpips package's
linear calibration heads.

    python -m mvldm_tpu.utils.lpips_convert --output assets/lpips_vgg.npz
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np

VGG16_BLOCKS = [(64, 2), (128, 2), (256, 3), (512, 3), (512, 3)]


def convert(output: Path) -> None:
    import lpips  # requires the lpips pip package + torchvision weights
    import torch

    model = lpips.LPIPS(net="vgg")
    vgg_features = model.net.slice1  # torchvision VGG16 features module list
    # Collect conv layers in order from the full feature extractor.
    convs = [
        m
        for slice_ in (model.net.slice1, model.net.slice2, model.net.slice3,
                       model.net.slice4, model.net.slice5)
        for m in slice_.modules()
        if isinstance(m, torch.nn.Conv2d)
    ]
    data = {}
    idx = 0
    for block, (_, n_convs) in enumerate(VGG16_BLOCKS):
        for c in range(n_convs):
            conv = convs[idx]
            idx += 1
            name = f"conv{block + 1}_{c + 1}"
            data[f"{name}_kernel"] = (
                conv.weight.detach().numpy().transpose(2, 3, 1, 0)
            )
            data[f"{name}_bias"] = conv.bias.detach().numpy()
    for i, lin in enumerate(model.lins):
        data[f"lin{i}"] = lin.model[1].weight.detach().numpy().reshape(-1)
    output.parent.mkdir(parents=True, exist_ok=True)
    np.savez(output, **data)
    print(f"Wrote {output}")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--output", type=Path, default=Path("assets/lpips_vgg.npz"))
    convert(parser.parse_args().output)
