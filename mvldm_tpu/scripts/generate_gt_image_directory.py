"""Flat ground-truth image directory for directory-vs-directory FID
(reference ``src/scripts/generate_gt_image_directory.py``): every target
frame saved as ``<scene>_<index>.png`` in one directory.

    python -m mvldm_tpu.scripts.generate_gt_image_directory \\
        +experiment=baseline dataset.root=<path> output_dir=outputs/gt_images
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

from ..config import compose, load_typed_root_config, set_cfg
from ..data.view_samplers import StepTracker
from ..utils.image_io import save_image
from .main import build_data_module


def main(argv=None) -> None:
    overrides = list(argv if argv is not None else sys.argv[1:])
    if not any(o.startswith("mode=") for o in overrides):
        overrides.append("mode=test")
    cfg_dict = compose(overrides)
    set_cfg(cfg_dict)
    cfg = load_typed_root_config(cfg_dict)

    out = Path(cfg.output_dir)
    out.mkdir(parents=True, exist_ok=True)
    dm = build_data_module(cfg, StepTracker())
    limit = cfg.test.limit_frames or 80
    for n, batch in enumerate(dm.test_dataloader()):
        if cfg.trainer.limit_test_batches and n >= cfg.trainer.limit_test_batches:
            break
        for i, scene in enumerate(batch["scene"]):
            images = batch["target"]["image"][i][:limit]
            indices = batch["target"]["index"][i][:limit]
            for idx, image in zip(indices, images):
                save_image(np.asarray(image), out / f"{scene}_{int(idx):0>6}.png")
        print(f"Saved {batch['scene']}")


if __name__ == "__main__":
    main()
