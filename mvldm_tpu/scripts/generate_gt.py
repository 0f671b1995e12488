"""Ground-truth dumping entry point (reference
``src/scripts/generate_gt.py``): writes target frames as PNG trees for the
metric pipeline.

    python -m mvldm_tpu.scripts.generate_gt +experiment=baseline mode=test \\
        dataset.root=<path> output_dir=outputs/gt
"""

from __future__ import annotations

import sys
from pathlib import Path

from ..config import compose, load_typed_root_config, set_cfg
from ..data.view_samplers import StepTracker
from ..evaluation.metric_computer import GTSaver
from .main import build_data_module


def main(argv=None) -> None:
    overrides = list(argv if argv is not None else sys.argv[1:])
    if not any(o.startswith("mode=") for o in overrides):
        overrides.append("mode=test")
    cfg_dict = compose(overrides)
    set_cfg(cfg_dict)
    cfg = load_typed_root_config(cfg_dict)

    dm = build_data_module(cfg, StepTracker())
    saver = GTSaver(
        Path(cfg.output_dir), limit_frames=cfg.test.limit_frames or 80
    )
    for n, batch in enumerate(dm.test_dataloader()):
        if cfg.trainer.limit_test_batches and n >= cfg.trainer.limit_test_batches:
            break
        saver.save_batch(batch)
        print(f"Saved GT for {batch['scene']}")


if __name__ == "__main__":
    main()
