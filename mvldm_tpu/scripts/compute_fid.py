"""FID/KID computation (reference ``src/scripts/compute_fid.py``).

Hydra-style surface (per-method directories vs the flat GT image directory,
reference ``compute_fid.py:43-50``):

    python -m mvldm_tpu.scripts.compute_fid +evaluation=re10k_video \\
        'evaluation.methods=[{name: ours, key: ours, path: outputs/test}]' \\
        fid_gt_dir=gt_images

Argparse sugar (directory vs directory):

    python -m mvldm_tpu.scripts.compute_fid --dir-a outputs/run1/video \\
        --dir-b outputs/gt --output outputs/fid.json
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

from ..evaluation.fid import fid_between_dirs, vgg_feature_extractor


def run_hydra(overrides) -> None:
    from .compute_metrics import load_compute_metrics_cfg

    cfg = load_compute_metrics_cfg(overrides)
    if not cfg.evaluation.methods:
        raise SystemExit(
            "evaluation.methods is empty — pass e.g. "
            "'evaluation.methods=[{name: ours, key: ours, path: outputs/test}]'"
        )
    extractor = vgg_feature_extractor(cfg.lpips_weights)
    fids = {}
    for method in cfg.evaluation.methods:
        r = fid_between_dirs(method.path, cfg.fid_gt_dir, extractor)
        # Keyed like the reference's cleanfid output (fid/kidclean_<key>) but
        # labeled by the actual extractor (VGG trunk, not Inception).
        fids[f"fid_vgg_{method.key}"] = r["fid"]
        fids[f"kid_vgg_{method.key}"] = r["kid"]
    cfg.output_fid_path.parent.mkdir(parents=True, exist_ok=True)
    cfg.output_fid_path.write_text(json.dumps(fids, indent=2))
    print(json.dumps(fids, indent=2))


def run_argparse(argv) -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--dir-a", type=Path, required=True)
    parser.add_argument("--dir-b", type=Path, required=True)
    parser.add_argument("--output", type=Path, default=Path("outputs/fid.json"))
    parser.add_argument("--lpips-weights", type=Path, default=None)
    args = parser.parse_args(argv)

    extractor = vgg_feature_extractor(args.lpips_weights)
    results = fid_between_dirs(args.dir_a, args.dir_b, extractor)
    args.output.parent.mkdir(parents=True, exist_ok=True)
    args.output.write_text(json.dumps(results, indent=2))
    print(json.dumps(results, indent=2))


def main(argv=None) -> None:
    argv = list(argv if argv is not None else sys.argv[1:])
    if any(a.startswith("--") for a in argv):
        run_argparse(argv)
    else:
        run_hydra(argv)


if __name__ == "__main__":
    main()
