"""Directory-vs-directory FID/KID (reference ``src/scripts/compute_fid.py``):

    python -m mvldm_tpu.scripts.compute_fid --dir-a outputs/run1/video \\
        --dir-b outputs/gt --output outputs/fid.json
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

from ..evaluation.fid import fid_between_dirs


def main(argv=None) -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--dir-a", type=Path, required=True)
    parser.add_argument("--dir-b", type=Path, required=True)
    parser.add_argument("--output", type=Path, default=Path("outputs/fid.json"))
    parser.add_argument("--lpips-weights", type=Path, default=None)
    args = parser.parse_args(argv)

    from ..evaluation.fid import vgg_feature_extractor

    extractor = vgg_feature_extractor(args.lpips_weights)
    results = fid_between_dirs(args.dir_a, args.dir_b, extractor)
    args.output.parent.mkdir(parents=True, exist_ok=True)
    args.output.write_text(json.dumps(results, indent=2))
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
