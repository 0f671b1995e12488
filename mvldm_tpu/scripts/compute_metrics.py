"""Metric computation entry point (reference
``src/scripts/compute_metrics.py:34-52``):

    python -m mvldm_tpu.scripts.compute_metrics \\
        --gt-dir outputs/gt --method ours=outputs/run1/video \\
        --output outputs/metrics.json
"""

from __future__ import annotations

import argparse
from pathlib import Path

from ..evaluation.metric_computer import (
    EvaluationCfg,
    MethodCfg,
    MetricComputer,
    save_metrics_json,
)


def main(argv=None) -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--gt-dir", type=Path, required=True)
    parser.add_argument(
        "--method",
        action="append",
        required=True,
        help="key=path pairs; repeatable",
    )
    parser.add_argument("--output", type=Path, default=Path("outputs/metrics.json"))
    parser.add_argument("--lpips-weights", type=Path, default=None)
    args = parser.parse_args(argv)

    methods = []
    for spec in args.method:
        key, _, path = spec.partition("=")
        methods.append(MethodCfg(name=key, key=key, path=Path(path)))

    computer = MetricComputer(
        EvaluationCfg(methods=methods), args.gt_dir, args.lpips_weights
    )
    results = computer.compute()
    save_metrics_json(results, args.output)
    print(f"\nResults -> {args.output}")
    for key, metrics in results.items():
        print(f"  {key}: " + " ".join(f"{k}={v:.4f}" for k, v in metrics.items()))


if __name__ == "__main__":
    main()
