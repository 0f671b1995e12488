"""Metric computation over generated/GT image trees.

Re-creates the reference's post-hoc metric pipeline (``metric_computer.py``
+ ``gt_saver.py`` + ``compute_metrics.py``; SURVEY.md §3.5): generated PNGs
per method/scene/frame are compared against ground truth on disk, per-scene
metrics accumulate into running means, results dump to JSON. PSNR/SSIM run
in JAX; LPIPS runs when converted weights exist (see ``metrics.py``);
FID/DISTS/KID are reported when their torch backends are importable (they
are not in this image) — the pipeline degrades gracefully like the
reference's try/except-per-scene loop (``metric_computer.py:43-55``)."""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from pathlib import Path
from typing import Dict, List, Optional

import jax.numpy as jnp
import numpy as np

from ..utils.image_io import load_image, save_image
from .metrics import compute_psnr, compute_ssim, get_dists, get_lpips


@dataclass
class MethodCfg:
    """Reference ``evaluation_cfg.py``."""

    name: str
    key: str
    path: Path


@dataclass
class SceneCfg:
    scene: str
    target_index: List[int]


@dataclass
class EvaluationCfg:
    methods: List[MethodCfg]
    side_by_side_path: Optional[Path] = None
    animate_side_by_side: bool = False
    highlighted: List[str] = field(default_factory=list)


class MetricComputer:
    """Walks ``<gt_dir>/<scene>/*.png`` against each method's
    ``<method_path>/<scene>/color/*.png``."""

    def __init__(self, cfg: EvaluationCfg, gt_dir: Path,
                 lpips_weights: Optional[Path] = None):
        self.cfg = cfg
        self.gt_dir = Path(gt_dir)
        self.lpips = get_lpips(lpips_weights)
        self.dists = get_dists(lpips_weights)

    def _scene_frames(self, scene_dir: Path) -> Dict[int, Path]:
        return {
            int(p.stem): p for p in sorted(scene_dir.glob("*.png"))
        }

    def compute(self) -> Dict[str, Dict[str, float]]:
        sums: Dict[str, Dict[str, float]] = {
            m.key: {} for m in self.cfg.methods
        }
        counts: Dict[str, int] = {m.key: 0 for m in self.cfg.methods}

        scenes = sorted(p.name for p in self.gt_dir.iterdir() if p.is_dir())
        for scene in scenes:
            gt_frames = self._scene_frames(self.gt_dir / scene)
            if not gt_frames:
                continue
            for method in self.cfg.methods:
                scene_dir = Path(method.path) / scene / "color"
                if not scene_dir.is_dir():
                    continue
                pred_frames = self._scene_frames(scene_dir)
                common = sorted(set(gt_frames) & set(pred_frames))
                if not common:
                    continue
                try:
                    gt = np.stack([load_image(gt_frames[i]) for i in common])
                    pred = np.stack([load_image(pred_frames[i]) for i in common])
                except Exception as e:
                    print(f"Skipping {scene}/{method.key}: {e}")
                    continue
                metrics = {
                    "psnr": float(jnp.mean(compute_psnr(gt, pred))),
                    "ssim": float(jnp.mean(compute_ssim(gt, pred))),
                }
                if self.lpips is not None:
                    metrics["lpips"] = float(jnp.mean(self.lpips(gt, pred)))
                if self.dists is not None:
                    metrics["dists"] = float(jnp.mean(self.dists(gt, pred)))
                acc = sums[method.key]
                for k, v in metrics.items():
                    acc[k] = acc.get(k, 0.0) + v
                counts[method.key] += 1
                print(
                    f"{scene} {method.key}: "
                    + " ".join(f"{k}={v:.4f}" for k, v in metrics.items())
                )

        results = {}
        for method in self.cfg.methods:
            n = max(counts[method.key], 1)
            results[method.key] = {
                k: v / n for k, v in sums[method.key].items()
            }
            results[method.key]["num_scenes"] = counts[method.key]
        return results


class GTSaver:
    """Dump ground-truth target frames as PNGs (reference
    ``gt_saver.py:10-79``; first ``limit_frames`` targets per scene)."""

    def __init__(self, output_dir: Path, limit_frames: int = 80):
        self.output_dir = Path(output_dir)
        self.limit_frames = limit_frames

    def save_batch(self, batch_np: dict) -> None:
        b = len(batch_np["scene"])
        for i in range(b):
            scene = batch_np["scene"][i]
            images = batch_np["target"]["image"][i][: self.limit_frames]
            indices = batch_np["target"]["index"][i][: self.limit_frames]
            for idx, image in zip(indices, images):
                save_image(
                    np.asarray(image), self.output_dir / scene / f"{int(idx):0>6}.png"
                )


def save_metrics_json(results: Dict, path: Path) -> None:
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_text(json.dumps(results, indent=2))
