"""Synthetic RE10K-format data for tests and benchmarks: tiny scenes with
plausible forward-moving cameras, written as pixelSplat-style ``.torch``
chunks + ``index.json`` so the full data pipeline is exercised end-to-end."""

from __future__ import annotations

import io
import json
from pathlib import Path

import numpy as np
from PIL import Image


def make_frame(i: int, h: int = 360, w: int = 640) -> bytes:
    """A deterministic colorful frame, JPEG-encoded."""
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    r = ((xx + 5 * i) % 256).astype(np.uint8)
    g = ((yy + 3 * i) % 256).astype(np.uint8)
    b = ((xx // 2 + yy // 2 + 7 * i) % 256).astype(np.uint8)
    img = np.stack([r, g, b], axis=-1)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="JPEG", quality=90)
    return buf.getvalue()


def make_cameras(n: int) -> np.ndarray:
    """(n, 18) rows: fx fy cx cy 0 0 + w2c(3x4). Camera slides along +x and
    slightly rotates — keeps baselines finite and FOV sane."""
    rows = np.zeros((n, 18), dtype=np.float32)
    for i in range(n):
        fx, fy, cx, cy = 0.9, 1.6, 0.5, 0.5  # normalized, fov < 100 deg
        theta = 0.02 * i
        c, s = np.cos(theta), np.sin(theta)
        rot = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], dtype=np.float32)
        t_c2w = np.array([0.08 * i, 0.01 * i, 0.02 * i], dtype=np.float32)
        # w2c = [R^T, -R^T t]
        w2c = np.concatenate([rot.T, (-rot.T @ t_c2w)[:, None]], axis=1)
        rows[i, :4] = [fx, fy, cx, cy]
        rows[i, 6:] = w2c.reshape(-1)
    return rows


def write_synthetic_dataset(
    root: Path,
    stages=("train", "test"),
    scenes_per_stage: int = 2,
    frames_per_scene: int = 30,
) -> Path:
    from mvldm_tpu.data.chunk_reader import save_chunk

    root = Path(root)
    for stage in stages:
        stage_dir = root / stage
        stage_dir.mkdir(parents=True, exist_ok=True)
        index = {}
        chunk = []
        for s in range(scenes_per_stage):
            key = f"scene{stage}{s:04d}"
            chunk.append(
                {
                    "key": key,
                    "cameras": make_cameras(frames_per_scene),
                    "images": [
                        make_frame(i + 100 * s) for i in range(frames_per_scene)
                    ],
                }
            )
            index[key] = "000000.torch"
        save_chunk(chunk, stage_dir / "000000.torch")
        with open(stage_dir / "index.json", "w") as f:
            json.dump(index, f)
    return root
