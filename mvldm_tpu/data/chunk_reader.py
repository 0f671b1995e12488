"""Reader for pixelSplat-format ``.torch`` chunk files.

The RE10K dataset ships as ``root/<stage>/*.torch`` chunks, each a torch-saved
list of scenes: ``{"key": str, "cameras": (n, 18) float tensor, "images":
[uint8 tensors of JPEG bytes, ...]}`` (reference ``dataset_re10k.py:96``).

Torch (CPU) is used strictly host-side for deserialization; everything leaves
this module as numpy. JPEG decode goes through PIL.
"""

from __future__ import annotations

import io
from pathlib import Path
from typing import Any, Dict, List

import numpy as np
from PIL import Image


def load_chunk(path: Path) -> List[Dict[str, Any]]:
    """Load one chunk; returns a list of scene dicts with numpy cameras.

    Prefers the native C++ decoder (``native/chunk_decoder.cpp``: zip +
    torch-pickle parsed directly, no torch import); falls back to
    ``torch.load`` when the library is unavailable or refuses the file.
    Set ``MVLDM_NATIVE_CHUNKS=0`` to force the fallback."""
    from .native_chunk import load_chunk_native

    try:
        return load_chunk_native(path)
    except RuntimeError as e:
        if "decode failed" in str(e):
            # The library built and ran but rejected this file — say so
            # before silently re-parsing with torch.
            print(f"native chunk decoder: {e}; falling back to torch.load")

    import torch  # host-side IO fallback only

    chunk = torch.load(path, weights_only=True, map_location="cpu")
    out = []
    for example in chunk:
        out.append(
            {
                "key": example["key"],
                "cameras": np.asarray(example["cameras"], dtype=np.float32),
                "images": example["images"],  # list of uint8 byte tensors
            }
        )
    return out


def decode_jpeg_bytes(data) -> np.ndarray:
    """One encoded frame -> (h, w, 3) float32 in [0, 1] (reference
    ``convert_images:196-204``, minus the torch CHW layout)."""
    if hasattr(data, "numpy"):
        data = data.numpy()
    buf = io.BytesIO(np.asarray(data, dtype=np.uint8).tobytes())
    img = Image.open(buf)
    return np.asarray(img, dtype=np.float32) / 255.0


def convert_poses(poses: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(n, 18) rows -> (c2w extrinsics (n,4,4), normalized K (n,3,3))
    (reference ``convert_poses:173-194``): row = [fx fy cx cy _ _ w2c(3x4)]."""
    n = poses.shape[0]
    intrinsics = np.repeat(np.eye(3, dtype=np.float32)[None], n, axis=0)
    fx, fy, cx, cy = poses[:, 0], poses[:, 1], poses[:, 2], poses[:, 3]
    intrinsics[:, 0, 0] = fx
    intrinsics[:, 1, 1] = fy
    intrinsics[:, 0, 2] = cx
    intrinsics[:, 1, 2] = cy

    w2c = np.repeat(np.eye(4, dtype=np.float32)[None], n, axis=0)
    w2c[:, :3] = poses[:, 6:].reshape(n, 3, 4)
    return np.linalg.inv(w2c), intrinsics


def save_chunk(chunk: List[Dict[str, Any]], path: Path) -> None:
    """Write a chunk in the same format (used by tests / converters)."""
    import torch

    serializable = []
    for ex in chunk:
        serializable.append(
            {
                "key": ex["key"],
                "cameras": torch.from_numpy(np.asarray(ex["cameras"], np.float32)),
                "images": [
                    torch.from_numpy(np.frombuffer(img, dtype=np.uint8).copy())
                    if isinstance(img, (bytes, bytearray))
                    else img
                    for img in ex["images"]
                ],
            }
        )
    torch.save(serializable, path)
