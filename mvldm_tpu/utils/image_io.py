"""Image IO (reference ``src/misc/image_io.py``): float HWC <-> PNG, plus
GIF/MP4 export for sampled videos (reference ``on_test_end:1069-1088``;
moviepy is not in this image, so MP4 goes through imageio-ffmpeg when
available and is skipped otherwise)."""

from __future__ import annotations

from pathlib import Path
from typing import List, Sequence, Union

import numpy as np
from PIL import Image

FloatImage = Union[np.ndarray]


def prep_image(image: np.ndarray) -> np.ndarray:
    """(h, w, 3|4|1) float [0,1] (or already-quantized uint8) -> uint8 HWC."""
    image = np.asarray(image)
    if image.ndim == 2:
        image = image[..., None]
    if image.shape[-1] == 1:
        image = np.repeat(image, 3, axis=-1)
    if image.dtype == np.uint8:
        return image
    return (np.clip(image, 0.0, 1.0) * 255.0).astype(np.uint8)


def save_image(image: np.ndarray, path: Union[Path, str]) -> None:
    path = Path(path)
    path.parent.mkdir(exist_ok=True, parents=True)
    Image.fromarray(prep_image(image)).save(path)


def load_image(path: Union[Path, str]) -> np.ndarray:
    return (
        np.asarray(Image.open(path).convert("RGB"), dtype=np.float32) / 255.0
    )


def save_gif(frames: Sequence[np.ndarray], path: Union[Path, str],
             duration: int = 5) -> None:
    """PNG-sequence -> looping GIF (reference ``on_test_end:1076-1083``)."""
    path = Path(path)
    path.parent.mkdir(exist_ok=True, parents=True)
    pil = [Image.fromarray(prep_image(f)) for f in frames]
    pil[0].save(
        path, save_all=True, append_images=pil[1:], duration=duration, loop=0
    )


def save_video(frames: Sequence[np.ndarray], path: Union[Path, str],
               fps: int = 25) -> bool:
    """MP4 export (reference ``on_test_end:1073-1088``, moviepy 25/10 fps).

    Uses imageio/ffmpeg when an encoder exists; otherwise falls back to the
    built-in pure-Python MJPEG-in-MP4 muxer (``utils/mp4.py``) so video
    export always works. Returns True on success."""
    path = Path(path)
    try:
        import imageio.v2 as imageio

        path.parent.mkdir(exist_ok=True, parents=True)
        writer = imageio.get_writer(str(path), fps=fps)
        for f in frames:
            writer.append_data(prep_image(f))
        writer.close()
        return True
    except Exception:
        pass  # no ffmpeg backend in this image — use the built-in muxer
    try:
        import io

        from .mp4 import write_mjpeg_mp4

        jpegs = []
        size = None
        for f in frames:
            arr = prep_image(f)
            size = (arr.shape[1], arr.shape[0])
            buf = io.BytesIO()
            Image.fromarray(arr).save(buf, format="JPEG", quality=92)
            jpegs.append(buf.getvalue())
        write_mjpeg_mp4(jpegs, path, fps=fps, size=size)
        return True
    except Exception as e:
        print(f"Skipping mp4 export ({type(e).__name__}: {e})")
        return False
