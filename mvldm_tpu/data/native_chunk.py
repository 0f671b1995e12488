"""ctypes binding for the native C++ ``.torch``-chunk decoder
(``native/chunk_decoder.cpp``).

The library builds on first use (``make -C native``) and is cached; set
``MVLDM_NATIVE_CHUNKS=0`` to force the torch fallback in
``chunk_reader.load_chunk``. Everything returned is numpy — the bytes are
copied out of the handle before it is freed, so no lifetime coupling leaks
into the pipeline.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path
from typing import Any, Dict, List, Optional

import numpy as np

NATIVE_DIR = Path(__file__).parent.parent.parent / "native"
LIB_PATH = NATIVE_DIR / "build" / "libmvldm_chunk.so"

_lib: Optional[ctypes.CDLL] = None
_lib_error: Optional[str] = None


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-C", str(NATIVE_DIR)],
            check=True,
            capture_output=True,
            text=True,
        )
        return LIB_PATH.exists()
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        global _lib_error
        detail = getattr(e, "stderr", "") or str(e)
        _lib_error = f"native build failed: {detail[-500:]}"
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """The loaded library, building it on first use; None if unavailable."""
    global _lib, _lib_error
    if _lib is not None:
        return _lib
    if _lib_error is not None:
        return None
    if os.environ.get("MVLDM_NATIVE_CHUNKS", "1") == "0":
        _lib_error = "disabled via MVLDM_NATIVE_CHUNKS=0"
        return None
    if not LIB_PATH.exists() and not _build():
        return None
    try:
        lib = ctypes.CDLL(str(LIB_PATH))
    except OSError as e:
        _lib_error = f"dlopen failed: {e}"
        return None
    lib.mvldm_chunk_open.restype = ctypes.c_void_p
    lib.mvldm_chunk_open.argtypes = [ctypes.c_char_p, ctypes.c_char_p,
                                     ctypes.c_int]
    lib.mvldm_chunk_num_scenes.restype = ctypes.c_int
    lib.mvldm_chunk_num_scenes.argtypes = [ctypes.c_void_p]
    lib.mvldm_scene_key.restype = ctypes.c_char_p
    lib.mvldm_scene_key.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.mvldm_scene_cameras.restype = ctypes.POINTER(ctypes.c_float)
    lib.mvldm_scene_cameras.argtypes = [
        ctypes.c_void_p, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    lib.mvldm_scene_num_images.restype = ctypes.c_int
    lib.mvldm_scene_num_images.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.mvldm_scene_image.restype = ctypes.POINTER(ctypes.c_ubyte)
    lib.mvldm_scene_image.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_long),
    ]
    lib.mvldm_chunk_free.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def load_chunk_native(path: Path) -> List[Dict[str, Any]]:
    """Parse a chunk with the native decoder. Raises RuntimeError when the
    library is unavailable or the file cannot be parsed."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError(f"native chunk decoder unavailable ({_lib_error})")
    err = ctypes.create_string_buffer(512)
    handle = lib.mvldm_chunk_open(str(path).encode(), err, len(err))
    if not handle:
        raise RuntimeError(
            f"native chunk decode failed for {path}: "
            f"{err.value.decode(errors='replace')}"
        )
    try:
        out = []
        for i in range(lib.mvldm_chunk_num_scenes(handle)):
            rows = ctypes.c_int()
            cols = ctypes.c_int()
            cam_ptr = lib.mvldm_scene_cameras(
                handle, i, ctypes.byref(rows), ctypes.byref(cols)
            )
            # Zero-size guards: ctypeslib.as_array rejects the NULL pointer
            # an empty std::vector's data() may legally return.
            cameras = (
                np.ctypeslib.as_array(
                    cam_ptr, shape=(rows.value, cols.value)
                ).copy()
                if rows.value * cols.value
                else np.zeros((rows.value, cols.value), np.float32)
            )
            images = []
            for j in range(lib.mvldm_scene_num_images(handle, i)):
                nbytes = ctypes.c_long()
                ptr = lib.mvldm_scene_image(handle, i, j, ctypes.byref(nbytes))
                images.append(
                    np.ctypeslib.as_array(ptr, shape=(nbytes.value,)).copy()
                    if nbytes.value
                    else np.zeros((0,), np.uint8)
                )
            out.append(
                {
                    "key": lib.mvldm_scene_key(handle, i).decode(),
                    "cameras": cameras,
                    "images": images,
                }
            )
        return out
    finally:
        lib.mvldm_chunk_free(handle)
