"""Native C++ chunk decoder (native/chunk_decoder.cpp): parity with
torch.load on synthetic and pixelSplat-shaped chunks, tolerance of extra
fields, and the fallback chain in chunk_reader.load_chunk."""

import shutil
import subprocess

import numpy as np
import pytest

from synthetic_data import write_synthetic_dataset

HAVE_GXX = shutil.which("g++") is not None and shutil.which("make") is not None

pytestmark = pytest.mark.skipif(not HAVE_GXX, reason="no C++ toolchain")


@pytest.fixture(scope="module")
def chunk_path(tmp_path_factory):
    root = write_synthetic_dataset(
        tmp_path_factory.mktemp("chunks"), stages=("test",),
        scenes_per_stage=3, frames_per_scene=5,
    )
    return root / "test" / "000000.torch"


@pytest.fixture(scope="module")
def rich_chunk_path(tmp_path_factory):
    """A chunk with the extra fields real pixelSplat chunks carry
    (timestamps int64 tensor, url string)."""
    import torch

    path = tmp_path_factory.mktemp("rich") / "000000.torch"
    chunk = [
        {
            "key": f"scene{i:04d}",
            "cameras": torch.randn(4, 18),
            "images": [
                torch.from_numpy(
                    np.frombuffer(b"\xff\xd8JPEGDATA" + bytes([i, j]) * 7,
                                  dtype=np.uint8).copy()
                )
                for j in range(4)
            ],
            "timestamps": torch.arange(4, dtype=torch.int64) * 1000,
            "url": f"https://example.com/{i}",
        }
        for i in range(2)
    ]
    torch.save(chunk, path)
    return path


class TestNativeDecoder:
    def test_parity_with_torch(self, chunk_path):
        import torch

        from mvldm_tpu.data.native_chunk import load_chunk_native

        ref = torch.load(chunk_path, weights_only=True)
        got = load_chunk_native(chunk_path)
        assert len(got) == len(ref) == 3
        for g, r in zip(got, ref):
            assert g["key"] == r["key"]
            np.testing.assert_array_equal(g["cameras"], r["cameras"].numpy())
            assert len(g["images"]) == len(r["images"]) == 5
            for gi, ri in zip(g["images"], r["images"]):
                np.testing.assert_array_equal(gi, ri.numpy())

    def test_extra_fields_tolerated(self, rich_chunk_path):
        import torch

        from mvldm_tpu.data.native_chunk import load_chunk_native

        ref = torch.load(rich_chunk_path, weights_only=True)
        got = load_chunk_native(rich_chunk_path)
        assert [g["key"] for g in got] == [r["key"] for r in ref]
        for g, r in zip(got, ref):
            np.testing.assert_allclose(
                g["cameras"], r["cameras"].numpy(), rtol=1e-6
            )
            for gi, ri in zip(g["images"], r["images"]):
                np.testing.assert_array_equal(gi, ri.numpy())

    def test_jpeg_bytes_decode(self, chunk_path):
        from mvldm_tpu.data.chunk_reader import decode_jpeg_bytes
        from mvldm_tpu.data.native_chunk import load_chunk_native

        scene = load_chunk_native(chunk_path)[0]
        img = decode_jpeg_bytes(scene["images"][0])
        assert img.shape == (360, 640, 3)
        assert 0.0 <= img.min() and img.max() <= 1.0

    def test_corrupt_file_raises(self, tmp_path):
        from mvldm_tpu.data.native_chunk import load_chunk_native

        bad = tmp_path / "bad.torch"
        bad.write_bytes(b"not a zip at all" * 10)
        with pytest.raises(RuntimeError, match="decode failed"):
            load_chunk_native(bad)

    def test_load_chunk_uses_native_and_falls_back(self, chunk_path, tmp_path):
        from mvldm_tpu.data import chunk_reader

        scenes = chunk_reader.load_chunk(chunk_path)
        assert scenes[0]["key"] == "scenetest0000"
        # Native output carries numpy images (torch path carries tensors).
        assert isinstance(scenes[0]["images"][0], np.ndarray)

        # A file the native parser rejects falls back to torch.load loudly
        # (here torch also rejects it, surfacing its own error).
        bad = tmp_path / "bad.torch"
        bad.write_bytes(b"garbage")
        with pytest.raises(Exception):
            chunk_reader.load_chunk(bad)

    def test_env_kill_switch(self, chunk_path, monkeypatch):
        import importlib

        from mvldm_tpu.data import native_chunk

        monkeypatch.setenv("MVLDM_NATIVE_CHUNKS", "0")
        importlib.reload(native_chunk)
        with pytest.raises(RuntimeError, match="disabled"):
            native_chunk.load_chunk_native(chunk_path)
        monkeypatch.delenv("MVLDM_NATIVE_CHUNKS")
        importlib.reload(native_chunk)
