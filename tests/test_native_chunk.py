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

    def test_fuzz_parity_with_torch(self, tmp_path):
        """Seeded randomized round-trip: RE10K-shaped chunks with arbitrary
        extra metadata (floats, bytes, big/negative ints, long unicode,
        nested containers, tensors of every storage dtype, SHARED tensors
        exercising pickle memoization) across pickle protocols 2-5 must
        decode identically to torch.load. Extras are ignored by the
        extractor but still parsed by the pickle VM."""
        import torch

        from mvldm_tpu.data.native_chunk import load_chunk_native

        def extras(rng, torch):
            shared = torch.from_numpy(
                rng.standard_normal((3, 4)).astype(np.float32)
            )
            pool = [
                None,
                True,
                False,
                int(rng.integers(0, 255)),           # BININT1
                int(rng.integers(256, 65535)),       # BININT2
                int(rng.integers(1 << 20, 1 << 30)),  # BININT
                -int(rng.integers(1, 1 << 30)),
                1 << 40,                              # LONG1
                float(rng.standard_normal()),         # BINFLOAT
                b"raw\x00bytes" * int(rng.integers(1, 4)),
                "unicode-é中文",
                "L" * 300,                            # > SHORT_BINUNICODE
                [1, [2.5, None], "x"],
                {"nested": {"deep": [False, 7]}},
                (1, 2.0, "three"),
                torch.arange(5, dtype=torch.int64),
                torch.zeros(3, dtype=torch.bool),
                torch.full((2, 2), 1.5, dtype=torch.float64),
                torch.full((2,), 2.0, dtype=torch.float16),
                torch.full((2,), 3.0, dtype=torch.bfloat16),
                shared,
                [shared, shared],                     # memo / BINGET reuse
            ]
            k = int(rng.integers(0, 5))
            return {
                f"extra_{j}": pool[int(rng.integers(0, len(pool)))]
                for j in range(k)
            }

        for seed in range(10):
            rng = np.random.default_rng(seed)
            protocol = 2 + seed % 4
            chunk = []
            for i in range(int(rng.integers(1, 4))):
                n_cam = int(rng.integers(1, 6))
                scene = {
                    "key": f"scene-ü{seed}-{i}" + "k" * int(rng.integers(0, 300)),
                    "cameras": torch.from_numpy(
                        rng.standard_normal((n_cam, 18)).astype(np.float32)
                    ),
                    "images": [
                        torch.from_numpy(
                            rng.integers(
                                0, 256, size=int(rng.integers(0, 2000))
                            ).astype(np.uint8)
                        )
                        for _ in range(int(rng.integers(0, 5)))
                    ],
                }
                scene.update(extras(rng, torch))
                chunk.append(scene)
            path = tmp_path / f"fuzz_{seed}.torch"
            torch.save(chunk, path, pickle_protocol=protocol)

            ref = torch.load(path, weights_only=False)
            got = load_chunk_native(path)
            assert len(got) == len(ref)
            for g, r in zip(got, ref):
                assert g["key"] == r["key"]
                np.testing.assert_array_equal(
                    g["cameras"], r["cameras"].numpy()
                )
                assert len(g["images"]) == len(r["images"])
                for gi, ri in zip(g["images"], r["images"]):
                    np.testing.assert_array_equal(gi, ri.numpy())

    def test_unsupported_cameras_fall_back_loudly(self, tmp_path):
        """Envelope violations must RAISE (triggering the torch fallback in
        chunk_reader.load_chunk), never silently mis-decode: non-float32
        cameras and non-contiguous cameras (stride info is parsed and
        rejected — a transposed save would otherwise decode transposed)."""
        import torch

        from mvldm_tpu.data.native_chunk import load_chunk_native

        f64 = tmp_path / "f64.torch"
        torch.save(
            [{"key": "a", "cameras": torch.zeros(2, 18, dtype=torch.float64),
              "images": []}], f64,
        )
        with pytest.raises(RuntimeError, match="float32"):
            load_chunk_native(f64)

        noncontig = tmp_path / "t.torch"
        torch.save(
            [{"key": "a", "cameras": torch.randn(18, 2).t(), "images": []}],
            noncontig,
        )
        with pytest.raises(RuntimeError, match="contiguous"):
            load_chunk_native(noncontig)

    def test_env_kill_switch(self, chunk_path, monkeypatch):
        import importlib

        from mvldm_tpu.data import native_chunk

        monkeypatch.setenv("MVLDM_NATIVE_CHUNKS", "0")
        importlib.reload(native_chunk)
        with pytest.raises(RuntimeError, match="disabled"):
            native_chunk.load_chunk_native(chunk_path)
        monkeypatch.delenv("MVLDM_NATIVE_CHUNKS")
        importlib.reload(native_chunk)
