"""The pure-Python MJPEG-in-MP4 muxer (fallback for the reference's
moviepy/ffmpeg export, ``diffusion_wrapper.py:1073-1088``)."""

import io
import struct

import numpy as np
import pytest
from PIL import Image

from mvldm_tpu.utils.image_io import save_video
from mvldm_tpu.utils.mp4 import parse_boxes, write_mjpeg_mp4


def make_jpegs(n=5, w=64, h=48):
    rng = np.random.default_rng(0)
    jpegs = []
    for i in range(n):
        img = (rng.uniform(size=(h, w, 3)) * 255).astype(np.uint8)
        buf = io.BytesIO()
        Image.fromarray(img).save(buf, format="JPEG", quality=90)
        jpegs.append(buf.getvalue())
    return jpegs


class TestMjpegMp4:
    def test_structure_and_sample_table(self, tmp_path):
        jpegs = make_jpegs()
        path = tmp_path / "out.mp4"
        write_mjpeg_mp4(jpegs, path, fps=25, size=(64, 48))
        data = path.read_bytes()

        boxes = dict(parse_boxes(data))
        assert set(boxes) == {b"ftyp", b"mdat", b"moov"}
        assert boxes[b"ftyp"].startswith(b"isom")

        moov = dict(parse_boxes(boxes[b"moov"]))
        trak = dict(parse_boxes(moov[b"trak"]))
        mdia = dict(parse_boxes(trak[b"mdia"]))
        minf = dict(parse_boxes(mdia[b"minf"]))
        stbl = dict(parse_boxes(minf[b"stbl"]))

        # stsz records the exact JPEG sizes.
        stsz = stbl[b"stsz"]
        _, default, count = struct.unpack(">III", stsz[:12])
        assert default == 0 and count == len(jpegs)
        sizes = struct.unpack(f">{count}I", stsz[12:])
        assert list(sizes) == [len(j) for j in jpegs]

        # stco points at the first sample; every extracted sample is a
        # decodable JPEG identical to the input.
        stco = stbl[b"stco"]
        _, n_chunks, offset = struct.unpack(">III", stco[:12])
        assert n_chunks == 1
        pos = offset
        for j in jpegs:
            sample = data[pos : pos + len(j)]
            assert sample == j
            img = Image.open(io.BytesIO(sample))
            assert img.size == (64, 48)
            pos += len(sample)

        # Sample entry declares JPEG (OTI 0x6C) via esds.
        stsd = stbl[b"stsd"]
        assert b"mp4v" in stsd and b"esds" in stsd
        esds_pos = stsd.index(b"esds")
        assert b"\x6c" in stsd[esds_pos:esds_pos + 40]

    def test_timing(self, tmp_path):
        jpegs = make_jpegs(n=10)
        path = tmp_path / "t.mp4"
        write_mjpeg_mp4(jpegs, path, fps=10, size=(64, 48))
        boxes = dict(parse_boxes(path.read_bytes()))
        moov = dict(parse_boxes(boxes[b"moov"]))
        mvhd = moov[b"mvhd"]
        _, _, timescale, duration = struct.unpack(">IIII", mvhd[4:20])
        assert timescale == 1000
        assert duration == 10 * 100  # 10 frames at 10 fps

    def test_save_video_falls_back_to_builtin_muxer(self, tmp_path):
        frames = [np.random.default_rng(i).uniform(size=(48, 64, 3)) for i in range(4)]
        path = tmp_path / "video.mp4"
        assert save_video(frames, path, fps=25) is True
        assert path.exists() and path.stat().st_size > 0
        boxes = dict(parse_boxes(path.read_bytes()))
        assert b"moov" in boxes

    def test_empty_frames_rejected(self, tmp_path):
        with pytest.raises(ValueError):
            write_mjpeg_mp4([], tmp_path / "x.mp4", fps=25, size=(8, 8))
