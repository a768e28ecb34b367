"""Uncompressed-AVI codec (operators/avi.py): byte-exact round-trip,
header parsing, honest stubs for compressed streams, and the real
demux path inside with_sampled_frames."""
from __future__ import annotations

import numpy as np
import pytest

from jsonschema_jl_spark.operators.avi import avi_demux, avi_encode
from jsonschema_jl_spark.operators.multimodal import (
    demux_video,
    png_decode,
    with_sampled_frames,
)


def _frames(n=7, h=9, w=5, seed=3):
    rng = np.random.default_rng(seed)
    return [rng.integers(0, 256, (h, w, 3), dtype=np.uint8) for _ in range(n)]


def test_avi_roundtrip_exact():
    frames = _frames()
    data = avi_encode(frames, fps=12)
    out, fps = avi_demux(data)
    assert fps == 12
    assert len(out) == len(frames)
    for a, b in zip(frames, out):
        np.testing.assert_array_equal(a, b)


def test_avi_odd_width_row_padding():
    # w=5 -> 15-byte rows padded to 16: padding must not leak into pixels
    frames = _frames(n=2, h=4, w=5)
    out, _ = avi_demux(avi_encode(frames))
    np.testing.assert_array_equal(out[0], frames[0])
    np.testing.assert_array_equal(out[1], frames[1])


def test_avi_rejects_garbage_and_compressed():
    with pytest.raises(ValueError):
        avi_demux(b"RIFFxxxxWAVE")
    # flip biCompression in a valid stream -> NotImplementedError (stub contract)
    data = bytearray(avi_encode(_frames(n=1)))
    strf = data.index(b"strf")
    data[strf + 8 + 16 : strf + 8 + 20] = (1).to_bytes(4, "little")  # BI_RLE8
    with pytest.raises(NotImplementedError):
        avi_demux(bytes(data))
    with pytest.raises(NotImplementedError):
        demux_video(b"\x00" * 32, "mp4")


def test_sampled_frames_real_avi(spark):
    frames = _frames(n=10, h=8, w=8)
    data = avi_encode(frames, fps=30)
    df = spark.createDataFrame(
        [("v1", bytearray(data), "avi")], "image_id string, bytes binary, fmt string"
    )
    r = with_sampled_frames(df, every_n=4).select("sampled.*").collect()[0]
    assert r.frame_idx == [0, 4, 8]
    for idx, png in zip(r.frame_idx, r.frames):
        np.testing.assert_array_equal(png_decode(bytes(png)), frames[idx])
