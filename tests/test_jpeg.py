"""Pure-numpy baseline JPEG codec (operators/jpeg.py): structure, round-trip
PSNR (the BASELINE.json:15 lossy invariant), decoder robustness."""

import numpy as np
import pytest

from jsonschema_jl_spark.operators.jpeg import (
    _AC_CHR_BITS,
    _AC_CHR_VALS,
    _AC_LUM_BITS,
    _AC_LUM_VALS,
    _DC_CHR_BITS,
    _DC_CHR_VALS,
    _DC_LUM_BITS,
    _DC_LUM_VALS,
    _UNZIGZAG,
    _ZIGZAG,
    jpeg_decode,
    jpeg_encode,
)
from jsonschema_jl_spark.operators.multimodal import decode_image, psnr


def _gradient(h, w, seed=0):
    gx = np.arange(w, dtype=np.int64)[None, :]
    gy = np.arange(h, dtype=np.int64)[:, None]
    px = np.empty((h, w, 3), dtype=np.uint8)
    px[..., 0] = (gx + seed) % 256
    px[..., 1] = gy % 256
    px[..., 2] = (gx + gy) % 256
    return px


def test_huffman_table_consistency():
    # Annex-K tables: value count must equal the sum of the per-length counts
    assert sum(_DC_LUM_BITS) == len(_DC_LUM_VALS) == 12
    assert sum(_DC_CHR_BITS) == len(_DC_CHR_VALS) == 12
    assert sum(_AC_LUM_BITS) == len(_AC_LUM_VALS) == 162
    assert sum(_AC_CHR_BITS) == len(_AC_CHR_VALS) == 162


def test_zigzag_involution():
    assert np.array_equal(_ZIGZAG[_UNZIGZAG], np.arange(64))
    # spot-check the canonical start of the zigzag scan
    assert _ZIGZAG[:6].tolist() == [0, 1, 8, 16, 9, 2]


def test_marker_structure():
    data = jpeg_encode(_gradient(16, 16))
    assert data[:2] == b"\xff\xd8" and data[-2:] == b"\xff\xd9"
    assert data[2:4] == b"\xff\xe0" and data[6:11] == b"JFIF\x00"
    assert b"\xff\xc0" in data and b"\xff\xc4" in data and b"\xff\xda" in data


@pytest.mark.parametrize("h,w", [(8, 8), (16, 24), (33, 47), (7, 5), (64, 64)])
def test_roundtrip_dims_and_psnr(h, w):
    px = _gradient(h, w, seed=h * w)
    out = jpeg_decode(jpeg_encode(px, quality=95))
    assert out.shape == (h, w, 3)
    assert psnr(px, out) >= 35.0


def test_lossy_invariant_noisy_content():
    """quality 98 on gradient+noise content (the datagen distribution) must
    clear the 40 dB per-row invariant (BASELINE.json:15)."""
    rng = np.random.default_rng(11)
    px = ((_gradient(48, 37).astype(np.int64) + rng.integers(0, 64, (48, 37, 3))) % 256).astype(
        np.uint8
    )
    out = jpeg_decode(jpeg_encode(px, quality=98))
    assert psnr(px, out) >= 40.0


def test_grayscale_roundtrip():
    g = (np.outer(np.arange(24), np.arange(31)) % 256).astype(np.uint8)
    out = jpeg_decode(jpeg_encode(g, quality=95))
    assert out.shape == (24, 31, 3)
    # all three channels replicate Y
    assert np.array_equal(out[..., 0], out[..., 1])
    assert psnr(np.repeat(g[:, :, None], 3, axis=2), out) >= 35.0


def test_decode_image_dispatches_jpeg():
    px = _gradient(20, 20)
    out = decode_image(jpeg_encode(px, quality=95), "jpeg")
    assert out.shape == (20, 20, 3)


def test_determinism():
    px = _gradient(21, 34, seed=5)
    assert jpeg_encode(px, quality=92) == jpeg_encode(px, quality=92)


def test_truncated_stream_rejected():
    data = jpeg_encode(_gradient(16, 16))
    with pytest.raises(ValueError):
        jpeg_decode(data[:20])
    with pytest.raises(ValueError):
        jpeg_decode(b"not a jpeg at all")


def test_progressive_rejected():
    # swap SOF0 marker for SOF2 (progressive): must refuse, not mis-decode
    data = bytearray(jpeg_encode(_gradient(16, 16)))
    idx = bytes(data).find(b"\xff\xc0")
    data[idx + 1] = 0xC2
    with pytest.raises(NotImplementedError):
        jpeg_decode(bytes(data))


def test_byte_stuffing_roundtrip():
    """Content tuned to produce 0xFF bytes in the entropy stream — the
    stuffing path must round-trip (checked over many seeds)."""
    rng = np.random.default_rng(99)
    for seed in range(8):
        px = rng.integers(0, 256, (17, 19, 3), dtype=np.uint8)
        data = jpeg_encode(px, quality=90)
        out = jpeg_decode(data)
        assert out.shape == (17, 19, 3)
        assert psnr(px, out) > 20.0  # pure noise at q90: sanity bound only
