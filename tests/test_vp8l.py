"""VP8L (lossless WebP) codec: round-trip exactness, wire-format edges,
honest refusal of features outside the implemented subset.

Reference parity: the per-row invariant (BASELINE.json:15) requires
decoded-pixel fidelity for every fmt lane; VP8L is lossless, so the bar is
bit-exact equality (PSNR = inf), unlike the jpeg lane's PSNR >= 40 dB.
"""

import struct

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from jsonschema_jl_spark.operators.vp8l import (
    _canonical_codes,
    _huffman_lengths,
    webp_decode,
    webp_encode,
)


def _rt(px: np.ndarray) -> None:
    back = webp_decode(webp_encode(px))
    assert np.array_equal(px, back)


def test_roundtrip_random():
    rng = np.random.default_rng(3)
    for h, w in [(1, 1), (1, 64), (64, 1), (17, 23), (64, 64)]:
        _rt(rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8))


def test_roundtrip_constant_and_binary():
    _rt(np.full((9, 9, 3), 0, dtype=np.uint8))
    _rt(np.full((9, 9, 3), 255, dtype=np.uint8))
    # exactly two distinct values per channel -> simple 2-symbol codes
    rng = np.random.default_rng(5)
    _rt((rng.integers(0, 2, size=(16, 16, 3), dtype=np.uint8)) * 200 + 17)


def test_roundtrip_skewed_histogram():
    # one dominant value + a rare tail drives long Huffman codes (the
    # length-limit repair path)
    rng = np.random.default_rng(9)
    px = np.full((64, 64, 3), 128, dtype=np.uint8)
    idx = rng.integers(0, 64, size=(300, 2))
    px[idx[:, 0], idx[:, 1]] = rng.integers(0, 256, size=(300, 3), dtype=np.uint8)
    _rt(px)


@settings(max_examples=25, deadline=None)
@given(
    h=st.integers(1, 20),
    w=st.integers(1, 20),
    seed=st.integers(0, 2**31 - 1),
    nvals=st.integers(1, 256),
)
def test_roundtrip_property(h, w, seed, nvals):
    rng = np.random.default_rng(seed)
    vals = rng.integers(0, 256, size=nvals, dtype=np.uint8)
    px = vals[rng.integers(0, nvals, size=(h, w, 3))]
    _rt(px)


def test_container_structure():
    px = np.zeros((2, 3, 3), dtype=np.uint8)
    data = webp_encode(px)
    assert data[:4] == b"RIFF" and data[8:12] == b"WEBP" and data[12:16] == b"VP8L"
    (riff_size,) = struct.unpack("<I", data[4:8])
    assert riff_size == len(data) - 8
    (chunk_size,) = struct.unpack("<I", data[16:20])
    assert chunk_size <= len(data) - 20  # even-padding byte sits outside
    # VP8L signature byte + 14-bit dims
    assert data[20] == 0x2F


def test_refuses_outside_subset():
    with pytest.raises(ValueError):
        webp_decode(b"not riff at all")
    lossy = b"RIFF" + struct.pack("<I", 16) + b"WEBP" + b"VP8 " + struct.pack("<I", 4) + b"\0\0\0\0"
    with pytest.raises(NotImplementedError):
        webp_decode(lossy)
    vp8x = b"RIFF" + struct.pack("<I", 16) + b"WEBP" + b"VP8X" + struct.pack("<I", 4) + b"\0\0\0\0"
    with pytest.raises(NotImplementedError):
        webp_decode(vp8x)
    # flip the first transform bit of a valid stream -> honest refusal
    good = bytearray(webp_encode(np.zeros((4, 4, 3), dtype=np.uint8)))
    # transform bit = bit 40 of the VP8L payload (8 sig + 28 dims + 1 alpha
    # + 3 version) = LSB of payload byte 5; payload starts at byte 20
    good[20 + 5] |= 1
    with pytest.raises(NotImplementedError):
        webp_decode(bytes(good))


def test_huffman_lengths_kraft_and_limit():
    rng = np.random.default_rng(1)
    for _ in range(20):
        freqs = np.zeros(280, dtype=np.int64)
        used = rng.integers(3, 280)
        # exponential-ish frequencies force deep unbalanced trees
        freqs[rng.choice(280, size=used, replace=False)] = np.maximum(
            1, (2.0 ** rng.uniform(0, 20, size=used)).astype(np.int64)
        )
        lengths = _huffman_lengths(freqs, 15)
        assert lengths.max() <= 15
        assert (lengths[freqs == 0] == 0).all() and (lengths[freqs > 0] > 0).all()
        kraft = sum(2.0 ** -l for l in lengths[freqs > 0])
        assert kraft <= 1.0 + 1e-12
        codes = _canonical_codes(lengths)
        # prefix-free: all (len, code) pairs distinct and within range
        seen = set()
        for s in np.flatnonzero(freqs):
            assert codes[s] < (1 << lengths[s])
            assert (lengths[s], codes[s]) not in seen
            seen.add((lengths[s], codes[s]))
