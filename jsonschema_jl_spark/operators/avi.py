"""Pure-numpy uncompressed AVI (RIFF) container codec.

Real, from-scratch video plumbing for the multimodal lane: an encoder and
demuxer for RIFF 'AVI ' files carrying uncompressed 24-bit DIB ('DIB '/
BI_RGB) frames — the same RIFF chunk grammar the WAV codec in
`multimodal.py` already speaks.  No video libraries exist in this
container, so compressed codecs (h264/vp9/...) stay honestly stubbed in
`decode_image`-style fashion; THIS path is fully real: bytes in, pixel
arrays out, byte-exact round-trip.

Layout written/read (the minimal standard-conformant subset):

    RIFF('AVI '
      LIST('hdrl'
        avih(56-byte MainAVIHeader)
        LIST('strl' strh(56-byte 'vids'/'DIB ') strf(40-byte BITMAPINFOHEADER)))
      LIST('movi' '00db'(DIB frame)*)
      idx1(16 bytes per frame))

DIB frames are bottom-up BGR rows, each row zero-padded to 4 bytes — the
classic Windows bitmap wire format.
"""
from __future__ import annotations

import struct

import numpy as np

_AVIF_HASINDEX = 0x10


def _chunk(tag: bytes, payload: bytes) -> bytes:
    pad = b"\x00" if len(payload) % 2 else b""
    return tag + struct.pack("<I", len(payload)) + payload + pad


def _list(tag: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", tag + payload)


def _dib_rows(frame: np.ndarray) -> bytes:
    """RGB top-down (h, w, 3) uint8 -> bottom-up BGR rows padded to 4 bytes."""
    h, w, _ = frame.shape
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = frame[::-1, :, ::-1].reshape(h, w * 3)
    return rows.tobytes()


def avi_encode(frames: list[np.ndarray], fps: int = 30) -> bytes:
    """Encode same-shaped (h, w, 3) uint8 RGB frames as an uncompressed AVI."""
    if not frames:
        raise ValueError("avi_encode needs at least one frame")
    h, w, c = frames[0].shape
    if c != 3:
        raise ValueError("avi_encode expects RGB frames")
    stride = (w * 3 + 3) & ~3
    frame_size = stride * h

    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        1_000_000 // fps,        # dwMicroSecPerFrame
        frame_size * fps,        # dwMaxBytesPerSec
        0,                       # dwPaddingGranularity
        _AVIF_HASINDEX,          # dwFlags
        len(frames),             # dwTotalFrames
        0, 1,                    # dwInitialFrames, dwStreams
        frame_size,              # dwSuggestedBufferSize
        w, h, 0, 0, 0, 0,        # dwWidth, dwHeight, reserved[4]
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIIi4H",
        b"vids", b"DIB ",
        0, 0, 0, 0,              # flags, priority, language, initialFrames
        1, fps,                  # dwScale, dwRate  (fps = rate/scale)
        0, len(frames),          # dwStart, dwLength (frames)
        frame_size, 0xFFFFFFFF & -1, 0,  # bufSize, quality(-1), sampleSize
        0, 0, w, h,              # rcFrame
    )
    strf = struct.pack(
        "<IiiHHIIiiII",
        40, w, h, 1, 24,         # biSize, biWidth, biHeight(+ = bottom-up), planes, bpp
        0,                       # biCompression = BI_RGB
        frame_size, 0, 0, 0, 0,
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih) + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )

    movi_payload = b"".join(_chunk(b"00db", _dib_rows(f)) for f in frames)
    movi = _list(b"movi", movi_payload)

    # idx1: one entry per frame, offsets relative to the start of 'movi' data
    idx_entries, off = [], 4  # first chunk sits right after the 'movi' fourcc
    for f in frames:
        idx_entries.append(struct.pack("<4sIII", b"00db", 0x10, off, frame_size))
        off += 8 + frame_size + (frame_size % 2)
    idx1 = _chunk(b"idx1", b"".join(idx_entries))

    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _walk(data: bytes, start: int, end: int):
    """Yield (fourcc, payload_start, payload_len) over a RIFF chunk run."""
    pos = start
    while pos + 8 <= end:
        tag = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        yield tag, pos + 8, size
        pos += 8 + size + (size % 2)


def avi_demux(data: bytes) -> tuple[list[np.ndarray], int]:
    """Demux an uncompressed AVI into (RGB top-down frames, fps).

    Raises NotImplementedError on compressed streams (any biCompression
    other than BI_RGB, or a non-'vids' first stream) — the honest-stub
    contract shared with `decode_image`."""
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI stream")
    w = h = bpp = None
    fps = 30
    frames: list[np.ndarray] = []
    for tag, p, size in _walk(data, 12, len(data)):
        if tag != b"LIST":
            continue
        kind = data[p : p + 4]
        if kind == b"hdrl":
            for t2, p2, s2 in _walk(data, p + 4, p + size):
                if t2 == b"LIST" and data[p2 : p2 + 4] == b"strl":
                    for t3, p3, s3 in _walk(data, p2 + 4, p2 + s2):
                        if t3 == b"strh":
                            fcc_type, handler = struct.unpack_from("<4s4s", data, p3)
                            if fcc_type != b"vids":
                                raise NotImplementedError(
                                    f"first AVI stream is {fcc_type!r}, not video"
                                )
                            scale, rate = struct.unpack_from("<II", data, p3 + 20)
                            if scale:
                                fps = max(1, round(rate / scale))
                        elif t3 == b"strf":
                            _, w, h, _, bpp, comp = struct.unpack_from("<IiiHHI", data, p3)
                            if comp != 0 or bpp != 24:
                                raise NotImplementedError(
                                    "compressed AVI streams need a codec library "
                                    f"(biCompression={comp}, bpp={bpp})"
                                )
        elif kind == b"movi":
            if w is None:
                raise ValueError("AVI movi before hdrl")
            stride = (w * 3 + 3) & ~3
            for t2, p2, s2 in _walk(data, p + 4, p + size):
                if t2 in (b"00db", b"00dc"):
                    if s2 < stride * abs(h):
                        raise ValueError("truncated AVI frame chunk")
                    rows = np.frombuffer(data, np.uint8, stride * abs(h), p2)
                    rows = rows.reshape(abs(h), stride)[:, : w * 3].reshape(abs(h), w, 3)
                    # bottom-up BGR -> top-down RGB (negative height = already top-down)
                    frames.append((rows[::-1] if h > 0 else rows)[:, :, ::-1].copy())
    if w is None:
        raise ValueError("AVI stream has no stream-format header")
    return frames, fps
