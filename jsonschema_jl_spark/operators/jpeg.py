"""Pure-numpy baseline JPEG codec (encoder + decoder), no external libs.

Unstubs the `jpeg` lane of the multimodal pipeline (P14 per-row invariant,
BASELINE.json:15: decoded-pixel PSNR >= 40 dB for lossy formats): datagen can
emit real JFIF payloads and `decode_image` can decode them back, so the
decode/feature/PSNR plumbing is exercised end-to-end for a lossy codec, not
just the lossless PNG path.

Scope: baseline sequential DCT (SOF0), 8-bit, 4:4:4 (no subsampling) and
grayscale, standard JPEG Annex-K Huffman + quantization tables with libjpeg
quality scaling.  Progressive (SOF2), subsampled, arithmetic-coded and
12-bit streams raise NotImplementedError — the honest boundary; everything
this encoder emits any standard decoder can read, and this decoder reads
any baseline 4:4:4/grayscale stream.

The hot loops (DCT, quantize, dequantize, IDCT, color transforms) are
vectorized over all blocks at once; only the entropy coder is per-symbol
(inherent to Huffman), using a 16-bit peek table for decode.
"""

from __future__ import annotations

import struct
from functools import lru_cache

import numpy as np

# ---------------------------------------------------------------- constants

# Annex K quantization tables (natural row-major order)
_QT_LUM = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.float64,
)
_QT_CHR = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.float64,
)

# zigzag scan: _ZIGZAG[k] = natural index of the k-th zigzag coefficient
def _make_zigzag() -> np.ndarray:
    order = sorted(
        ((r, c) for r in range(8) for c in range(8)),
        # odd diagonals run top->bottom (r ascending), even ones bottom->top
        key=lambda rc: (rc[0] + rc[1], rc[0] if (rc[0] + rc[1]) % 2 else rc[1]),
    )
    return np.array([r * 8 + c for r, c in order], dtype=np.int64)


_ZIGZAG = _make_zigzag()
_UNZIGZAG = np.argsort(_ZIGZAG)

# Annex K Huffman table specs: (bits[1..16] counts, symbol values)
_DC_LUM_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUM_VALS = list(range(12))
_DC_CHR_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_CHR_VALS = list(range(12))
_AC_LUM_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_LUM_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
_AC_CHR_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_AC_CHR_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

# orthonormal 8-point DCT-II matrix: forward = C @ B @ C.T, inverse = C.T @ X @ C
_C = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _C[_k, _n] = np.cos((2 * _n + 1) * _k * np.pi / 16) * (
            np.sqrt(1 / 8) if _k == 0 else 0.5
        )


def _scaled_qt(base: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg quality scaling -> integer table in [1, 255]."""
    quality = max(1, min(100, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int64)


# ---------------------------------------------------------------- huffman

def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) via JPEG canonical code assignment."""
    out: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


@lru_cache(maxsize=16)
def _decode_table(bits: tuple[int, ...], vals: tuple[int, ...]) -> tuple[np.ndarray, np.ndarray]:
    """16-bit-peek flat lookup: peek16 -> (symbol, codelen).  One table fill
    per distinct (bits, vals) — cached process-wide."""
    sym = np.zeros(1 << 16, dtype=np.int16)
    ln = np.zeros(1 << 16, dtype=np.int8)
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            lo = code << (16 - length)
            hi = (code + 1) << (16 - length)
            sym[lo:hi] = vals[k]
            ln[lo:hi] = length
            code += 1
            k += 1
        code <<= 1
    return sym, ln


class _BitWriter:
    __slots__ = ("buf", "acc", "nbits")

    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.buf.append(0x00)
            self.nbits -= 8
            self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)  # pad with 1s per spec
        return bytes(self.buf)


class _BitReader:
    __slots__ = ("data", "pos", "acc", "nbits")

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def _fill(self, want: int) -> None:
        while self.nbits < want:
            b = self.data[self.pos] if self.pos < len(self.data) else 0
            self.pos += 1
            self.acc = (self.acc << 8) | b
            self.nbits += 8

    def peek16(self) -> int:
        self._fill(16)
        return (self.acc >> (self.nbits - 16)) & 0xFFFF

    def drop(self, n: int) -> None:
        self.nbits -= n
        self.acc &= (1 << self.nbits) - 1

    def receive(self, n: int) -> int:
        if n == 0:
            return 0
        self._fill(n)
        v = (self.acc >> (self.nbits - n)) & ((1 << n) - 1)
        self.drop(n)
        return v


def _magnitude(v: int) -> tuple[int, int]:
    """value -> (size category, amplitude bits) per JPEG F.1.2.1."""
    if v == 0:
        return 0, 0
    size = int(abs(v)).bit_length()
    amp = v if v >= 0 else v + (1 << size) - 1
    return size, amp


def _extend(amp: int, size: int) -> int:
    """amplitude bits -> signed value (JPEG EXTEND)."""
    if size == 0:
        return 0
    return amp if amp >= (1 << (size - 1)) else amp - (1 << size) + 1


# ---------------------------------------------------------------- blocks

def _to_blocks(plane: np.ndarray) -> np.ndarray:
    """(H, W) float -> (nbh*nbw, 8, 8), H/W already multiples of 8."""
    h, w = plane.shape
    return (
        plane.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    )


def _from_blocks(blocks: np.ndarray, h8: int, w8: int) -> np.ndarray:
    nbh, nbw = h8 // 8, w8 // 8
    return blocks.reshape(nbh, nbw, 8, 8).transpose(0, 2, 1, 3).reshape(h8, w8)


def _fdct_quant(blocks: np.ndarray, qt: np.ndarray) -> np.ndarray:
    """all blocks at once: DCT-II then quantize -> int zigzag (n, 64)."""
    coef = np.einsum("ij,njk,lk->nil", _C, blocks - 128.0, _C)
    q = np.round(coef / qt.reshape(8, 8)).astype(np.int64)
    return q.reshape(-1, 64)[:, _ZIGZAG]


def _dequant_idct(zz: np.ndarray, qt: np.ndarray) -> np.ndarray:
    """(n, 64) zigzag ints -> (n, 8, 8) float pixels (level-shifted back)."""
    nat = zz[:, _UNZIGZAG].astype(np.float64) * qt.reshape(-1)
    blocks = nat.reshape(-1, 8, 8)
    return np.einsum("ji,njk,kl->nil", _C, blocks, _C) + 128.0


# ---------------------------------------------------------------- encoder

def jpeg_encode(pixels: np.ndarray, quality: int = 92) -> bytes:
    """8-bit RGB (h, w, 3) or grayscale (h, w) -> baseline JFIF bytes.

    4:4:4 (no chroma subsampling), standard Annex-K Huffman tables, libjpeg
    quality scaling.  Decodable by any standard JPEG decoder.
    """
    gray = pixels.ndim == 2
    if not gray:
        h, w, c = pixels.shape
        assert c == 3 and pixels.dtype == np.uint8
    else:
        h, w = pixels.shape
        assert pixels.dtype == np.uint8

    qt_l = _scaled_qt(_QT_LUM, quality)
    qt_c = _scaled_qt(_QT_CHR, quality)

    # pad to block multiple by edge replication (spec-recommended)
    h8, w8 = (h + 7) // 8 * 8, (w + 7) // 8 * 8
    px = np.empty((h8, w8, 1 if gray else 3), dtype=np.float64)
    src = pixels[..., None] if gray else pixels
    px[:h, :w] = src
    px[h:, :w] = src[h - 1 : h, :]
    px[:, w:] = px[:, w - 1 : w]

    if gray:
        planes = [px[..., 0]]
        qts = [qt_l]
    else:
        r, g, b = px[..., 0], px[..., 1], px[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        planes = [y, cb, cr]
        qts = [qt_l, qt_c, qt_c]

    zz = [_fdct_quant(_to_blocks(p), qt) for p, qt in zip(planes, qts)]

    dc_l = _canonical_codes(_DC_LUM_BITS, _DC_LUM_VALS)
    ac_l = _canonical_codes(_AC_LUM_BITS, _AC_LUM_VALS)
    dc_c = _canonical_codes(_DC_CHR_BITS, _DC_CHR_VALS)
    ac_c = _canonical_codes(_AC_CHR_BITS, _AC_CHR_VALS)
    huff = [(dc_l, ac_l)] + [(dc_c, ac_c)] * (0 if gray else 2)

    bw = _BitWriter()
    pred = [0] * len(planes)
    n_blocks = zz[0].shape[0]
    for bi in range(n_blocks):  # MCU raster order, components interleaved
        for ci in range(len(planes)):
            dct, act = huff[ci]
            block = zz[ci][bi]
            diff = int(block[0]) - pred[ci]
            pred[ci] = int(block[0])
            size, amp = _magnitude(diff)
            code, ln = dct[size]
            bw.put(code, ln)
            bw.put(amp, size)
            run = 0
            nz = np.nonzero(block[1:])[0]
            last = nz[-1] + 1 if nz.size else 0
            for k in range(1, last + 1):
                v = int(block[k])
                if v == 0:
                    run += 1
                    continue
                while run >= 16:
                    code, ln = act[0xF0]  # ZRL
                    bw.put(code, ln)
                    run -= 16
                size, amp = _magnitude(v)
                code, ln = act[(run << 4) | size]
                bw.put(code, ln)
                bw.put(amp, size)
                run = 0
            if last < 63:
                code, ln = act[0x00]  # EOB
                bw.put(code, ln)
    entropy = bw.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xFFDB, bytes([0x00]) + bytes(qt_l[_ZIGZAG].astype(np.uint8)))
    if not gray:
        out += seg(0xFFDB, bytes([0x01]) + bytes(qt_c[_ZIGZAG].astype(np.uint8)))
    ncomp = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for cid in range(1, ncomp + 1):
        sof += bytes([cid, 0x11, 0 if cid == 1 else 1])
    out += seg(0xFFC0, sof)
    for cls_id, bits, vals in (
        (0x00, _DC_LUM_BITS, _DC_LUM_VALS),
        (0x10, _AC_LUM_BITS, _AC_LUM_VALS),
    ) + (() if gray else (
        (0x01, _DC_CHR_BITS, _DC_CHR_VALS),
        (0x11, _AC_CHR_BITS, _AC_CHR_VALS),
    )):
        out += seg(0xFFC4, bytes([cls_id]) + bytes(bits) + bytes(vals))
    sos = bytes([ncomp])
    for cid in range(1, ncomp + 1):
        sos += bytes([cid, 0x00 if cid == 1 else 0x11])
    sos += bytes([0, 63, 0])
    out += seg(0xFFDA, sos)
    out += entropy
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------- decoder

def jpeg_decode(data: bytes) -> np.ndarray:
    """Baseline JFIF bytes -> (h, w, 3) uint8 RGB (grayscale replicated).

    Supports SOF0, 8-bit, 4:4:4 or single-component; restart intervals
    honored.  Progressive / subsampled / arithmetic streams raise
    NotImplementedError.
    """
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    pos = 2
    qts: dict[int, np.ndarray] = {}
    hts: dict[int, tuple[np.ndarray, np.ndarray]] = {}
    h = w = 0
    comps: list[tuple[int, int, int]] = []  # (id, sampling, qt_id)
    scan_comps: list[tuple[int, int, int]] = []  # (comp_idx, dc_id, ac_id)
    restart = 0
    entropy = b""

    while pos < len(data):
        if data[pos] != 0xFF:
            pos += 1
            continue
        marker = data[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:
            break
        (length,) = struct.unpack(">H", data[pos : pos + 2])
        payload = data[pos + 2 : pos + length]
        pos += length
        if marker == 0xDB:  # DQT (possibly multiple tables per segment)
            p = 0
            while p < len(payload):
                pq, tq = payload[p] >> 4, payload[p] & 0x0F
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables")
                tbl = np.frombuffer(payload[p + 1 : p + 65], dtype=np.uint8).astype(np.int64)
                qts[tq] = tbl[_UNZIGZAG]  # stored zigzag -> natural
                p += 65
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(payload):
                tc_th = payload[p]
                bits = tuple(payload[p + 1 : p + 17])
                n = sum(bits)
                vals = tuple(payload[p + 17 : p + 17 + n])
                hts[tc_th] = _decode_table(bits, vals)
                p += 17 + n
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            prec, h, w, nc = struct.unpack(">BHHB", payload[:6])
            if prec != 8:
                raise NotImplementedError("only 8-bit precision")
            comps = [
                (payload[6 + 3 * i], payload[7 + 3 * i], payload[8 + 3 * i])
                for i in range(nc)
            ]
            if any(s != 0x11 for _, s, _q in comps):
                raise NotImplementedError("chroma subsampling not supported")
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError("only baseline sequential (SOF0) supported")
        elif marker == 0xDD:  # DRI
            (restart,) = struct.unpack(">H", payload[:2])
        elif marker == 0xDA:  # SOS — entropy data follows
            if entropy:
                # a second SOS means a multi-scan (non-interleaved) baseline
                # stream; decoding only the last scan would silently return
                # garbage as if complete — honest-stub contract says raise
                raise NotImplementedError("multi-scan (non-interleaved) baseline JPEG")
            ns = payload[0]
            if comps and ns < len(comps):
                raise NotImplementedError("multi-scan (non-interleaved) baseline JPEG")
            ids = [c[0] for c in comps]
            scan_comps = [
                (ids.index(payload[1 + 2 * i]), payload[2 + 2 * i] >> 4,
                 payload[2 + 2 * i] & 0x0F)
                for i in range(ns)
            ]
            # find end of entropy segment: 0xFF followed by a real marker
            end = pos
            while end < len(data) - 1:
                if data[end] == 0xFF and data[end + 1] != 0x00 and not (
                    0xD0 <= data[end + 1] <= 0xD7
                ):
                    break
                end += 1
            entropy = data[pos:end]
            pos = end
    if not comps or not entropy:
        raise ValueError("truncated JPEG")

    # de-stuff + strip RST markers (MCU decode handles predictor reset)
    raw = np.frombuffer(entropy, dtype=np.uint8)
    rst_positions: list[int] = []
    clean = bytearray()
    i = 0
    # vectorized fast path: no 0xFF at all
    ff = np.nonzero(raw == 0xFF)[0]
    if ff.size == 0:
        clean = bytearray(entropy)
    else:
        while i < len(entropy):
            b = entropy[i]
            if b == 0xFF and i + 1 < len(entropy):
                nxt = entropy[i + 1]
                if nxt == 0x00:
                    clean.append(0xFF)
                    i += 2
                    continue
                if 0xD0 <= nxt <= 0xD7:
                    rst_positions.append(len(clean))
                    i += 2
                    continue
            clean.append(b)
            i += 1

    nbw, nbh = (w + 7) // 8, (h + 7) // 8
    n_mcu = nbw * nbh
    nc = len(scan_comps)
    zz = [np.zeros((n_mcu, 64), dtype=np.int64) for _ in range(nc)]

    br = _BitReader(bytes(clean))
    pred = [0] * nc
    mcu_since_rst = 0
    for m in range(n_mcu):
        if restart and mcu_since_rst == restart:
            # realign to byte boundary; RST bytes already stripped
            br.drop(br.nbits % 8)
            pred = [0] * nc
            mcu_since_rst = 0
        mcu_since_rst += 1
        for si, (ci, dc_id, ac_id) in enumerate(scan_comps):
            dsym, dlen = hts[0x00 | dc_id]
            asym, alen = hts[0x10 | ac_id]
            peek = br.peek16()
            size = int(dsym[peek])
            ln = int(dlen[peek])
            if ln == 0:
                raise ValueError("invalid Huffman code (DC)")
            br.drop(ln)
            pred[si] += _extend(br.receive(size), size)
            row = zz[si][m]
            row[0] = pred[si]
            k = 1
            while k < 64:
                peek = br.peek16()
                rs = int(asym[peek])
                ln = int(alen[peek])
                if ln == 0:
                    raise ValueError("invalid Huffman code (AC)")
                br.drop(ln)
                if rs == 0x00:  # EOB
                    break
                if rs == 0xF0:  # ZRL
                    k += 16
                    continue
                k += rs >> 4
                if k >= 64:
                    raise ValueError("AC run overflow")
                size = rs & 0x0F
                row[k] = _extend(br.receive(size), size)
                k += 1

    h8, w8 = nbh * 8, nbw * 8
    planes = []
    for si, (ci, _dc, _ac) in enumerate(scan_comps):
        qt = qts[comps[ci][2]]
        blocks = _dequant_idct(zz[si], qt)
        planes.append(_from_blocks(blocks, h8, w8)[:h, :w])

    if nc == 1:
        yv = np.clip(planes[0], 0, 255)
        return np.repeat(yv[:, :, None], 3, axis=2).astype(np.uint8)
    y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
