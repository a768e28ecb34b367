"""Pure-numpy lossless WebP (VP8L) codec — unstubs the third image lane.

Scope (same philosophy as the baseline JPEG codec in operators/jpeg.py):
a from-scratch implementation of the public "WebP Lossless Bitstream
Specification" sufficient to carry REAL webp payloads through the P14
decode path (reference parity target: the per-row decoded-pixel invariant,
BASELINE.json:15 — VP8L is lossless, so the invariant is exact equality).

Encoder (always emits this subset):
  - RIFF/WEBP container with a single VP8L chunk
  - no transforms, no color cache, no meta-huffman (single htree group)
  - literal ARGB pixels only (no LZ77 backreferences)
  - per-channel canonical Huffman codes (simple 1/2-symbol codes where the
    channel histogram allows, normal codes with the full code-length-code
    machinery otherwise), vectorized bit packing via np.packbits

Decoder (reads the encoder's subset, raises honestly beyond it):
  - transforms, color cache, meta-huffman, and LZ77 length codes raise
    NotImplementedError (a libwebp-produced file will usually use LZ77;
    production decode of arbitrary webp requires libwebp)
  - lossy VP8 / extended VP8X chunks raise NotImplementedError

Bit conventions (spec section "4 RIFF header" / "5 Bitstream"):
  - bytes are filled LSB-first; ReadBits(n) values are little-endian
  - Huffman codes are canonical (DEFLATE-style: by length then symbol
    value) and their bits enter the stream MSB-of-code-first
"""

from __future__ import annotations

import heapq
import struct

import numpy as np

# code-length-code symbol transmission order (spec 5.2.2; identical to the
# order libwebp's kCodeLengthCodeOrder publishes)
_CL_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)
_GREEN_ALPHABET = 256 + 24  # literals + LZ77 length codes (no color cache)
_MAX_CODE_LEN = 15
_MAX_CL_LEN = 7  # code-length-code lengths are 3-bit fields


# ---------------------------------------------------------------------------
# Huffman construction (encoder side)
# ---------------------------------------------------------------------------


def _huffman_lengths(freqs: np.ndarray, max_len: int) -> np.ndarray:
    """Canonical Huffman code lengths from symbol frequencies, limited to
    max_len.  Standard heap merge, then a Kraft-repair pass for the rare
    deep trees (clamp overlong codes, lengthen the shallowest-fixable
    symbols until the Kraft sum is <= 1 again)."""
    sym = np.flatnonzero(freqs)
    lengths = np.zeros(len(freqs), dtype=np.int64)
    if len(sym) == 0:
        return lengths
    if len(sym) == 1:
        lengths[sym[0]] = 1
        return lengths
    heap = [(int(freqs[s]), int(s), [int(s)]) for s in sym]
    heapq.heapify(heap)
    tick = len(freqs)  # tie-break id to keep the merge deterministic
    while len(heap) > 1:
        fa, _, la = heapq.heappop(heap)
        fb, _, lb = heapq.heappop(heap)
        lengths[la] += 1
        lengths[lb] += 1
        heapq.heappush(heap, (fa + fb, tick, la + lb))
        tick += 1
    if lengths.max() > max_len:
        lengths = np.minimum(lengths, max_len)
        # Kraft sum scaled by 2^max_len must be <= 2^max_len
        kraft = int(np.sum(1 << (max_len - lengths[sym])))
        while kraft > (1 << max_len):
            # lengthening the currently-longest sub-max symbol wastes the
            # least code space
            cand = sym[lengths[sym] < max_len]
            deepest = cand[np.argmax(lengths[cand])]
            kraft -= 1 << (max_len - lengths[deepest])
            lengths[deepest] += 1
            kraft += 1 << (max_len - lengths[deepest])
    return lengths


def _canonical_codes(lengths: np.ndarray) -> np.ndarray:
    """DEFLATE-style canonical code assignment: codes ordered by
    (length, symbol).  Returns int64 codes (0 where length == 0)."""
    codes = np.zeros(len(lengths), dtype=np.int64)
    max_l = int(lengths.max()) if len(lengths) else 0
    code = 0
    next_code = np.zeros(max_l + 2, dtype=np.int64)
    counts = np.bincount(lengths, minlength=max_l + 2)
    counts[0] = 0
    for l in range(1, max_l + 1):
        code = (code + counts[l - 1]) << 1
        next_code[l] = code
    for s in range(len(lengths)):
        l = lengths[s]
        if l > 0:
            codes[s] = next_code[l]
            next_code[l] += 1
    return codes


# ---------------------------------------------------------------------------
# Bit I/O
# ---------------------------------------------------------------------------


class _Bits:
    """Accumulates bits (one int per bit, stream order) for np.packbits
    with bitorder='little' — VP8L fills bytes LSB-first."""

    __slots__ = ("out",)

    def __init__(self) -> None:
        self.out: list[int] = []

    def write(self, value: int, n: int) -> None:
        """Fixed-width field: LSB of value enters the stream first."""
        for i in range(n):
            self.out.append((value >> i) & 1)

    def write_code(self, code: int, length: int) -> None:
        """Huffman code: MSB of the code enters the stream first."""
        for i in range(length - 1, -1, -1):
            self.out.append((code >> i) & 1)


class _BitReader:
    __slots__ = ("bits", "pos")

    def __init__(self, data: bytes) -> None:
        # a plain list beats ndarray scalar indexing ~3x in the bit loop
        self.bits = np.unpackbits(
            np.frombuffer(data, dtype=np.uint8), bitorder="little"
        ).tolist()
        self.pos = 0

    def read_bits(self, n: int) -> int:
        v = 0
        b, p = self.bits, self.pos
        for i in range(n):
            v |= int(b[p + i]) << i
        self.pos = p + n
        return v

    def read_symbol(self, tree: dict) -> int:
        if tree.get("leaf") is not None:  # 0-bit single-symbol code
            return tree["leaf"]
        table = tree["table"]
        code = 0
        length = 0
        b = self.bits
        p = self.pos
        while True:
            code = (code << 1) | int(b[p])
            p += 1
            length += 1
            sym = table.get((length, code))
            if sym is not None:
                self.pos = p
                return sym
            if length > _MAX_CODE_LEN:
                raise ValueError("invalid VP8L Huffman stream")


def _tree_from_lengths(lengths) -> dict:
    lengths = np.asarray(lengths, dtype=np.int64)
    used = np.flatnonzero(lengths)
    if len(used) == 0:
        raise ValueError("empty Huffman code")
    if len(used) == 1:
        return {"leaf": int(used[0]), "table": {}}
    codes = _canonical_codes(lengths)
    table = {(int(lengths[s]), int(codes[s])): int(s) for s in used}
    return {"leaf": None, "table": table}


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------


def _write_huffman_code(bits: _Bits, lengths: np.ndarray, syms: np.ndarray) -> None:
    """Emit one Huffman code definition (spec 5.2.2).  `syms` = the used
    symbols; simple form for <= 2 symbols (when they fit its fields),
    otherwise the normal code-length-coded form covering the full
    alphabet, with zero runs compressed via repeat codes 17/18."""
    if len(syms) == 1 and syms[0] < 256:
        s = int(syms[0])
        bits.write(1, 1)  # simple
        bits.write(0, 1)  # num_symbols - 1 = 0
        if s < 2:
            bits.write(0, 1)  # 1-bit first symbol
            bits.write(s, 1)
        else:
            bits.write(1, 1)  # 8-bit first symbol
            bits.write(s, 8)
        return
    if len(syms) == 2 and syms[1] < 256:
        s0, s1 = int(syms[0]), int(syms[1])
        bits.write(1, 1)  # simple
        bits.write(1, 1)  # num_symbols - 1 = 1
        if s0 < 2:
            bits.write(0, 1)
            bits.write(s0, 1)
        else:
            bits.write(1, 1)
            bits.write(s0, 8)
        bits.write(s1, 8)
        return

    # normal form: serialize per-symbol code lengths as a stream of
    # code-length symbols (0-15 literal lengths, 17/18 zero runs)
    bits.write(0, 1)  # not simple
    cl_stream: list[tuple[int, int, int]] = []  # (cl_symbol, extra, extra_bits)
    i = 0
    n = len(lengths)
    while i < n:
        l = int(lengths[i])
        if l == 0:
            run = 1
            while i + run < n and lengths[i + run] == 0:
                run += 1
            i += run
            while run >= 11:
                take = min(run, 138)
                cl_stream.append((18, take - 11, 7))
                run -= take
            while run >= 3:
                take = min(run, 10)
                cl_stream.append((17, take - 3, 3))
                run -= take
            for _ in range(run):
                cl_stream.append((0, 0, 0))
        else:
            cl_stream.append((l, 0, 0))
            i += 1

    cl_freq = np.zeros(19, dtype=np.int64)
    for s, _, _ in cl_stream:
        cl_freq[s] += 1
    cl_lengths = _huffman_lengths(cl_freq, _MAX_CL_LEN)
    cl_codes = _canonical_codes(cl_lengths)
    # a code-length tree with ONE used symbol decodes with 0 bits per
    # stream symbol (the decoder's single-leaf special case), so emit none
    single_cl = int(np.count_nonzero(cl_freq)) == 1
    # transmit all 19 code-length-code lengths (order _CL_ORDER)
    bits.write(19 - 4, 4)
    for s in _CL_ORDER:
        bits.write(int(cl_lengths[s]), 3)
    bits.write(0, 1)  # no max_symbol shortcut: lengths cover the alphabet
    for s, extra, extra_bits in cl_stream:
        if not single_cl:
            bits.write_code(int(cl_codes[s]), int(cl_lengths[s]))
        if extra_bits:
            bits.write(extra, extra_bits)


def _channel_code(values: np.ndarray, alphabet: int):
    """(lengths, codes, used_symbols) for one pixel channel.  A channel
    with one distinct value gets all-zero lengths: its wire form is the
    simple 1-symbol code, which decodes with ZERO bits per pixel."""
    freqs = np.bincount(values, minlength=alphabet)
    syms = np.flatnonzero(freqs)
    if len(syms) == 1:
        return np.zeros(alphabet, dtype=np.int64), np.zeros(alphabet, dtype=np.int64), syms
    lengths = _huffman_lengths(freqs, _MAX_CODE_LEN)
    return lengths, _canonical_codes(lengths), syms


def _code_bit_luts(lengths: np.ndarray, codes: np.ndarray):
    """Per-symbol write-order bit matrix (alphabet, max_len) + length
    vector, for vectorized emission: row s holds the bits of code[s]
    MSB-first in columns 0..len-1."""
    max_l = max(int(lengths.max()), 1)
    shifts = lengths[:, None] - 1 - np.arange(max_l)[None, :]
    bitmat = np.where(shifts >= 0, (codes[:, None] >> np.maximum(shifts, 0)) & 1, 0)
    return bitmat.astype(np.uint8), lengths.astype(np.int64), max_l


def webp_encode(pixels: np.ndarray) -> bytes:
    """8-bit RGB (h, w, 3) -> lossless WebP bytes (VP8L, literal-only)."""
    h, w, c = pixels.shape
    assert c == 3 and pixels.dtype == np.uint8
    assert 1 <= w <= 16384 and 1 <= h <= 16384

    bits = _Bits()
    bits.write(0x2F, 8)  # VP8L signature byte
    bits.write(w - 1, 14)
    bits.write(h - 1, 14)
    bits.write(0, 1)  # alpha hint: none
    bits.write(0, 3)  # version
    bits.write(0, 1)  # no transforms
    bits.write(0, 1)  # no color cache
    bits.write(0, 1)  # no meta-huffman (single htree group)

    flat = pixels.reshape(-1, 3).astype(np.int64)
    g, r, b = flat[:, 1], flat[:, 0], flat[:, 2]

    g_len, g_code, g_sym = _channel_code(g, _GREEN_ALPHABET)
    r_len, r_code, r_sym = _channel_code(r, 256)
    b_len, b_code, b_sym = _channel_code(b, 256)
    a_len = np.zeros(256, dtype=np.int64)
    a_len[255] = 1  # constant alpha: simple 1-symbol code, 0 bits/pixel
    d_len = np.zeros(40, dtype=np.int64)
    d_len[0] = 1  # distance tree unused (no LZ77): 1-symbol placeholder

    # tree order per spec: green, red, blue, alpha, distance
    _write_huffman_code(bits, g_len, g_sym)
    _write_huffman_code(bits, r_len, r_sym)
    _write_huffman_code(bits, b_len, b_sym)
    _write_huffman_code(bits, a_len, np.array([255]))
    _write_huffman_code(bits, d_len, np.array([0]))

    # vectorized pixel emission: per pixel G then R then B code bits
    # (alpha's 1-symbol code contributes zero bits)
    gm, gl, gw = _code_bit_luts(g_len, g_code)
    rm, rl, rw = _code_bit_luts(r_len, r_code)
    bm, bl, bw = _code_bit_luts(b_len, b_code)
    bitmat = np.concatenate([gm[g], rm[r], bm[b]], axis=1)
    cols = np.arange(gw + rw + bw)[None, :]
    lens = np.stack([gl[g], rl[r], bl[b]], axis=1)
    mask = np.concatenate(
        [cols[:, :gw] < lens[:, :1], cols[:, :rw] < lens[:, 1:2], cols[:, :bw] < lens[:, 2:3]],
        axis=1,
    )
    body = bitmat[mask]  # row-major boolean indexing preserves pixel order

    header = np.array(bits.out, dtype=np.uint8)
    stream = np.packbits(np.concatenate([header, body]), bitorder="little").tobytes()

    pad = b"\x00" if len(stream) % 2 else b""  # RIFF chunks are even-padded
    riff = b"WEBP" + b"VP8L" + struct.pack("<I", len(stream)) + stream + pad
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------


def _read_huffman_code(br: _BitReader, alphabet: int) -> dict:
    if br.read_bits(1):  # simple
        num_symbols = br.read_bits(1) + 1
        if br.read_bits(1):
            s0 = br.read_bits(8)
        else:
            s0 = br.read_bits(1)
        if num_symbols == 1:
            return {"leaf": s0, "table": {}}
        s1 = br.read_bits(8)
        lengths = np.zeros(alphabet, dtype=np.int64)
        lengths[s0] = 1
        lengths[s1] = 1
        return _tree_from_lengths(lengths)

    num_cl = 4 + br.read_bits(4)
    cl_lengths = np.zeros(19, dtype=np.int64)
    for i in range(num_cl):
        cl_lengths[_CL_ORDER[i]] = br.read_bits(3)
    cl_tree = _tree_from_lengths(cl_lengths)

    if br.read_bits(1):  # use max_symbol shortcut
        length_nbits = 2 + 2 * br.read_bits(3)
        max_symbol = 2 + br.read_bits(length_nbits)
    else:
        max_symbol = alphabet

    lengths = np.zeros(alphabet, dtype=np.int64)
    prev = 8
    symbol = 0
    while symbol < alphabet and max_symbol > 0:
        max_symbol -= 1
        code_len = br.read_symbol(cl_tree)
        if code_len < 16:
            lengths[symbol] = code_len
            symbol += 1
            if code_len:
                prev = code_len
        elif code_len == 16:
            rep = 3 + br.read_bits(2)
            lengths[symbol : symbol + rep] = prev
            symbol += rep
        elif code_len == 17:
            symbol += 3 + br.read_bits(3)
        else:  # 18
            symbol += 11 + br.read_bits(7)
    return _tree_from_lengths(lengths)


def _find_chunk(data: bytes) -> bytes:
    if data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise ValueError("not a WebP file")
    pos = 12
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        payload = data[pos + 8 : pos + 8 + size]
        if tag == b"VP8L":
            return payload
        if tag in (b"VP8 ", b"VP8X"):
            raise NotImplementedError(
                "lossy/extended WebP requires libwebp (only VP8L lossless supported)"
            )
        pos += 8 + size + (size & 1)
    raise ValueError("no VP8L chunk in WebP container")


def webp_decode(data: bytes) -> np.ndarray:
    """Lossless WebP (VP8L) bytes -> (h, w, 3) uint8 RGB.  Supports the
    subset webp_encode emits (any literal-only single-group stream);
    transforms, color cache, meta-huffman and LZ77 raise
    NotImplementedError — production decode of arbitrary webp needs
    libwebp."""
    br = _BitReader(_find_chunk(data))
    if br.read_bits(8) != 0x2F:
        raise ValueError("bad VP8L signature")
    w = br.read_bits(14) + 1
    h = br.read_bits(14) + 1
    br.read_bits(1)  # alpha hint
    if br.read_bits(3) != 0:
        raise ValueError("unknown VP8L version")
    if br.read_bits(1):
        raise NotImplementedError("VP8L transforms not supported")
    if br.read_bits(1):
        raise NotImplementedError("VP8L color cache not supported")
    if br.read_bits(1):
        raise NotImplementedError("VP8L meta-huffman not supported")

    g_tree = _read_huffman_code(br, _GREEN_ALPHABET)
    r_tree = _read_huffman_code(br, 256)
    b_tree = _read_huffman_code(br, 256)
    a_tree = _read_huffman_code(br, 256)
    _read_huffman_code(br, 40)  # distance tree (unused without LZ77)

    n = w * h
    out = np.empty((n, 3), dtype=np.uint8)
    read = br.read_symbol
    for i in range(n):
        green = read(g_tree)
        if green >= 256:
            raise NotImplementedError("VP8L LZ77 backreferences not supported")
        out[i, 1] = green
        out[i, 0] = read(r_tree)
        out[i, 2] = read(b_tree)
        read(a_tree)  # alpha decoded and dropped (RGB pipeline)
    return out.reshape(h, w, 3)
