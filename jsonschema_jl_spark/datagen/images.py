"""Deterministic synthetic `images` table (FIXTURES.md §1, BASELINE.json:15).

Every value is a pure function of the row id (splitmix64-style hashing), so
generation is partition-order independent, resumable, and identical at any
parallelism — a requirement for the recall oracle and the scaling bench.

Planted structure per 20-id block (ground truth from the same id arithmetic):
  positions 0-11   singletons
  12, 13           containment pair (13's caption = token slice of 12's)
  14, 15           exact dup (same caption/pixels/phash, new image_id)
  16, 17           caption near-dup (one token edited, phash distinct)
  18, 19           phash near-dup (<= hamming_radius bits flipped, captions distinct)

Malformed rows (~8% extra, appended after `n_rows`) each violate exactly one
gate keyword: required (null caption), enum (fmt=bmp), minimum (w=0),
minLength (caption 'x'), pattern (bad image_id), maximum (h=70000).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from jsonschema_jl_spark.config import DedupConfig, DEFAULT_CONFIG
from jsonschema_jl_spark.operators.multimodal import png_encode

# fixed 500-token vocabulary: seeded random-letter words (low cross-token
# shingle overlap keeps baseline Jaccard near 0 so LSH candidate volume stays
# proportional to true dups) + a few unicode tokens for codepoint tests
def _make_vocab() -> list[str]:
    rng = np.random.default_rng(42)
    words: list[str] = []
    seen = set()
    while len(words) < 484:
        n = int(rng.integers(4, 9))
        w = "".join(chr(97 + c) for c in rng.integers(0, 26, size=n))
        if w not in seen:
            seen.add(w)
            words.append(w)
    return words + [
        "naïve", "café", "über", "niño", "søster", "grüß", "héllo", "ωμέγα",
        "łódź", "çay", "þing", "ñandú", "crème", "smörgås", "fjörd", "日本",
    ]


_VOCAB = _make_vocab()
_V = len(_VOCAB)

_KINDS = {12: "substring", 13: "substring", 14: "exact", 15: "exact",
          16: "caption", 17: "caption", 18: "phash", 19: "phash"}

_MAL_KINDS = ["required", "enum", "minimum", "minLength", "pattern", "maximum"]


def _h64(x: np.ndarray, salt: int) -> np.ndarray:
    """splitmix64 over uint64 ids — vectorized, partition-independent."""
    # salt folded in with explicit mod-2^64 arithmetic (same value as uint64
    # wraparound, without numpy's scalar-overflow warning)
    z = x.astype(np.uint64) + np.uint64((0x9E3779B97F4A7C15 * (salt + 1)) & 0xFFFFFFFFFFFFFFFF)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _h1(i: int, salt: int) -> int:
    return int(_h64(np.array([i], dtype=np.uint64), salt)[0])


def _base_id(i: int) -> int:
    """The id whose content row i derives from (itself for non-dup rows)."""
    pos = i % 20
    if pos in (13, 15, 17, 19):
        return i - 1
    return i


def _tokens_for(i: int, n_tok: int) -> list[str]:
    idx = _h64(np.arange(n_tok, dtype=np.uint64) + np.uint64(i) * np.uint64(1_000_003), 7) % np.uint64(_V)
    return [_VOCAB[int(j)] for j in idx]


def _caption_for(i: int) -> str:
    pos = i % 20
    base = _base_id(i)
    if pos in (16, 17):
        n_tok = 24
    elif pos == 12:
        n_tok = 28
    else:
        n_tok = 8 + _h1(base, 1) % 28
    toks = _tokens_for(base, n_tok)
    if pos == 13:
        # contained: a mid slice of the base caption (>= 16 chars guaranteed:
        # tokens are >= 6 chars incl. separator)
        return " ".join(toks[2:14])
    if pos == 17:
        # near-dup: one token replaced deterministically
        edit_pos = _h1(i, 3) % n_tok
        toks = list(toks)
        toks[edit_pos] = _VOCAB[_h1(i, 4) % _V]
        return " ".join(toks)
    if pos == 19:
        # phash pair: caption intentionally unrelated -> regenerate from i
        return " ".join(_tokens_for(i + 10_000_019, 8 + _h1(i, 5) % 20))
    return " ".join(toks)


def _phash_for(i: int, cfg: DedupConfig) -> int:
    pos = i % 20
    base = _base_id(i)
    h = _h1(base, 11) if pos in (15,) else _h1(base if pos == 19 else i, 11)
    if pos == 15:
        return np.int64(np.uint64(h)).item()
    if pos == 19:
        # flip <= hamming_radius distinct bits of the base phash
        ph = np.uint64(_h1(base, 11))
        for b in range(cfg.hamming_radius):
            bit = _h1(i, 20 + b) % cfg.phash_bits
            ph = ph ^ (np.uint64(1) << np.uint64(bit))
        return np.int64(ph).item()
    return np.int64(np.uint64(_h1(i, 11))).item()


def _dims_for(i: int) -> tuple[int, int]:
    base = _base_id(i)
    return 32 + _h1(base, 13) % 33, 32 + _h1(base, 14) % 33


def _pixels_for(i: int, w: int, h: int) -> np.ndarray:
    base = _base_id(i)
    gx = np.linspace(0, 255, w, dtype=np.float32)
    gy = np.linspace(0, 255, h, dtype=np.float32)[:, None]
    seed_r = _h1(base, 15) % 256
    noise = (_h64(np.arange(w * h * 3, dtype=np.uint64) + np.uint64(base), 16) % np.uint64(64)).astype(
        np.float32
    ).reshape(h, w, 3)
    px = np.empty((h, w, 3), dtype=np.float32)
    px[..., 0] = (gx[None, :] + seed_r) % 256
    px[..., 1] = gy % 256
    px[..., 2] = (gx[None, :] + gy) % 256
    px = (px + noise) % 256
    return px.astype(np.uint8)


def _encode_for(i: int, w: int, h: int, fmt: str) -> bytes:
    """Real payload per fmt lane: lossless PNG, lossy baseline JPEG at
    quality 98 (decoded-pixel PSNR >= 40 dB vs source, the BASELINE.json:15
    lossy invariant), and real lossless WebP via the pure-numpy VP8L codec
    (decoded pixels bit-exact)."""
    px = _pixels_for(i, w, h)
    if fmt == "jpeg":
        from jsonschema_jl_spark.operators.jpeg import jpeg_encode

        return jpeg_encode(px, quality=98)
    if fmt == "webp":
        from jsonschema_jl_spark.operators.vp8l import webp_encode

        return webp_encode(px)
    return png_encode(px)


def _row_for(i: int, cfg: DedupConfig, with_bytes: bool) -> dict:
    w, h = _dims_for(i)
    fmt = ["png", "jpeg", "webp"][_h1(_base_id(i), 17) % 3]
    return {
        "image_id": f"img{i:012d}",
        "bytes": _encode_for(i, w, h, fmt) if with_bytes else b"",
        "w": w,
        "h": h,
        "fmt": fmt,
        "caption": _caption_for(i),
        "phash": _phash_for(i, cfg),
    }


def _malformed_row(j: int, n_rows: int, cfg: DedupConfig, with_bytes: bool) -> dict:
    i = n_rows + j
    row = _row_for(i, cfg, with_bytes)
    kind = _MAL_KINDS[j % len(_MAL_KINDS)]
    if kind == "required":
        row["caption"] = None
    elif kind == "enum":
        row["fmt"] = "bmp"
    elif kind == "minimum":
        row["w"] = 0
    elif kind == "minLength":
        row["caption"] = "x"
    elif kind == "pattern":
        row["image_id"] = f"IMG-{i}"
    elif kind == "maximum":
        row["h"] = 70000
    return row


_IMAGES_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("bytes", T.BinaryType(), False),
        T.StructField("w", T.IntegerType(), False),
        T.StructField("h", T.IntegerType(), False),
        T.StructField("fmt", T.StringType(), False),
        T.StructField("caption", T.StringType(), True),
        T.StructField("phash", T.LongType(), False),
    ]
)


def generate_images(
    spark: SparkSession,
    n_rows: int,
    cfg: DedupConfig = DEFAULT_CONFIG,
    with_malformed: bool = True,
    with_bytes: bool = True,
    num_partitions: int | None = None,
) -> DataFrame:
    """Distributed deterministic generation via mapInPandas over a range —
    scales to any n without driver materialization."""
    n_mal = int(0.08 * n_rows) if with_malformed else 0
    total = n_rows + n_mal
    rng_df = spark.range(0, total, 1, num_partitions or max(4, total // 50_000))

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                if i < n_rows:
                    rows.append(_row_for(i, cfg, with_bytes))
                else:
                    rows.append(_malformed_row(i - n_rows, n_rows, cfg, with_bytes))
            yield pd.DataFrame(rows)

    return rng_df.mapInPandas(gen, schema=_IMAGES_SCHEMA)


def truth_sidecar(spark: SparkSession, n_rows: int) -> DataFrame:
    """(image_id, dup_group_id, dup_kind, gate_expect_valid) — pure id
    arithmetic, computable natively (no Python)."""
    n_mal = int(0.08 * n_rows)
    df = spark.range(0, n_rows + n_mal)
    pos = F.col("id") % 20
    base = F.when(pos.isin(13, 15, 17, 19), F.col("id") - 1).otherwise(F.col("id"))
    kind = (
        F.when(~(F.col("id") < n_rows), F.lit("malformed"))
        .when(pos.isin(12, 13), F.lit("substring"))
        .when(pos.isin(14, 15), F.lit("exact"))
        .when(pos.isin(16, 17), F.lit("caption"))
        .when(pos.isin(18, 19), F.lit("phash"))
        .otherwise(F.lit("none"))
    )
    return df.select(
        F.format_string("img%012d", F.col("id")).alias("image_id"),
        F.when(F.col("id") < n_rows, base).alias("dup_group_id"),
        kind.alias("dup_kind"),
        (F.col("id") < n_rows).alias("gate_expect_valid"),
    )
