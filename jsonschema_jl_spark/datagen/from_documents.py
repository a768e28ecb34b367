"""Derive an `images` table (input_hint shape) from the driver's documents
parquet: captions are real testdata text, with deterministically planted
duplicate rows and malformed gate rows appended — the flagship entry input.

The binary `bytes` column carries REAL payloads: rows whose base doc has
fmt=png (doc_id % 3 == 0) get an actual PNG, fmt=jpeg rows
(doc_id % 3 == 1) a real baseline JPEG, and fmt=webp rows (doc_id % 3 == 2)
a real lossless-WebP VP8L stream (deterministic gradient pixels of exactly
the stated w x h, encoded by the same pure-python codecs the P14 decode
path reads back), so `entry()` and `images_features` exercise the
lossless, lossy, and VP8L decode kernels end-to-end.  One webp sub-lane
(doc_id % 9 == 2) instead carries a lossy-VP8 RIFF container, which the
decoder honestly refuses (NotImplementedError — libwebp is not in this
container), keeping per-row decode-failure isolation exercised in the
contract.  Dup/malformed derivations copy their base row's bytes, so
decode success is a pure function of the BASE doc_id — mirrored exactly by
the DuckDB oracle in __spark_entry__.py.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from jsonschema_jl_spark.operators.multimodal import png_encode


@F.pandas_udf(T.BinaryType())
def _payload_udf(seed: pd.Series, w: pd.Series, h: pd.Series) -> pd.Series:
    """Deterministic per-row payload: real PNG when seed % 3 == 0 (the png
    fmt lane), real baseline JPEG when seed % 3 == 1 (quality 98 so
    decoded-pixel PSNR >= 40 dB holds), real lossless-WebP VP8L when
    seed % 3 == 2 — except the seed % 9 == 2 sub-lane, which carries a
    lossy-VP8 RIFF container the decoder honestly refuses
    (NotImplementedError: libwebp absent).  Pixels are a gradient keyed by
    the seed so every image is distinct and exactly (h, w, 3)."""
    import struct as _struct

    from jsonschema_jl_spark.operators.jpeg import jpeg_encode
    from jsonschema_jl_spark.operators.vp8l import webp_encode

    out = []
    for s, ww, hh in zip(seed, w, h):
        s, ww, hh = int(s), int(ww), int(hh)
        lane = s % 3
        if lane == 2 and s % 9 == 2:
            payload = b"\x00" * 10  # VP8 bitstream bytes, never parsed
            out.append(
                b"RIFF"
                + _struct.pack("<I", 12 + len(payload))
                + b"WEBP"
                + b"VP8 "
                + _struct.pack("<I", len(payload))
                + payload
            )
            continue
        gx = np.arange(ww, dtype=np.int64)[None, :]
        gy = np.arange(hh, dtype=np.int64)[:, None]
        px = np.empty((hh, ww, 3), dtype=np.uint8)
        px[..., 0] = (gx + s) % 256
        px[..., 1] = gy % 256
        px[..., 2] = (gx + gy) % 256
        if lane == 0:
            out.append(png_encode(px))
        elif lane == 1:
            out.append(jpeg_encode(px, quality=98))
        else:
            out.append(webp_encode(px))
    return pd.Series(out)


def images_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    base = docs.select(
        F.format_string("img%012d", F.col("doc_id")).alias("image_id"),
        _payload_udf(
            F.col("doc_id"),
            (F.lit(32) + F.pmod(F.col("doc_id"), F.lit(33))).cast("int"),
            (F.lit(32) + F.pmod(F.col("doc_id") * 7, F.lit(33))).cast("int"),
        ).alias("bytes"),
        (F.lit(32) + F.pmod(F.col("doc_id"), F.lit(33))).cast("int").alias("w"),
        (F.lit(32) + F.pmod(F.col("doc_id") * 7, F.lit(33))).cast("int").alias("h"),
        F.element_at(
            F.array(F.lit("png"), F.lit("jpeg"), F.lit("webp")),
            (F.pmod(F.col("doc_id"), F.lit(3)) + 1).cast("int"),
        ).alias("fmt"),
        F.col("text").alias("caption"),
        F.conv(F.substring(F.md5(F.col("text").cast("binary")), 1, 15), 16, 10)
        .cast("long")
        .alias("phash"),
    )
    # exact dups: every doc_id % 7 == 0 gets a copy under a new id
    exact = base.filter(F.pmod(F.expr("CAST(substr(image_id, 4) AS BIGINT)"), F.lit(7)) == 0).select(
        F.concat(F.lit("img9"), F.substring("image_id", 5, 11)).alias("image_id"),
        "bytes", "w", "h", "fmt", "caption", "phash",
    )
    # caption near-dups: doc_id % 5 == 0 -> drop the first token, new phash
    near = base.filter(F.pmod(F.expr("CAST(substr(image_id, 4) AS BIGINT)"), F.lit(5)) == 0).select(
        F.concat(F.lit("img8"), F.substring("image_id", 5, 11)).alias("image_id"),
        "bytes", "w", "h", "fmt",
        F.expr("substr(caption, instr(caption, ' ') + 1)").alias("caption"),
        (F.col("phash") + 1).alias("phash"),
    )
    # malformed: doc_id % 11 == 0 -> fmt violates the gate enum
    bad = base.filter(F.pmod(F.expr("CAST(substr(image_id, 4) AS BIGINT)"), F.lit(11)) == 0).select(
        F.concat(F.lit("img7"), F.substring("image_id", 5, 11)).alias("image_id"),
        "bytes", "w", "h", F.lit("bmp").alias("fmt"), "caption", "phash",
    )
    return base.unionByName(exact).unionByName(near).unionByName(bad)
