"""Derive an `images` table (input_hint shape) from the driver's documents
parquet: captions are real testdata text, with deterministically planted
duplicate rows and malformed gate rows appended — the flagship entry input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def images_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    base = docs.select(
        F.format_string("img%012d", F.col("doc_id")).alias("image_id"),
        F.lit(b"").cast("binary").alias("bytes"),
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
