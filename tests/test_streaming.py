"""Structured Streaming intake: gate semantics identical to batch, valid
rows appended exactly once, rejects quarantined with their issue, resume
from the streaming checkpoint processes only new arrivals."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from jsonschema_jl_spark.streaming import run_gated_ingest

SCHEMA_DDL = "image_id string, w int, h int, fmt string, caption string"
GATE = {
    "type": "object",
    "required": ["image_id", "w", "h", "fmt", "caption"],
    "properties": {
        "w": {"minimum": 1},
        "h": {"minimum": 1},
        "fmt": {"enum": ["png", "jpeg", "webp"]},
        "caption": {"type": "string", "minLength": 3},
    },
}


def _write_arrivals(spark, path, rows):
    spark.createDataFrame(rows, SCHEMA_DDL).coalesce(1).write.mode("append").parquet(path)


def test_gated_ingest_appends_valid_and_quarantines(spark, tmp_path):
    src = str(tmp_path / "arrivals")
    corpus = str(tmp_path / "corpus")
    ckpt = str(tmp_path / "ckpt")
    rejects = str(tmp_path / "rejects")

    _write_arrivals(spark, src, [
        ("a", 10, 10, "png", "a good caption"),
        ("b", -1, 10, "png", "bad width"),
        ("c", 10, 10, "bmp", "bad format"),
        ("d", 10, 10, "webp", "another good one"),
    ])
    run_gated_ingest(spark, src, SCHEMA_DDL, GATE, corpus, ckpt, rejects_dir=rejects)

    got = {r.image_id for r in spark.read.parquet(corpus).collect()}
    assert got == {"a", "d"}
    rej = {r.image_id: r.issue.reason for r in spark.read.parquet(rejects).collect()}
    assert rej == {"b": "minimum", "c": "enum"}

    # resume: new arrivals only — the checkpoint must not reprocess a-d
    _write_arrivals(spark, src, [
        ("e", 5, 5, "jpeg", "late but valid"),
        ("f", 5, 5, "png", "x"),  # minLength reject
    ])
    run_gated_ingest(spark, src, SCHEMA_DDL, GATE, corpus, ckpt, rejects_dir=rejects)

    corpus_rows = spark.read.parquet(corpus).collect()
    assert {r.image_id for r in corpus_rows} == {"a", "d", "e"}
    assert len(corpus_rows) == 3  # exactly once: no duplicate appends
    rej2 = {r.image_id for r in spark.read.parquet(rejects).collect()}
    assert rej2 == {"b", "c", "f"}


def test_streaming_gate_matches_batch_verdicts(spark, tmp_path):
    from jsonschema_jl_spark.gate.gate import apply_gate

    src = str(tmp_path / "arr2")
    rows = [
        ("r%d" % i, i - 2, 10, ["png", "gif", "webp"][i % 3], "caption %d" % i)
        for i in range(30)
    ]
    _write_arrivals(spark, src, rows)
    batch_verdicts = {
        r.image_id: r.isvalid
        for r in apply_gate(spark.read.parquet(src), GATE).collect()
    }

    seen: dict = {}

    def on_batch(df, _bid):
        for r in df.select("image_id", "isvalid").collect():
            seen[r.image_id] = r.isvalid

    run_gated_ingest(
        spark, src, SCHEMA_DDL, GATE,
        str(tmp_path / "c2"), str(tmp_path / "k2"), on_batch=on_batch,
    )
    assert seen == batch_verdicts
